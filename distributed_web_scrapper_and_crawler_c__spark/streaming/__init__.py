"""Structured-Streaming ingest surface — see :mod:`rounds`."""

from .rounds import parse_books_batch, stream_ingest_books  # noqa: F401
