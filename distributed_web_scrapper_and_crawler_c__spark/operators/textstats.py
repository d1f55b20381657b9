"""Text-analysis operators for corpus quality filtering.

All hot paths are pure Catalyst expressions (regexp/size/length — inside
whole-stage codegen); each has a DuckDB SQL twin with identical semantics
for the oracle gate. The winnowing fingerprint is the one genuinely
imperative kernel (rolling window minimum) and runs as a vectorized pandas
UDF with a rows-only check.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

# token = letter run | digit run | single other non-space (BPE-ish pre-split)
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "los", "que", "y", "es"],
}
_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def _marker_re(words: list[str]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per doc."""
    ws = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), F.lit(0)))
    return docs.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.length("text").alias("n_chars"),
    )


TOKEN_COUNTS_SQL = rf"""
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\s+')) AS ws_tokens,
       len(regexp_extract_all(text, '{TOKEN_RE}')) AS bpe_tokens,
       length(text) AS n_chars
FROM documents
"""


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic quality score in [0,1]: length band + punctuation ratio +
    stopword ratio (the classic crawl-corpus filters), rounded to 6."""
    n_tokens = F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[^\w\s]"), F.lit(0)))
    n_stop = F.size(
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit(_marker_re(_STOPWORDS)), F.lit(0)
        )
    )
    len_ok = (F.length("text") >= 50) & (F.length("text") <= 5000)
    punct_ratio = n_punct / F.greatest(F.length("text"), F.lit(1))
    stop_ratio = n_stop / F.greatest(n_tokens, F.lit(1))
    score = (
        F.when(len_ok, 0.4).otherwise(0.0)
        + F.when(punct_ratio <= 0.1, 0.3).otherwise(0.0)
        + F.least(stop_ratio * 3.0, F.lit(0.3))
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stop"),
        F.round(score, 6).alias("quality"),
    )


QUALITY_SQL = rf"""
WITH q AS (
    SELECT doc_id,
           len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_tokens,
           len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
           len(regexp_extract_all(lower(text), '{_marker_re(_STOPWORDS)}')) AS n_stop,
           length(text) AS n_chars
    FROM documents
)
SELECT doc_id, n_tokens, n_punct, n_stop,
       round(
         (CASE WHEN n_chars BETWEEN 50 AND 5000 THEN 0.4 ELSE 0.0 END)
         + (CASE WHEN n_punct * 1.0 / greatest(n_chars, 1) <= 0.1 THEN 0.3 ELSE 0.0 END)
         + least(n_stop * 3.0 / greatest(n_tokens, 1), 0.3),
       6) AS quality
FROM q
"""


def langid(docs: DataFrame) -> DataFrame:
    """Marker-word language ID: count stopword hits per language, argmax
    with fixed tie order en > de > fr > es, 'und' (undetermined) if all
    zero. Expression-only."""
    cols = {
        lang: F.size(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(_marker_re(words)), F.lit(0)
            )
        ).alias(f"s_{lang}")
        for lang, words in _LANG_MARKERS.items()
    }
    scored = docs.select("doc_id", "lang", *cols.values())
    s = {lang: F.col(f"s_{lang}") for lang in _LANG_MARKERS}
    best = (
        F.when(
            (s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]) & (s["en"] > 0),
            "en",
        )
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]) & (s["de"] > 0), "de")
        .when((s["fr"] >= s["es"]) & (s["fr"] > 0), "fr")
        .when(s["es"] > 0, "es")
        .otherwise("und")
    )
    return scored.select(
        "doc_id", "lang", *[f"s_{lang}" for lang in _LANG_MARKERS],
        best.alias("predicted_lang"),
    )


def _langid_sql() -> str:
    score_cols = ",\n           ".join(
        f"len(regexp_extract_all(lower(text), '{_marker_re(w)}')) AS s_{lang}"
        for lang, w in _LANG_MARKERS.items()
    )
    return f"""
WITH s AS (
    SELECT doc_id, lang,
           {score_cols}
    FROM documents
)
SELECT doc_id, lang, s_en, s_de, s_fr, s_es,
       CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
            WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
            WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
            WHEN s_es > 0 THEN 'es'
            ELSE 'und' END AS predicted_lang
FROM s
"""


LANGID_SQL = _langid_sql()


# ---------------------------------------------------------------------------
# winnowing document fingerprint (rolling-hash; pandas UDF, rows-only check)
# ---------------------------------------------------------------------------


def winnowing_udf(k: int = 5, w: int = 4):
    """Winnowing (Schleimer et al. 2003): k-gram rolling hashes, per-window
    minimum, keep rightmost minima — the selected hash set fingerprints the
    document robustly against insertions. Vectorized numpy per document."""

    @F.pandas_udf(ArrayType(LongType()))
    def fingerprint(text: pd.Series) -> pd.Series:
        B = np.int64(1_000_003)
        out = []
        for t in text:
            if not t or len(t) < k:
                out.append([])
                continue
            b = np.frombuffer(t.lower().encode("utf-8", "replace"), dtype=np.uint8)
            n = len(b) - k + 1
            # polynomial rolling hash over uint64 (wraparound is the modulus)
            powers = (np.uint64(B) ** np.arange(k - 1, -1, -1, dtype=np.uint64))
            idx = np.arange(n)[:, None] + np.arange(k)[None, :]
            hashes = (b[idx].astype(np.uint64) * powers[None, :]).sum(
                axis=1, dtype=np.uint64
            )
            if n <= w:
                sel = {int(hashes.min().astype(np.int64))}
            else:
                wins = np.lib.stride_tricks.sliding_window_view(hashes, w)
                # rightmost minimum per window (winnowing tie rule)
                rev_arg = w - 1 - np.argmin(wins[:, ::-1], axis=1)
                sel = set(
                    int(x)
                    for x in wins[np.arange(len(wins)), rev_arg].astype(np.int64)
                )
            out.append(sorted(sel))
        return pd.Series(out)

    return fingerprint


def fingerprints(docs: DataFrame, k: int = 5, w: int = 4) -> DataFrame:
    return docs.select(
        "doc_id", winnowing_udf(k, w)(F.col("text")).alias("fingerprint")
    )
