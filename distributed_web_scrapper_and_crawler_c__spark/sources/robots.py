"""robots.txt → the engine's (host, prefix) disallow-rules table.

The reference hard-codes its ignore list (HtmlParser.cpp:258-278, F11);
the Spark engine generalizes that to a data-driven rules table enforced
as a broadcast anti-join at enqueue time (plans/frontier.py). This module
supplies the missing front half: parse raw robots.txt bodies — one per
host, fetched by whatever ingest owns HTTP — into that rules table, on
the executors, vectorized.

Supported grammar (documented subset):
 - ``User-agent:`` lines open a group; consecutive agent lines share one
   group (RFC 9309 §2.1); matching is case-insensitive on the agent
   product token;
 - ``Disallow:`` lines add a path prefix to the open group; an EMPTY
   Disallow means allow-everything and adds no rule;
 - ``#`` comments and blank lines are stripped; Allow/Crawl-delay/
   Request-rate emit no rule but count as rule lines for group structure
   (as in stdlib robotparser); Sitemap and unknown directives are fully
   inert;
 - group selection for the configured agent: the groups naming the agent
   exactly (case-insensitive) if any exist for that host, else the ``*``
   groups — RFC 9309 §2.2.1's specific-beats-default, flattened;
 - prefix match only (no ``*``/``$`` wildcards): exactly the predicate
   the frontier's anti-join applies (``path LIKE prefix%``).

For rule sets inside this subset the verdicts coincide with stdlib
``urllib.robotparser`` (all-Disallow groups: blocked iff any applicable
prefix matches) — which is what the tests assert, as an independent
implementation of the same spec.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

RULES_SCHEMA = "host STRING, prefix STRING"


def parse_robots_text(text: str, agent: str = "*") -> list[str]:
    """Disallow prefixes applicable to ``agent`` from one robots.txt body.
    Pure kernel (driver- and executor-safe).

    The line state machine mirrors the 1994 REP exactly as stdlib
    ``urllib.robotparser`` implements it: a group is an agent run followed
    by rule lines; a blank line closes a rules group, and an agent run
    interrupted by a blank line before any rule is DISCARDED; a new
    ``User-agent`` after rules closes the group and starts the next agent
    run; non-rule directives (Sitemap, Crawl-delay, ...) do not break an
    agent run. Divergence from robotparser, per RFC 9309 §2.2.1: multiple
    groups naming the same agent are COMBINED (robotparser keeps only the
    first); agent tokens match exactly (robotparser substring-matches).
    Tests assert verdict equivalence on fixtures inside the shared
    subset."""
    agent = agent.lower()
    groups: list[tuple[list[str], list[str]]] = []  # (agents, prefixes)
    cur: tuple[list[str], list[str]] | None = None
    state = 0  # 0 idle, 1 in agent run, 2 in rule lines
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            if state == 2 and cur is not None:
                groups.append(cur)
            if state != 0:
                cur, state = None, 0
            continue
        field, sep, value = line.partition(":")
        if not sep:
            continue
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if state == 2 and cur is not None:
                groups.append(cur)
                cur = None
            if cur is None:
                cur = ([], [])
            cur[0].append(value.lower())
            state = 1
        elif field in ("disallow", "allow", "crawl-delay", "request-rate"):
            # Allow/Crawl-delay/Request-rate are outside the prefix-table
            # subset (no rule emitted), but they ARE rule lines for group
            # structure — exactly as robotparser classifies them
            if state != 0 and cur is not None:
                if field == "disallow" and value:
                    cur[1].append(value)
                state = 2
        # any other directive (Sitemap, unknown keys): no state change
        # (robotparser-compatible)
    if state == 2 and cur is not None:
        groups.append(cur)
    if any(agent in agents for agents, _ps in groups):
        return [p for agents, ps in groups if agent in agents for p in ps]
    return [p for agents, ps in groups if "*" in agents for p in ps]


def robots_rules_from_texts(
    robots: DataFrame, agent: str = "*"
) -> DataFrame:
    """(host, robots_txt) → the frontier's (host, prefix) rules table.
    One mapInPandas pass (Arrow batches, no per-row Python round trips);
    hosts whose body yields no applicable Disallow emit no rows."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hosts: list[str] = []
            prefixes: list[str] = []
            for host, text in zip(pdf["host"], pdf["robots_txt"]):
                for p in parse_robots_text(text, agent):
                    hosts.append(host)
                    prefixes.append(p)
            yield pd.DataFrame({"host": hosts, "prefix": prefixes})

    return robots.select("host", "robots_txt").mapInPandas(
        parse, RULES_SCHEMA
    )
