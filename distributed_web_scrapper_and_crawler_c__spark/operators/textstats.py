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

from ..plans.parallelize import spread

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
    return spread(docs.select("doc_id", "text")).select(
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
    return spread(docs.select("doc_id", "text")).select(
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
    scored = spread(docs.select("doc_id", "lang", "text")).select(
        "doc_id", "lang", *cols.values()
    )
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


def _seg_arange(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenation of arange(starts[i], starts[i]+counts[i]) — the
    segmented-arange idiom (one repeat + one arange, no Python loop)."""
    cum = np.concatenate(([0], np.cumsum(counts)))
    return np.repeat(starts - cum[:-1], counts) + np.arange(cum[-1])


def _winnow_batch(texts, k: int, w: int) -> list:
    """Winnowing fingerprints for a whole batch in ONE flat numpy pipeline
    (guide §4.2 — per-doc Python loops with many tiny numpy calls dominate;
    the math is identical, run over the concatenated byte stream instead).

    The selected hash SET equals the set of per-window minima values: the
    winnowing rightmost-min tie rule picks a position whose VALUE is the
    window minimum, and only values survive into the fingerprint set — so
    a sliding minimum (w shifted np.minimum passes) reproduces the set
    exactly. Per-window minima are computed over the per-doc concatenated
    hash array; windows never cross documents because window indices are
    generated per-document (segmented arange). The final per-doc sort is
    on SIGNED int64 (the output type), matching sorted(set(int64 casts))."""
    B = np.uint64(1_000_003)
    outs: list = [None] * len(texts)
    enc: list = []
    keep_idx: list = []
    for i, t in enumerate(texts):
        if not t or len(t) < k:  # quirk preserved: gate on CHAR length
            outs[i] = []
        else:
            enc.append(t.lower().encode("utf-8", "replace"))
            keep_idx.append(i)
    if not enc:
        return outs
    lens = np.array([len(b) for b in enc], dtype=np.int64)
    flat = np.frombuffer(b"".join(enc), dtype=np.uint8)
    offs = np.concatenate(([0], np.cumsum(lens)))
    n_pos = int(offs[-1]) - k + 1
    # polynomial rolling hash at every flat byte position (uint64 wraps)
    h = np.zeros(n_pos, dtype=np.uint64)
    for j in range(k):
        h = h * B + flat[j : j + n_pos]
    # per-doc valid hash positions (k-grams inside one doc), concatenated
    n_i = lens - k + 1
    vstart = np.concatenate(([0], np.cumsum(n_i)))
    hv = h[_seg_arange(offs[:-1], n_i)]
    m = len(hv)
    # sliding minimum over hv (window w); per-doc windows indexed below
    if m >= w:
        smin = hv[: m - w + 1].copy()
        for j in range(1, w):
            np.minimum(smin, hv[j : j + m - w + 1], out=smin)
    else:
        smin = np.empty(0, dtype=np.uint64)
    # whole-doc minima for the n_i <= w docs (reduceat: n_i >= 1 everywhere)
    mins = np.minimum.reduceat(hv, vstart[:-1])
    big = n_i > w
    wn = np.where(big, n_i - w + 1, 1)  # selected-candidate count per doc
    cum = np.concatenate(([0], np.cumsum(wn)))
    sel = np.empty(int(cum[-1]), dtype=np.uint64)
    small_idx = np.flatnonzero(~big)
    sel[cum[:-1][small_idx]] = mins[small_idx]
    big_idx = np.flatnonzero(big)
    if len(big_idx):
        sel[_seg_arange(cum[:-1][big_idx], wn[big_idx])] = smin[
            _seg_arange(vstart[:-1][big_idx], wn[big_idx])
        ]
    # drop consecutive duplicate minima first (a window min survives ~w
    # consecutive windows, so this shrinks the sort input ~w-fold; the
    # global per-doc dedup below still removes non-adjacent repeats)
    doc_of = np.repeat(np.arange(len(wn)), wn)
    pre = np.empty(len(sel), dtype=bool)
    pre[0] = True
    np.logical_or(sel[1:] != sel[:-1], doc_of[1:] != doc_of[:-1], out=pre[1:])
    sel, doc_of = sel[pre], doc_of[pre]
    # per-doc distinct + ascending SIGNED sort, then split into lists
    sv = sel.view(np.int64)
    order = np.lexsort((sv, doc_of))
    sv, doc_of = sv[order], doc_of[order]
    keep = np.empty(len(sv), dtype=bool)
    keep[0] = True
    np.logical_or(doc_of[1:] != doc_of[:-1], sv[1:] != sv[:-1], out=keep[1:])
    sv, doc_of = sv[keep], doc_of[keep]
    counts = np.bincount(doc_of, minlength=len(wn))
    bounds = np.cumsum(counts)[:-1]
    for i, part in zip(keep_idx, np.split(sv, bounds)):
        outs[i] = part.tolist()
    return outs


def winnowing_udf(k: int = 5, w: int = 4):
    """Winnowing (Schleimer et al. 2003): k-gram rolling hashes, per-window
    minimum, keep rightmost minima — the selected hash set fingerprints the
    document robustly against insertions. Vectorized across the WHOLE Arrow
    batch (_winnow_batch): one flat rolling-hash pass + one sliding-min pass
    instead of ~8 numpy calls per document."""

    @F.pandas_udf(ArrayType(LongType()))
    def fingerprint(text: pd.Series) -> pd.Series:
        return pd.Series(_winnow_batch(list(text), k, w))

    return fingerprint


def fingerprints(docs: DataFrame, k: int = 5, w: int = 4) -> DataFrame:
    return spread(docs.select("doc_id", "text")).select(
        "doc_id", winnowing_udf(k, w)(F.col("text")).alias("fingerprint")
    )
