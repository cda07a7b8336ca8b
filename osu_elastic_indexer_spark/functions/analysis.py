"""Text analysis for training-data pipelines: language-ID, quality scoring,
token counting, document fingerprinting.

All expressions are built from deterministic primitives (explicit stopword
lists, md5-prefix hashes, exact integer arithmetic) so every operator has an
ANSI-SQL twin for the DuckDB oracle. Everything is map-side only — no
shuffles beyond the caller's aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# n-gram-heuristic language ID: tiny high-frequency marker sets per language
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}

EN_STOPWORDS = ["the", "and", "of", "to", "in", "is", "for", "with", "on", "that"]

FP_P = 2147483647  # 2^31 - 1 (Mersenne) — fingerprint modulus


def tokens_expr(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != "")


def marker_ratio(toks: Column, markers: list[str]) -> Column:
    """Fraction of tokens that are in the marker set (0 if no tokens)."""
    m = F.array(*[F.lit(w) for w in markers])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(m, t)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def lang_id_expr(text: Column) -> Column:
    """Predict 'en'/'de'/'fr'/'unknown' by the max marker-hit ratio
    (threshold 0.01). Deterministic tie-break: en > de > fr."""
    toks = tokens_expr(text)
    en = marker_ratio(toks, LANG_MARKERS["en"])
    de = marker_ratio(toks, LANG_MARKERS["de"])
    fr = marker_ratio(toks, LANG_MARKERS["fr"])
    return (
        F.when((en >= de) & (en >= fr) & (en > 0.01), F.lit("en"))
        .when((de >= fr) & (de > 0.01), F.lit("de"))
        .when(fr > 0.01, F.lit("fr"))
        .otherwise(F.lit("unknown"))
    )


def quality_score_expr(text: Column) -> Column:
    """Heuristic quality in [0,1]: length band + stopword ratio band +
    alnum density. Mirrors the common C4-style filters, reduced to exact
    arithmetic (rounded to 4dp for cross-engine hashing)."""
    toks = tokens_expr(text)
    n = F.size(toks)
    stop = marker_ratio(toks, EN_STOPWORDS)
    alnum = F.length(F.regexp_replace(F.lower(text), "[^a-z0-9]", ""))
    density = F.when(F.length(text) > 0, alnum / F.length(text)).otherwise(F.lit(0.0))
    len_band = (
        F.when(n >= 100, F.lit(1.0))
        .when(n >= 20, F.lit(0.5))
        .otherwise(F.lit(0.0))
    )
    stop_band = F.when((stop >= 0.01) & (stop <= 0.5), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    return F.round((len_band + stop_band + density) / F.lit(3.0), 4)


def token_counts_expr(text: Column) -> tuple[Column, Column]:
    """(whitespace token count, BPE-ish subword count estimate).
    Subword estimate: alnum-run tokens plus one unit per 4 chars beyond 4 —
    a deterministic proxy for byte-pair segmentation length."""
    ws = F.size(F.filter(F.split(text, "\\s+"), lambda t: t != ""))
    toks = tokens_expr(text)
    bpe = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc
        + F.lit(1)
        + F.when(
            F.length(t) > 4, F.floor((F.length(t) - 1) / F.lit(4)).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint")),
    )
    return ws.cast("bigint"), bpe


def fingerprint_expr(text: Column) -> Column:
    """Order-sensitive rolling document fingerprint:
    sum over positions of hash32(token) * (pos+1) mod P — exact int64
    arithmetic, position-weighted so permuted docs differ."""
    toks = tokens_expr(text)
    h = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint")
    )
    return F.aggregate(
        F.zip_with(
            h,
            F.transform(h, lambda _x, i: (i + 1).cast("bigint")),
            lambda x, w: ((x % FP_P) * (w % FP_P)) % FP_P,
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: (acc + v) % FP_P,
    )
