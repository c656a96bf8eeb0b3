"""Text-analysis operators for LLM-data pipelines (BASELINE.json
north-star): token counting, quality scoring, language-ID heuristic,
document fingerprinting — all as native Column expressions (JVM-side,
whole-stage codegen; no Python in the loop).

These extend beyond the reference's surface (it has no text ops); they
follow the standard web-corpus curation recipe: normalize → tokenize →
score → fingerprint. Everything is deterministic and oracle-mirrored in
``queries/extensions.py``.

Scale: all ops are per-row projections over ``documents`` — no shuffle,
fully parallel, limited only by scan bandwidth. Shingle/array
intermediates stay bounded by document length.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# marker stopwords per language for the n-gram/stopword language-ID
# heuristic (fastText/CCNet-style, reduced to exact-match markers so the
# DuckDB oracle can mirror it). NOTE: the fixture's `lang` labels are NOT
# content-derived (all languages share one word pool), so accuracy vs the
# label is reported, not optimized.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "is"],
    "de": ["der", "die", "und", "ist", "von", "mit"],
    "es": ["el", "los", "y", "que", "un", "una"],
    "fr": ["le", "les", "et", "des", "une", "dans"],
    "zh": ["的", "是", "在", "了", "和", "我"],
}
LANG_PRIORITY = ["en", "de", "es", "fr", "zh"]  # tie-break order

STOPWORDS = LANG_MARKERS["en"]


def normalized(text: Column) -> Column:
    """Canonical text normalization: trim, collapse whitespace, lowercase."""
    return F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))


def tokens(norm: Column) -> Column:
    """Whitespace tokens of normalized text."""
    return F.split(norm, " ")


def shingles_raw(norm: Column, n: int = 3) -> Column:
    """Character n-gram runs WITHOUT dedup — the explode-side shingle
    column. min-aggregations (MinHash) are multiset-insensitive, and an
    inline ``array_distinct`` under ``explode`` is re-evaluated per
    OUTPUT row (O(len²) work × every emitted shingle — measured 10× the
    whole pipeline), so dedup must never sit in an exploded expression.

    Overlapping n-grams via a zero-width lookahead regex — Java's
    ``find()`` advances one position past an empty match, so
    ``(?=(.{n}))`` captures the gram starting at every offset, in
    position order, exactly like the substring walk it replaces. One
    regex call generates ~40 lines of janino vs the unrolled
    transform/sequence lambda whose whole-stage class took seconds to
    compile per plan (measured 3-8x wall-clock on the shingle queries;
    identical output verified element-for-element at sf0.1). Normalized
    text has no newlines (``\\s+`` collapsed), so ``.`` never excludes
    a char. Texts shorter than n pin both engines to a single
    whole-string shingle, matching the DuckDB twin's guard."""
    pat = f"(?=(.{{{n}}}))"
    return F.when(F.length(norm) < n, F.array(norm)).otherwise(
        F.regexp_extract_all(norm, F.lit(pat), F.lit(1))
    )


def shingles(norm: Column, n: int = 3) -> Column:
    """Distinct character n-gram shingles (the Jaccard set unit) —
    computed once per document row; array_intersect/array_union treat
    operands as sets, so this column is for per-doc array comparisons,
    never for explode (see shingles_raw)."""
    return F.array_distinct(shingles_raw(norm, n))


def token_stats(toks: Column) -> dict[str, Column]:
    """Token counting + quality signals, all integer-exact or
    single-division doubles (cross-engine deterministic)."""
    n = F.size(toks).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    char_total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS))
    ).cast("long")
    return {
        "n_tokens": n,
        "n_distinct_tokens": n_distinct,
        "avg_token_len": (char_total.cast("double") / n).alias("avg_token_len"),
        "stopword_ratio": (stop_hits.cast("double") / n).alias("stopword_ratio"),
    }


def quality_bucket(n_tokens: Column, stopword_ratio: Column) -> Column:
    """Heuristic quality class: enough tokens and a natural-language-like
    stopword rate → 'high'; short docs → 'low'."""
    return (
        F.when(n_tokens < 20, F.lit("low"))
        .when((stopword_ratio >= 0.02) & (n_tokens >= 40), F.lit("high"))
        .otherwise(F.lit("medium"))
    )


def lang_scores(toks: Column) -> dict[str, Column]:
    """Per-language marker-hit counts (distinct marker types present)."""
    return {
        lang: F.size(
            F.array_intersect(
                F.array_distinct(toks), F.array(*[F.lit(m) for m in markers])
            )
        ).cast("long")
        for lang, markers in LANG_MARKERS.items()
    }


def lang_pred(scores: dict[str, Column]) -> Column:
    """Argmax over language scores with fixed priority tie-break — an
    explicit CASE chain so the DuckDB oracle mirrors it token-for-token."""
    expr = F.lit(LANG_PRIORITY[-1])
    for lang in reversed(LANG_PRIORITY[:-1]):
        later = LANG_PRIORITY[LANG_PRIORITY.index(lang) + 1 :]
        cond = None
        for other in later:
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


# GPT-2-style pretokenizer reduced to an engine-portable core (letters /
# digits / punctuation runs with an optional leading space, space runs) —
# applied to normalized (lowercased) text so [a-z] covers the letter class
# identically in Java regex (Spark) and RE2 (DuckDB).
BPE_PATTERN = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+| +"


def bpe_tokens(norm: Column) -> Column:
    """BPE-ish pretokens of normalized text (regex runs, the unit a BPE
    tokenizer would merge within) — the standard cheap token-count proxy
    when the real tokenizer isn't in the cluster image."""
    return F.regexp_extract_all(norm, F.lit(BPE_PATTERN), 0)


def punct_ratio(norm: Column) -> Column:
    """Punctuation-character ratio of normalized text (quality signal):
    chars outside [a-z0-9 ] over total, NULL-safe for empty docs."""
    n = F.length(norm)
    kept = F.length(F.regexp_replace(norm, r"[a-z0-9 ]", ""))
    return F.when(n > 0, kept.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


# rolling-hash alphabet: char → 1-based code via instr(); chars outside
# the alphabet (and the empty char) code to 0. Identical in Spark
# `instr` and DuckDB `strpos`.
RH_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789 .,;:!?'-"
RH_BASE = 53
RH_MOD = 1_000_000_007
RH_PREFIX = 64


def rolling_hash(norm: Column) -> Column:
    """Polynomial rolling hash of the first 64 normalized chars:
    ``h = (h*53 + code(c)) mod 1e9+7`` — the classic Rabin-Karp document
    fingerprint, folded left-to-right as a pure JVM-side expression.

    Integer-exact (max intermediate ≈ 53·(1e9+7)+45 < 2^36), so the
    DuckDB oracle reproduces it bit-for-bit via ``list_reduce``.
    """
    alphabet = F.array(*[F.lit(ch) for ch in RH_ALPHABET])
    codes = F.transform(
        # greatest(...,1): Spark sequence(1, 0) is DESCENDING, not empty —
        # pin empty docs to one out-of-alphabet '' char (code 0, hash 0)
        F.sequence(
            F.lit(1), F.greatest(F.least(F.length(norm), F.lit(RH_PREFIX)), F.lit(1))
        ),
        lambda i: F.array_position(alphabet, F.substring(norm, i, 1)),
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * RH_BASE + c) % RH_MOD,
    )


def fingerprint(norm: Column, prefix_len: int = 40) -> Column:
    """Content fingerprint: md5 of the normalized prefix — the cheap
    near-dup blocking key (prefix-stable edits collide)."""
    return F.md5(F.substring(norm, 1, prefix_len))


def text_hash(norm: Column) -> Column:
    """Exact-dup key: md5 of the full normalized text."""
    return F.md5(norm)
