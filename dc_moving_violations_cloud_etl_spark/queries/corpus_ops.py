"""Corpus finalization operators: the steps between a curated document
set and training shards — deterministic shuffle + split assignment, PII
redaction, and greedy sequence packing. All oracle-checked.

Scale posture: shuffle/split is pure per-row hashing plus windows
partitioned by (split, shard) — shard count bounds every window
partition, so no global sort and no single-partition window at any
corpus size. Redaction is a per-row regex projection fused into the
scan. Packing is sequential *within a shard only* (applyInPandas per
(lang, shard) group, Arrow-batched) — the classic way to keep an
inherently order-dependent fold embarrassingly parallel at 100 TB.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .. import caching
from ..expressions import wide_product
from ..operators.text import normalized, tokens
from .extensions import _docs
from .registry import QuerySpec, register

# ---------------------------------------------------------------------------
# deterministic corpus shuffle + train/valid/test split
# ---------------------------------------------------------------------------

# hash-bucket split percentages (cumulative): train 90, valid 5, test 5
_TRAIN_PCT, _VALID_PCT = 90, 95
_N_SHARDS = 8


def _md5_mod(c: F.Column, salt: str, mod: int) -> F.Column:
    """Uniform bucket in [0, mod) from an md5 prefix of ``salt || value``
    — portable: the DuckDB twin computes the identical integer."""
    h = F.md5(F.concat(F.lit(salt), c.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % mod


def _shuffle_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split assignment + within-shard shuffle order for every document:

    - ``split``   — train/valid/test by md5-mod bucket (90/5/5): stable
      under re-partitioning, reruns, and engine swaps — the property
      rand()-based splits lack;
    - ``shard``   — md5-mod of a *differently salted* hash, so shard and
      split are independent;
    - ``position``— rank of the doc's shuffle key within (split, shard):
      the deterministic "global shuffle" every training run needs,
      computed with windows partitioned by (split, shard) — each window
      partition is corpus/N_SHARDS, never the whole corpus, so the sort
      is a bounded per-partition operation at any scale.
    """
    d = _docs(spark, sf_dir).select("doc_id", "lang")
    keyed = d.select(
        "doc_id",
        "lang",
        F.when(_md5_mod(F.col("doc_id"), "split:", 100) < _TRAIN_PCT, "train")
        .when(_md5_mod(F.col("doc_id"), "split:", 100) < _VALID_PCT, "valid")
        .otherwise("test")
        .alias("split"),
        F.md5(F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string"))).alias(
            "shuffle_key"
        ),
    ).withColumn("shard", _md5_mod(F.col("doc_id"), "shard:", _N_SHARDS))
    w = Window.partitionBy("split", "shard").orderBy("shuffle_key", "doc_id")
    return keyed.select(
        "doc_id",
        "lang",
        "split",
        "shard",
        F.row_number().over(w).cast("long").alias("position"),
    ).orderBy("doc_id")


register(
    QuerySpec(
        "curation_shuffle_split",
        _shuffle_split,
        f"""
WITH keyed AS (
  SELECT doc_id, lang,
         CASE WHEN CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
                   AS BIGINT) % 100 < {_TRAIN_PCT} THEN 'train'
              WHEN CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
                   AS BIGINT) % 100 < {_VALID_PCT} THEN 'valid'
              ELSE 'test' END AS split,
         md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
         CAST('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) % {_N_SHARDS} AS shard
  FROM documents
)
SELECT doc_id, lang, split, shard,
       CAST(row_number() OVER (PARTITION BY split, shard
                               ORDER BY shuffle_key, doc_id) AS BIGINT)
         AS position
FROM keyed ORDER BY doc_id
""",
        doc="Deterministic corpus shuffle + train/valid/test assignment: "
        "md5-mod split buckets (90/5/5), independent md5 shards, and a "
        "within-(split,shard) shuffle rank — reproducible across engines "
        "and partitionings, no global sort at any corpus size",
        tags=("extension", "curation"),
    )
)


# ---------------------------------------------------------------------------
# leakage-safe split keying (round 5)
# ---------------------------------------------------------------------------


def _split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test LEAKAGE audit of split keying: hashing the split
    bucket from ``doc_id`` (the naive rule `curation_shuffle_split`
    uses) lets two IDENTICAL documents land in train AND test — the
    classic eval-contamination bug; keying the bucket on the
    normalized-TEXT hash instead sends every exact-dup group to one
    split by construction. One row per keying strategy: split sizes,
    group count, and the number of dup groups STRADDLING >1 split
    (must be 0 for the group keying).

    Shape at 100 TB: per-row hashing, one groupBy on the uniform text
    hash, conditional aggregation — no windows, no joins, no scalar
    broadcasts; each keying row is a constant-size aggregate.
    """
    from ..operators.text import normalized as _norm
    from ..operators.text import text_hash as _th

    d = _docs(spark, sf_dir).select(
        "doc_id", _th(_norm(F.col("text"))).alias("text_hash")
    )

    def bucket(col: F.Column) -> F.Column:
        return (
            F.when(_md5_mod(col, "split:", 100) < _TRAIN_PCT, "train")
            .when(_md5_mod(col, "split:", 100) < _VALID_PCT, "valid")
            .otherwise("test")
        )

    def audit(keying: str, split: F.Column) -> DataFrame:
        per_group = (
            d.select("text_hash", split.alias("split"))
            .groupBy("text_hash")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.countDistinct("split").alias("n_splits"),
                F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias(
                    "n_train"
                ),
                F.sum(F.when(F.col("split") == "valid", 1).otherwise(0)).alias(
                    "n_valid"
                ),
                F.sum(F.when(F.col("split") == "test", 1).otherwise(0)).alias(
                    "n_test"
                ),
            )
        )
        return per_group.agg(
            F.lit(keying).alias("keying"),
            F.sum("n_train").cast("long").alias("n_train"),
            F.sum("n_valid").cast("long").alias("n_valid"),
            F.sum("n_test").cast("long").alias("n_test"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(F.when(F.col("n_splits") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_straddle_groups"),
        )

    by_doc = audit("by_doc_id", bucket(F.col("doc_id")))
    by_group = audit("by_text_hash", bucket(F.col("text_hash")))
    return by_doc.unionByName(by_group).orderBy("keying")


register(
    QuerySpec(
        "curation_split_leakage_audit",
        _split_leakage_audit,
        f"""
WITH d AS (
  SELECT doc_id,
         md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
           AS text_hash
  FROM documents
),
assigned AS (
  SELECT text_hash,
         CASE WHEN CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
                   AS BIGINT) % 100 < {_TRAIN_PCT} THEN 'train'
              WHEN CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
                   AS BIGINT) % 100 < {_VALID_PCT} THEN 'valid'
              ELSE 'test' END AS doc_split,
         CASE WHEN CAST('0x' || substr(md5('split:' || text_hash), 1, 8)
                   AS BIGINT) % 100 < {_TRAIN_PCT} THEN 'train'
              WHEN CAST('0x' || substr(md5('split:' || text_hash), 1, 8)
                   AS BIGINT) % 100 < {_VALID_PCT} THEN 'valid'
              ELSE 'test' END AS group_split
  FROM d
),
audits AS (
  SELECT 'by_doc_id' AS keying, text_hash,
         count(*) AS n_docs,
         count(DISTINCT doc_split) AS n_splits,
         sum(CASE WHEN doc_split = 'train' THEN 1 ELSE 0 END) AS n_train,
         sum(CASE WHEN doc_split = 'valid' THEN 1 ELSE 0 END) AS n_valid,
         sum(CASE WHEN doc_split = 'test' THEN 1 ELSE 0 END) AS n_test
  FROM assigned GROUP BY text_hash
  UNION ALL
  SELECT 'by_text_hash', text_hash,
         count(*),
         count(DISTINCT group_split),
         sum(CASE WHEN group_split = 'train' THEN 1 ELSE 0 END),
         sum(CASE WHEN group_split = 'valid' THEN 1 ELSE 0 END),
         sum(CASE WHEN group_split = 'test' THEN 1 ELSE 0 END)
  FROM assigned GROUP BY text_hash
)
SELECT keying,
       CAST(sum(n_train) AS BIGINT) AS n_train,
       CAST(sum(n_valid) AS BIGINT) AS n_valid,
       CAST(sum(n_test) AS BIGINT) AS n_test,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_straddle_groups
FROM audits GROUP BY keying ORDER BY keying
""",
        doc="Split-keying leakage audit: doc_id-keyed buckets let exact-"
        "dup groups straddle train/test (counted), text-hash-keyed "
        "buckets pin each dup group to ONE split (straddle = 0 by "
        "construction) — per-keying split sizes + straddling-group "
        "counts",
        tags=("extension", "curation", "compliance"),
    )
)


# ---------------------------------------------------------------------------
# shard-mix audit (round 5)
# ---------------------------------------------------------------------------


def _shuffle_mix_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-mix chi-square audit: after the deterministic md5 shard
    assignment (`curation_shuffle_split`), each training shard should
    hold the SAME language mix as the corpus — a skewed shard means the
    "global shuffle" is not mixing and a data-parallel trainer would
    see non-stationary batches. Per shard: doc count and the shard's
    chi-square contribution sum_lang (obs - exp)^2 / exp against the
    corpus-wide language shares.

    Shape at 100 TB: one groupBy to the (shard x lang) grain (|8 x
    langs| rows), then windows over that CONSTANT-SIZE aggregate for
    the marginals — the fact table is touched exactly once.
    """
    d = _docs(spark, sf_dir).select(
        "doc_id", "lang", _md5_mod(F.col("doc_id"), "shard:", _N_SHARDS).alias(
            "shard"
        )
    )
    cell = d.groupBy("shard", "lang").agg(F.count(F.lit(1)).alias("obs"))
    # marginals over the |shards x langs| aggregate — constant-size
    w_all = Window.partitionBy()
    w_shard = Window.partitionBy("shard")
    w_lang = Window.partitionBy("lang")
    with_exp = cell.select(
        "shard",
        "obs",
        (
            F.sum("obs").over(w_shard).cast("double")
            * F.sum("obs").over(w_lang).cast("double")
            / F.sum("obs").over(w_all).cast("double")
        ).alias("exp"),
    )
    return (
        with_exp.groupBy("shard")
        .agg(
            F.sum("obs").cast("long").alias("n_docs"),
            F.round(
                F.sum((F.col("obs") - F.col("exp")) ** 2 / F.col("exp")), 6
            ).alias("chi2_r6"),
        )
        .orderBy("shard")
    )


register(
    QuerySpec(
        "corpus_shuffle_mix_audit",
        _shuffle_mix_audit,
        f"""
WITH d AS (
  SELECT CAST('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) % {_N_SHARDS} AS shard,
         lang
  FROM documents
),
cell AS (SELECT shard, lang, count(*) AS obs FROM d GROUP BY shard, lang),
with_exp AS (
  SELECT shard, obs,
         CAST(sum(obs) OVER (PARTITION BY shard) AS DOUBLE)
           * CAST(sum(obs) OVER (PARTITION BY lang) AS DOUBLE)
           / CAST(sum(obs) OVER () AS DOUBLE) AS exp
  FROM cell
)
SELECT shard,
       CAST(sum(obs) AS BIGINT) AS n_docs,
       round(sum((obs - exp) * (obs - exp) / exp), 6) AS chi2_r6
FROM with_exp GROUP BY shard ORDER BY shard
""",
        doc="Shard-mix chi-square audit: per-shard language-mix deviation "
        "from the corpus-wide shares after the deterministic md5 shard "
        "assignment — one fact pass to the (shard x lang) grain, "
        "marginals as windows over that constant-size aggregate",
        tags=("extension", "curation", "statistics"),
    )
)


# ---------------------------------------------------------------------------
# skip-gram pair generation (round 5)
# ---------------------------------------------------------------------------

_SKIPGRAM_WINDOW = 2
_SKIPGRAM_TOP = 20


def _skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram (center, context) pair generation — the word2vec /
    embedding-pretraining data op: for every token, pair it with its
    next 1..W neighbors (W=2) WITHIN the document, count pair
    frequencies, report the global top-20.

    Shape at 100 TB: posexplode to (doc, pos, token), then the W
    context pairings come from ``lead(pos, o)`` windows PARTITIONED BY
    doc — bounded per-doc windows, never a self-join of the token
    table on position arithmetic (the naive shape, which shuffles the
    exploded corpus twice). The top-20 runs through the lossless
    per-partition pre-reduction (operators/ranking.global_topk).
    """
    from ..operators.ranking import global_topk

    d = _docs(spark, sf_dir).select(
        "doc_id", tokens(normalized(F.col("text"))).alias("toks")
    )
    tok = d.select(
        "doc_id", F.posexplode("toks").alias("pos", "w1")
    ).where(F.length("w1") > 0)
    w = Window.partitionBy("doc_id").orderBy("pos")
    # all W leads evaluate in ONE Window pass (same spec), then explode
    # — not a union of per-offset passes (which would shuffle the
    # exploded corpus once per offset)
    led = tok.select(
        "w1",
        *[
            F.lead("w1", off).over(w).alias(f"_ctx{off}")
            for off in range(1, _SKIPGRAM_WINDOW + 1)
        ],
    )
    pairs = led.select(
        "w1",
        F.explode(
            F.array(*[f"_ctx{o}" for o in range(1, _SKIPGRAM_WINDOW + 1)])
        ).alias("w2"),
    ).where(F.col("w2").isNotNull() & (F.length("w2") > 0))
    counts = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    return global_topk(
        counts,
        _SKIPGRAM_TOP,
        F.desc("n_pairs"),
        F.asc("w1"),
        F.asc("w2"),
        alias="rank",
    ).select(
        "w1", "w2", "n_pairs", F.col("rank").cast("long").alias("rank")
    ).orderBy("rank")


register(
    QuerySpec(
        "corpus_skipgram_pairs",
        _skipgram_pairs,
        f"""
WITH d AS (
  SELECT doc_id,
         string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')
           AS toks
  FROM documents
),
tok AS (
  SELECT doc_id, i AS pos, toks[i + 1] AS w1
  FROM d, unnest(generate_series(0, len(toks) - 1)) t(i)
  WHERE length(toks[i + 1]) > 0
),
pairs AS (
  SELECT w1, w2 FROM (
    SELECT w1, lead(w1, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM tok)
  WHERE w2 IS NOT NULL AND length(w2) > 0
  UNION ALL
  SELECT w1, w2 FROM (
    SELECT w1, lead(w1, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM tok)
  WHERE w2 IS NOT NULL AND length(w2) > 0
),
counts AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pairs
  FROM pairs GROUP BY w1, w2
)
SELECT w1, w2, n_pairs,
       CAST(row_number() OVER (ORDER BY n_pairs DESC, w1, w2) AS BIGINT)
         AS rank
FROM counts
QUALIFY rank <= {_SKIPGRAM_TOP}
ORDER BY rank
""",
        doc="Skip-gram (center, context) pair counts within +-2 token "
        "windows per document (word2vec-style pretraining pairs): "
        "doc-partitioned lead() windows instead of a positional "
        "self-join, global top-20 via lossless per-partition "
        "pre-reduction",
        tags=("extension", "corpus", "training"),
    )
)


# ---------------------------------------------------------------------------
# word2vec negative sampling (round 6)
# ---------------------------------------------------------------------------

_NEG_K = 5  # negatives per (center, context) pair
_NEG_POW_SCALE = 1_000_000  # count^0.75 -> integer micro-weights
_NEG_BUCKETS = 64  # inverse-CDF lookup buckets


def _negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic word2vec negative sampling for the top skip-gram
    pairs: K noise words per (center, context) pair drawn from the
    smoothed unigram distribution P(w) ∝ count(w)^0.75 (Mikolov 2013)
    — the third leg of the embedding-pretraining data path beside
    ``corpus_skipgram_pairs`` and the contrastive-triple miner.

    Everything is integer so both engines land on identical draws:
    word weights are ``round(count^0.75 * 1e6)`` BIGINTs, the CDF is
    an exact two-level integer cumulative sum over the word-ordered
    vocabulary (per-prefix windows + a tiny global offset table — see
    ``negative_samples_core``), and each draw is a 60-bit md5 integer
    of ``(center, context, k)`` reduced mod the total weight. The
    inverse-CDF lookup is NOT a per-draw scan of the vocabulary: each
    vocab interval is exploded onto the fixed-width buckets it spans
    (B=64), the TINY draw set is broadcast and equi-joined on
    ``bucket = u * B / total`` against the streaming bucket map, and a
    short range filter picks the one covering interval — the
    relational alias-table. A drawn negative may collide with the
    pair's own words (classic word2vec resamples; a deterministic
    pipeline flags instead — ``is_collision``)."""
    words = caching.persist_tracked(_uni_words(spark, sf_dir))
    pairs = _skipgram_pairs(spark, sf_dir).select("w1", "w2", "rank")
    return negative_samples_core(words, pairs)


def negative_samples_core(words: DataFrame, pairs: DataFrame) -> DataFrame:
    """Core of ``corpus_negative_samples`` over any ``(w, freq)`` word
    table and ``(w1, w2, rank)`` pair table — factored so property
    tests can feed synthetic vocabularies and verify the integer CDF /
    bucketed alias-table lookup against a brute-force interval scan
    (tests/test_corpus_property.py).

    Scale posture (r10 review): the integer CDF is a TWO-LEVEL
    cumulative sum, not one unpartitioned window over the vocabulary —
    words cumsum inside their (contiguous-in-sort-order) 2-char-prefix
    group, and the global window runs only over the per-prefix totals
    (≤ charset² rows), so no corpus-vocabulary-sized partition ever
    funnels through a single window task. Every ``interval × B``
    product is widened to DECIMAL(38,0) (HUGEINT in the oracle) before
    multiplying — ``lo ≈ total ≈ Σ count^0.75 · 1e6`` pushes ``lo * B``
    past 64 bits on a 100 TB corpus. The bucket-map join BROADCASTS THE
    DRAWS (≤ pairs × K rows, tiny by construction), never the
    vocabulary-sized bucket map, which streams map-side. Bucket count
    is semantically inert (the lo/hi range filter picks the covering
    interval whatever B is), so B stays the oracle's fixture constant;
    at production scale it is the one knob to raise (B ~ |vocab|) to
    keep candidates-per-draw O(1)."""
    vocab = words.select(
        "w",
        F.round(
            F.pow(F.col("freq").cast("double"), 0.75) * _NEG_POW_SCALE, 0
        )
        .cast("long")
        .alias("wt"),
    ).withColumn("g", F.substring("w", 1, 2))
    # per-prefix running sum (data-partitioned) + broadcast prefix
    # offsets (global window over the tiny per-prefix total table only)
    w_in = (
        Window.partitionBy("g")
        .orderBy("w")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_off = Window.orderBy("g").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        vocab.groupBy("g")
        .agg(F.sum("wt").alias("gwt"))
        .select(
            "g",
            F.coalesce(F.sum("gwt").over(w_off), F.lit(0)).alias("off"),
        )
    )
    cdf = (
        vocab.join(F.broadcast(offsets), "g")
        .select(
            "w",
            "wt",
            (F.col("off") + F.sum("wt").over(w_in) - F.col("wt")).alias(
                "lo"
            ),
            (F.col("off") + F.sum("wt").over(w_in)).alias("hi"),
        )
    )
    cdf = caching.persist_tracked(cdf)
    total = cdf.agg(F.max("hi").alias("total"))
    bmap = (
        cdf.crossJoin(F.broadcast(total))
        .select(
            "w",
            "lo",
            "hi",
            "total",
            F.explode(
                F.sequence(
                    F.expr(
                        f"(CAST(lo AS DECIMAL(38,0)) * {_NEG_BUCKETS})"
                        " div total"
                    ).cast("long"),
                    F.expr(
                        f"(CAST(hi - 1 AS DECIMAL(38,0)) * {_NEG_BUCKETS})"
                        " div total"
                    ).cast("long"),
                )
            ).alias("bucket"),
        )
    )
    draws = pairs.select(
        "w1",
        "w2",
        "rank",
        F.explode(F.sequence(F.lit(1), F.lit(_NEG_K))).alias("k"),
    ).select(
        "w1",
        "w2",
        "rank",
        "k",
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", "w1", "w2", F.col("k").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    out = (
        bmap.select("w", "lo", "hi", "bucket")
        .join(
            # the draws side is pairs × K rows — broadcast IT and let
            # the vocabulary-sized bucket map stream map-side
            F.broadcast(
                draws.crossJoin(F.broadcast(total)).select(
                    "w1",
                    "w2",
                    "rank",
                    "k",
                    (F.col("h") % F.col("total")).alias("u"),
                    F.expr(
                        f"(CAST(h % total AS DECIMAL(38,0))"
                        f" * {_NEG_BUCKETS}) div total"
                    )
                    .cast("long")
                    .alias("bucket"),
                )
            ),
            "bucket",
        )
        .where((F.col("u") >= F.col("lo")) & (F.col("u") < F.col("hi")))
        .select(
            "w1",
            "w2",
            "rank",
            F.col("k").cast("long").alias("k"),
            F.col("w").alias("neg_word"),
            (
                (F.col("w") == F.col("w1")) | (F.col("w") == F.col("w2"))
            ).alias("is_collision"),
        )
    )
    return out.orderBy("rank", "k")


register(
    QuerySpec(
        "corpus_negative_samples",
        _negative_samples,
        f"""
WITH words AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split(
      lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS w
    FROM documents
  ) WHERE length(w) >= 1 GROUP BY w
),
cdf AS MATERIALIZED (
  SELECT w, wt,
         sum(wt) OVER (ORDER BY w
            ROWS UNBOUNDED PRECEDING) - wt AS lo,
         sum(wt) OVER (ORDER BY w ROWS UNBOUNDED PRECEDING) AS hi
  FROM (
    SELECT w,
           CAST(round(pow(CAST(freq AS DOUBLE), 0.75)
                      * {_NEG_POW_SCALE}) AS BIGINT) AS wt
    FROM words
  )
),
tot AS (SELECT max(hi) AS total FROM cdf),
bmap AS MATERIALIZED (
  SELECT c.w, c.lo, c.hi, t.b AS bucket
  FROM cdf c, tot,
       unnest(generate_series(
         CAST((CAST(c.lo AS HUGEINT) * {_NEG_BUCKETS})
              // tot.total AS BIGINT),
         CAST((CAST(c.hi - 1 AS HUGEINT) * {_NEG_BUCKETS})
              // tot.total AS BIGINT))) t(b)
),
d AS (
  SELECT doc_id,
         string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')
           AS toks
  FROM documents
),
tok AS (
  SELECT doc_id, i AS pos, toks[i + 1] AS w1
  FROM d, unnest(generate_series(0, len(toks) - 1)) t(i)
  WHERE length(toks[i + 1]) > 0
),
sgpairs AS (
  SELECT w1, w2 FROM (
    SELECT w1, lead(w1, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM tok)
  WHERE w2 IS NOT NULL AND length(w2) > 0
  UNION ALL
  SELECT w1, w2 FROM (
    SELECT w1, lead(w1, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM tok)
  WHERE w2 IS NOT NULL AND length(w2) > 0
),
top_pairs AS (
  SELECT w1, w2, rank FROM (
    SELECT w1, w2,
           CAST(row_number() OVER (
             ORDER BY count(*) DESC, w1, w2) AS BIGINT) AS rank
    FROM sgpairs GROUP BY w1, w2
  ) WHERE rank <= {_SKIPGRAM_TOP}
),
draws AS (
  SELECT p.w1, p.w2, p.rank, t.k,
         CAST('0x' || substr(md5(p.w1 || '|' || p.w2 || '|'
                   || CAST(t.k AS VARCHAR)), 1, 15) AS BIGINT)
           % (SELECT total FROM tot) AS u
  FROM top_pairs p, unnest(generate_series(1, {_NEG_K})) t(k)
)
SELECT d.w1, d.w2, d.rank, CAST(d.k AS BIGINT) AS k,
       b.w AS neg_word,
       (b.w = d.w1 OR b.w = d.w2) AS is_collision
FROM draws d
JOIN bmap b
  ON b.bucket = CAST((CAST(d.u AS HUGEINT) * {_NEG_BUCKETS})
                     // (SELECT total FROM tot) AS BIGINT)
 AND d.u >= b.lo AND d.u < b.hi
ORDER BY d.rank, d.k
""",
        doc="deterministic word2vec negative sampling: K=5 noise words "
        "per top skip-gram pair from P(w) ∝ count^0.75 — two-level "
        "integer micro-weight CDF (no vocab-sized window task), 60-bit "
        "md5 draws, and a bucketed relational alias-table lookup with "
        "the tiny draws side broadcast; B is semantically inert and "
        "scales with |vocab| in production to keep lookups O(1)",
        tags=("extension", "corpus", "training", "sampling"),
    )
)


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# patterns chosen to parse identically under Java regex (Spark) and RE2
# (DuckDB): character classes, bounded repetition, \b — no lookarounds
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}"
_IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def _redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: count and mask emails, NANP phone numbers, and
    IPv4 addresses. The fixture corpus is synthetic, so each doc is
    first AUGMENTED with deterministic doc_id-derived PII (an email, a
    phone, an IP) — the redaction round-trip then provably fires on
    every row, and the md5 of the redacted text pins the output
    byte-for-byte against the oracle.

    Per-row regex projection — fused into the scan by codegen, no
    shuffle; at 100 TB this runs at full scan bandwidth.
    """
    d = _docs(spark, sf_dir)
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        did.cast("string"),
        F.lit("@example.com call +1-202-555-"),
        F.lpad((did % 10000).cast("string"), 4, "0"),
        F.lit(" node 10."),
        (did % 256).cast("string"),
        F.lit(".0."),
        ((did * 7) % 256).cast("string"),
    )
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ),
        _IP_RE,
        "<IP>",
    )
    return d.select(
        "doc_id",
        F.regexp_count(aug, F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(aug, F.lit(_PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_count(aug, F.lit(_IP_RE)).cast("long").alias("n_ips"),
        F.length(red).cast("long").alias("redacted_len"),
        F.md5(red).alias("redacted_hash"),
    ).orderBy("doc_id")


register(
    QuerySpec(
        "text_redact_pii",
        _redact_pii,
        f"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com call +1-202-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' node 10.' || CAST(doc_id % 256 AS VARCHAR)
              || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR) AS t
  FROM documents
),
red AS (
  SELECT doc_id, t,
         regexp_replace(regexp_replace(regexp_replace(t,
           '{_EMAIL_RE}', '<EMAIL>', 'g'),
           '\\+1-[0-9]{{3}}-[0-9]{{3}}-[0-9]{{4}}', '<PHONE>', 'g'),
           '{_IP_RE}', '<IP>', 'g') AS r
  FROM aug
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '\\+1-[0-9]{{3}}-[0-9]{{3}}-[0-9]{{4}}'))
            AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(t, '{_IP_RE}')) AS BIGINT) AS n_ips,
       CAST(len(r) AS BIGINT) AS redacted_len,
       md5(r) AS redacted_hash
FROM red ORDER BY doc_id
""",
        doc="PII redaction: inject deterministic doc_id-derived "
        "email/phone/IP then count + mask them (regex dialect chosen to "
        "agree between Java regex and RE2); md5 of the redacted text "
        "checks the scrub byte-for-byte",
        tags=("extension", "text"),
    )
)


# ---------------------------------------------------------------------------
# greedy sequence packing
# ---------------------------------------------------------------------------

_PACK_BUDGET = 256
_PACK_SHARDS = 4

_PACK_SCHEMA = StructType(
    [
        StructField("lang", StringType()),
        StructField("shard", IntegerType()),
        StructField("bin_id", LongType()),
        StructField("n_docs", LongType()),
        StructField("bin_tokens", LongType()),
    ]
)


def _make_pack_fn(budget: int):
    """Build the per-group packing function as a CLOSURE so cloudpickle
    ships it by value (a module-level function would be pickled by
    reference and require the package importable on every worker)."""

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # Greedy first-fit-in-order packing of one (lang, shard) group:
        # docs in doc_id order; a doc that would overflow the budget
        # opens the next bin (an oversized doc gets a bin to itself).
        # The order-dependence lives HERE, inside one bounded shard,
        # never across the corpus.
        pdf = pdf.sort_values("doc_id")
        bin_id, fill = 1, 0
        bins: dict[int, list[int]] = {}
        for n in pdf["n_tokens"]:
            n = int(n)
            if fill > 0 and fill + n > budget:
                bin_id += 1
                fill = 0
            fill += n
            agg = bins.setdefault(bin_id, [0, 0])
            agg[0] += 1
            agg[1] += n
        lang = pdf["lang"].iloc[0]
        shard = int(pdf["shard"].iloc[0])
        return pd.DataFrame(
            [
                (lang, shard, b, n_docs, tok)
                for b, (n_docs, tok) in sorted(bins.items())
            ],
            columns=["lang", "shard", "bin_id", "n_docs", "bin_tokens"],
        )

    return pack_group


def _pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing into fixed token-budget bins — the step
    that turns a shuffled corpus into training sequences. Packing is an
    order-dependent fold, so it CANNOT be a hash aggregation; the scale
    answer is to bound the sequential region: pack independently per
    (lang, shard) where shard is an md5-mod bucket. Each group is
    corpus/(langs×shards) and the groups pack in parallel via
    ``applyInPandas`` (Arrow-batched, one shuffle on the group key).

    Oracle: DuckDB computes the identical fold as a recursive CTE.
    """
    # NULL-text docs have no tokens to pack and are EXCLUDED on both
    # sides (the curation_chunk_plan discipline): a NULL n_tokens
    # reaches pack_group as pandas NaN and int(NaN) raises ValueError
    # (r10 review, reproduced)
    d = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            "lang",
            F.size(tokens(normalized(F.col("text")))).alias("n_tokens"),
        )
        .where(F.col("n_tokens").isNotNull())
    )
    sharded = d.withColumn(
        "shard", _md5_mod(F.col("doc_id"), "pack:", _PACK_SHARDS).cast("int")
    )
    packed = sharded.groupBy("lang", "shard").applyInPandas(
        _make_pack_fn(_PACK_BUDGET), schema=_PACK_SCHEMA
    )
    return packed.orderBy("lang", "shard", "bin_id")


register(
    QuerySpec(
        "curation_pack_sequences",
        _pack_sequences,
        f"""
WITH RECURSIVE st AS (
  SELECT lang,
         CAST(CAST('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) % {_PACK_SHARDS} AS INTEGER) AS shard,
         doc_id,
         CAST(len(string_split(
           lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' '))
           AS BIGINT) AS n_tokens
  FROM documents
  WHERE text IS NOT NULL
),
seq AS (
  SELECT lang, shard, doc_id, n_tokens,
         row_number() OVER (PARTITION BY lang, shard ORDER BY doc_id) AS rn
  FROM st
),
pack AS (
  SELECT lang, shard, rn, n_tokens,
         CAST(1 AS BIGINT) AS bin_id, n_tokens AS fill
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.lang, s.shard, s.rn, s.n_tokens,
         CASE WHEN p.fill + s.n_tokens > {_PACK_BUDGET}
              THEN p.bin_id + 1 ELSE p.bin_id END,
         CASE WHEN p.fill + s.n_tokens > {_PACK_BUDGET}
              THEN s.n_tokens ELSE p.fill + s.n_tokens END
  FROM seq s
  JOIN pack p ON s.lang = p.lang AND s.shard = p.shard AND s.rn = p.rn + 1
)
SELECT lang, shard, bin_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
FROM pack GROUP BY lang, shard, bin_id
ORDER BY lang, shard, bin_id
""",
        doc=f"Greedy sequence packing into {_PACK_BUDGET}-token bins per "
        "(lang, md5-shard): the order-dependent fold runs inside bounded "
        "shards via applyInPandas while shards pack in parallel; oracle "
        "is the identical fold as a DuckDB recursive CTE",
        tags=("extension", "curation", "pandas-udf"),
    )
)


# ---------------------------------------------------------------------------
# deterministic weighted sampling (Efraimidis–Spirakis exponential clocks)
# ---------------------------------------------------------------------------

WSAMPLE_K = 50


def _weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, fully deterministic — the
    corpus-mixing primitive (sample long documents proportionally more
    often) in its distributed form. Efraimidis–Spirakis via exponential
    clocks: each doc draws u from its md5-prefix hash (seed-free, so
    both engines replay bit-for-bit), and the k docs with the smallest
    ``-ln(u)/w`` win — equivalent to sequential weighted draws, but
    embarrassingly parallel: one projection pass + one top-k
    (TakeOrderedAndProject at scale, never a global sort of the
    corpus). Weight = token count. The clock uses each engine's libm
    ``ln`` (exact inputs; agreement to 1 ulp), rounded to 10 dp in the
    output; doc_id breaks ranking ties."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.size(tokens(normalized(F.col("text")))).cast("long").alias("w"),
    )
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    u = (h + F.lit(1).cast("double")) / F.lit(4294967296.0)
    clock = -F.log(u) / F.col("w")
    return (
        d.select(
            "doc_id", "w", F.round(clock, 10).alias("clock_r10")
        )
        # NULLS LAST: a NULL-text doc has w = NULL -> clock_r10 = NULL;
        # Spark's default ASC puts NULLs FIRST and would hand them the
        # top-k slots, while the DuckDB twin's default ASC is NULLS
        # LAST — unsampleable docs must never evict a real sample
        # (r10 review)
        .orderBy(F.col("clock_r10").asc_nulls_last(), F.col("doc_id").asc())
        .limit(WSAMPLE_K)
    )


register(
    QuerySpec(
        "corpus_weighted_sample",
        _weighted_sample,
        f"""
WITH d AS (
  SELECT doc_id,
         CAST(len(string_split(
           lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' '))
           AS BIGINT) AS w
  FROM documents
)
SELECT doc_id, w,
       round(-ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                       AS BIGINT) + 1.0) / 4294967296.0) / w, 10)
         AS clock_r10
FROM d
ORDER BY clock_r10 ASC, doc_id ASC
LIMIT {WSAMPLE_K}
""",
        doc="Efraimidis-Spirakis weighted sampling without replacement: "
        "seed-free md5-derived exponential clocks, smallest k win "
        "(one pass + top-k; deterministic across engines)",
        tags=("extension", "curation", "sampling"),
    )
)


# ---------------------------------------------------------------------------
# vocabulary encode (numericalization): tokens -> ids with OOV
# ---------------------------------------------------------------------------

_VOCAB_SIZE = 25


def _vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The numericalization step between tokenized text and training
    shards: build a frequency-ranked vocabulary (top 25, count desc /
    token asc — the explicit tie-break makes the boundary rank
    deterministic in both engines), broadcast it as the dictionary, and
    encode every document to an order-preserving id sequence with OOV
    id 0.

    Scale shape: one token-count aggregate for the vocabulary (tiny,
    broadcast back), one posexplode + broadcast-hash dictionary join
    over the token stream, one per-doc re-assembly aggregate
    (collect_list of (pos, id) structs sorted in-array — never a global
    sort). The id sequence is serialized to CSV so the driver's
    canonicalizer hashes it (the inverted_index_postings lesson).
    """
    d = _docs(spark, sf_dir).select(
        "doc_id", F.split(normalized(F.col("text")), " ").alias("toks")
    )
    tok = d.select(
        "doc_id", F.posexplode("toks").alias("pos", "t")
    )
    vocab = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("t"))
        .limit(_VOCAB_SIZE)
        .select(
            "t",
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), F.col("t")))
            .cast("long")
            .alias("tid"),
        )
    )
    enc = tok.join(F.broadcast(vocab), "t", "left").select(
        "doc_id", "pos", F.coalesce("tid", F.lit(0)).alias("tid")
    )
    return (
        enc.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum((F.col("tid") == 0).cast("long"))
            .cast("long")
            .alias("n_oov"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tid"))),
                    lambda x: x["tid"].cast("string"),
                ),
                ",",
            ).alias("ids_csv"),
        )
        .orderBy("doc_id")
    )


register(
    QuerySpec(
        "corpus_vocab_encode",
        _vocab_encode,
        r"""
WITH d AS (
  SELECT doc_id,
         string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')),
                      ' ') AS toks
  FROM documents
),
tok AS (
  SELECT doc_id, unnest(toks) AS t,
         generate_subscripts(toks, 1) AS pos
  FROM d
),
vocab AS (
  SELECT t, CAST(row_number() OVER (ORDER BY n DESC, t) AS BIGINT) AS tid
  FROM (SELECT t, count(*) AS n FROM tok GROUP BY t)
  ORDER BY n DESC, t LIMIT 25
),
enc AS (
  SELECT doc_id, pos, coalesce(v.tid, 0) AS tid
  FROM tok LEFT JOIN vocab v USING (t)
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       string_agg(CAST(tid AS VARCHAR), ',' ORDER BY pos) AS ids_csv
FROM enc
GROUP BY doc_id
ORDER BY doc_id
""",
        doc="vocabulary encode (numericalization): frequency-ranked "
        "top-25 dictionary with deterministic tie-break, broadcast "
        "dictionary join, order-preserving id sequences with OOV=0, "
        "CSV-serialized for the driver's canonicalizer",
        tags=("extension", "curation", "tokenizer"),
    )
)


# ---------------------------------------------------------------------------
# bigram language-model scoring (corpus-trained avg negative log-likelihood)
# ---------------------------------------------------------------------------


def _bigram_nll_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE shared add-one-smoothed bigram-LM core: one row per
    (doc_id, bigram) carrying its negative log-likelihood term
    ``-ln((c(w1,w2)+1) / (c(w1)+V))`` under the corpus-trained model.
    Both ``corpus_bigram_lm_nll`` (per-doc report) and
    ``curation_perplexity_filter`` (p90 gate) aggregate THIS stream —
    one definition, so a smoothing or tokenization change cannot apply
    to one and silently miss the other (r10 review: the filter
    previously re-implemented all ~35 lines verbatim).

    Scale posture: bigrams are emitted JVM-side with a
    ``transform(sequence(...))`` HOF over the token array (no
    posexplode self-join, no Python). The two count tables are
    VOCABULARY-bounded, not corpus-bounded — at 100 TB they are the
    small side and Spark's size estimate broadcasts them (the scoring
    join stays shuffle-free on the corpus side); the vocab size is a
    1-row aggregate combined via broadcast crossJoin (the repo's
    scalar-combine pattern).
    """
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", tokens(normalized(F.col("text"))).alias("t"))
    big = caching.persist_tracked(
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "CASE WHEN size(t) >= 2 THEN transform("
                    "sequence(1, size(t) - 1), "
                    "i -> struct(t[i-1] AS w1, t[i] AS w2)) "
                    "ELSE array() END"
                )
            ).alias("bg"),
        ).select("doc_id", "bg.w1", "bg.w2")
    )
    cb = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    cu = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        toks.select(F.explode("t").alias("w"))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("vsz"))
    )
    return (
        big.join(cb, ["w1", "w2"])
        .join(cu, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            (
                -F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("vsz")))
            ).alias("nll"),
        )
    )


def _bigram_lm_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document language-model quality score: train an add-one-
    smoothed bigram LM on the corpus itself, then score every document
    by the average negative log-likelihood of its bigrams —
    ``avg(-ln((c(w1,w2)+1) / (c(w1)+V)))``. Low avg-NLL = stereotyped,
    predictable text; high = rare constructions (or noise). This is the
    classic perplexity-filter signal LLM data pipelines run beside the
    heuristic quality score (``text_stats_quality``) — here with the
    corpus itself as the model so the whole thing is one deterministic,
    oracle-twinnable query (a real pipeline would swap in frozen
    counts from a reference corpus; the query shape is identical).
    Model construction and scale posture: ``_bigram_nll_stream``.
    Accumulation-order float drift across engines is ~1e-15 relative,
    far inside the 6-decimal rounding.
    """
    return (
        _bigram_nll_stream(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.avg("nll"), 6).alias("avg_nll"),
        )
        .orderBy("doc_id")
    )


register(
    QuerySpec(
        "corpus_bigram_lm_nll",
        _bigram_lm_nll,
        r"""
WITH toks AS (
  SELECT doc_id,
         string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')),
                      ' ') AS t
  FROM documents
),
tok AS (
  SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS pos FROM toks
),
big AS (
  SELECT doc_id, w1, w2 FROM (
    SELECT doc_id, w AS w1,
           lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM tok
  ) WHERE w2 IS NOT NULL
),
cb AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY w1, w2),
cu AS (SELECT w1, count(*) AS c1 FROM big GROUP BY w1),
v AS (SELECT count(DISTINCT w) AS vsz FROM tok)
SELECT big.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(-ln((cb.c2 + 1.0) / (cu.c1 + (SELECT vsz FROM v)))), 6)
         AS avg_nll
FROM big JOIN cb USING (w1, w2) JOIN cu USING (w1)
GROUP BY big.doc_id
ORDER BY big.doc_id
""",
        doc="add-one-smoothed bigram LM trained on the corpus, every "
        "document scored by avg negative log-likelihood — the "
        "perplexity-filter signal next to the heuristic quality score",
        tags=("extension", "corpus", "text", "quality"),
    )
)


# ---------------------------------------------------------------------------
# BPE tokenizer TRAINING: 8 true merge rounds over the word-frequency table
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 8


def _bpe_core(spark: SparkSession, sf_dir: str):
    """Shared BPE trainer core: returns ``(merges, final_seq)`` — the
    8 learned merges and the per-word final symbol sequences (the
    trained tokenizer's state). See ``_bpe_train`` for the full
    algorithm/scale discussion.

    Real BPE training — 8 iterative merge rounds, not just one round
    of pair counting (``bpe_merge_pair_counts`` is the single-round
    probe): per round, count adjacent symbol pairs weighted by word
    frequency, pick the argmax pair (ties broken lexicographically),
    and apply the merge corpus-wide with the reference greedy
    left-to-right non-overlap rule.

    The merge rule is implemented as ONE left fold per round
    (``_merge_fold``), not by string replace (substring replace both
    crosses symbol boundaries — 'x y' matches inside 'xx y' — and
    mishandles runs). The fold IS the greedy left-to-right non-overlap
    rule: scan symbols once, merging the current symbol into the
    accumulated tail only when the tail's last element equals ``a`` and
    the current symbol equals ``b`` — a merged element can never
    re-match as ``a`` (its value is ``a||b`` and ``b`` is non-empty),
    which is exactly the "skip the consumed position" step of the
    classic scan. Semantics are identical to the islands-window
    formulation the DuckDB twin still uses (validated symbol-for-symbol
    against a pure-Python BPE reference AND hash-checked against the
    oracle).

    Scale posture (why this works at 100 TB): BPE trains on the WORD
    FREQUENCY table, not the corpus — one corpus pass builds
    vocabulary-bounded state, and every merge round touches only that
    table. r14 optimization (guide §2.4/§4.1): each round is now ONE
    shuffle-free array transform for pair generation plus ONE
    partial+final hash aggregate for the argmax — the former
    posexplode → per-word lead() window → islands windows → re-agg
    chain shuffled the symbol table three times per round and
    materialized two localCheckpoints per round (3 jobs/round → 1).
    The per-round argmax is the iterative algorithm's one legitimate
    driver scalar (same posture as CC's convergence sum); merges stay
    lazy folds over the single checkpointed seed, so the trained state
    is recomputed-on-demand, never shuffled."""
    docs = _docs(spark, sf_dir)
    words = (
        docs.select(
            F.explode(tokens(normalized(F.col("text")))).alias("w")
        )
        .where(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    seq = words.select(
        F.col("w").alias("rid"),
        "freq",
        F.split(F.col("w"), "").alias("syms"),
    ).localCheckpoint()

    merges = []
    for r in range(1, _BPE_ROUNDS + 1):
        rows = (
            _pair_counts(seq)
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not rows:
            # degenerate corpus: every word collapsed to one symbol
            # before the round budget ran out — no adjacent pairs
            # remain, and the DuckDB oracle's recursive CTE likewise
            # stops emitting merge rows here, so break (not raise)
            break
        best = rows[0]
        merges.append((r, best["pair"], int(best["cnt"])))
        a, b = best["pair"].split(" ")
        seq = seq.select(
            "rid", "freq", _merge_fold(a, b, a + b).alias("syms")
        )
    return merges, seq


def _pair_counts(seq: DataFrame) -> DataFrame:
    """Adjacent-pair counts over a ``(freq, syms)`` symbol table:
    pair generation is a shuffle-free array transform fused into the
    scan (no posexplode + per-word lead() window — guide §2.4), and
    the count is one partial+final hash aggregate, so a merge round's
    shuffle carries only (pair, partial count) rows."""
    return (
        seq.select(
            "freq",
            F.explode(
                F.expr(
                    "transform(slice(syms, 1, size(syms) - 1),"
                    " (x, i) -> concat(x, ' ', syms[i + 1]))"
                )
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
    )


def _merge_fold(a: str, b: str, merged: str) -> F.Column:
    """ONE greedy left-to-right non-overlap merge of adjacent pair
    ``(a, b)`` over the ``syms`` array column, as a single left fold
    (``aggregate``): append each symbol to the output, except when the
    output's last element is ``a`` and the incoming symbol is ``b`` —
    then replace the last element with ``merged``. Equivalent to the
    classic scan-with-skip: a just-merged element can never re-match
    as ``a`` because its value is the full merged token and ``b`` (or
    its ##-stripped suffix) is non-empty. Shared by the BPE trainer
    (``merged = a+b``) and the WordPiece trainer (``merged`` strips
    the continuation prefix off ``b``). Pure per-row expression — no
    shuffle, no window, no re-aggregation (guide §2.4)."""
    return F.aggregate(
        F.col("syms"),
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, s: F.when(
            # try_element_at: the initial accumulator is empty and
            # Spark 4's element_at raises on out-of-bounds; NULL simply
            # fails the match, which is the wanted "no tail yet" case
            (F.try_element_at(acc, F.lit(-1)) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 8 learned merges (see ``_bpe_core``)."""
    merges, _ = _bpe_core(spark, sf_dir)
    return spark.createDataFrame(
        merges, "round int, merged_pair string, pair_count long"
    ).orderBy("round")


def _bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENCODING under the trained tokenizer: BPE merges are word-
    internal, so a document's token count is the sum over its words of
    that word's final symbol count — the encode step touches only the
    vocabulary-bounded trained state (``final_seq``) plus one pass over
    the document token stream (broadcast dictionary join, the
    ``corpus_vocab_encode`` shape). Output: per-document BPE token
    count vs raw character count — the compression the 8 merges bought,
    which is THE metric a tokenizer-training pipeline watches."""
    _, seq = _bpe_core(spark, sf_dir)
    wlen = seq.select(
        F.col("rid").alias("w"),
        F.size("syms").cast("long").alias("n_tokens"),
    )
    docs = _docs(spark, sf_dir)
    dw = docs.select(
        "doc_id", F.explode(tokens(normalized(F.col("text")))).alias("w")
    ).where(F.length("w") >= 1)
    return (
        dw.join(F.broadcast(wlen), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_tokens").cast("long").alias("n_bpe_tokens"),
            F.sum(F.length("w")).cast("long").alias("n_chars"),
        )
        .orderBy("doc_id")
    )


def _bpe_oracle(tail: str | None = None) -> str:
    head = r"""
WITH RECURSIVE words AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split(
      lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ')) AS w
    FROM documents
  ) WHERE length(w) >= 1 GROUP BY w
),
seq0 AS MATERIALIZED (
  SELECT w AS rid, freq, array_to_string(split(w, ''), ' ') AS seq
  FROM words
)"""
    body = ""
    for i in range(_BPE_ROUNDS):
        body += f"""
, tok{i} AS MATERIALIZED (
  SELECT rid, freq, sym, pos,
         lead(sym) OVER (PARTITION BY rid ORDER BY pos) AS nxt
  FROM (
    SELECT rid, freq, unnest(string_split(seq, ' ')) AS sym,
           generate_subscripts(string_split(seq, ' '), 1) AS pos
    FROM seq{i}
  )
),
best{i} AS MATERIALIZED (
  SELECT sym || ' ' || nxt AS pair, sum(freq) AS cnt
  FROM tok{i} WHERE nxt IS NOT NULL
  GROUP BY 1 ORDER BY cnt DESC, pair ASC LIMIT 1
),
keep{i} AS MATERIALIZED (
  SELECT rid, pos FROM (
    SELECT rid, pos,
           pos - row_number() OVER (PARTITION BY rid ORDER BY pos) AS grp
    FROM tok{i}
    WHERE nxt IS NOT NULL
      AND sym || ' ' || nxt = (SELECT pair FROM best{i})
  ) c
  QUALIFY (pos - min(pos) OVER (PARTITION BY rid, grp)) % 2 = 0
),
seq{i + 1} AS MATERIALIZED (
  SELECT t.rid, t.freq,
         string_agg(
           CASE WHEN k.pos IS NOT NULL THEN t.sym || t.nxt
                ELSE t.sym END, ' ' ORDER BY t.pos) AS seq
  FROM tok{i} t
  LEFT JOIN keep{i} k ON k.rid = t.rid AND k.pos = t.pos
  LEFT JOIN keep{i} k2 ON k2.rid = t.rid AND k2.pos = t.pos - 1
  WHERE k2.pos IS NULL
  GROUP BY t.rid, t.freq
)"""
    if tail is None:
        tail = (
            "\nSELECT * FROM (\n"
            + "\nUNION ALL\n".join(
                f"SELECT {i + 1} AS round, pair AS merged_pair, "
                f"CAST(cnt AS BIGINT) AS pair_count FROM best{i}"
                for i in range(_BPE_ROUNDS)
            )
            + "\n) ORDER BY round"
        )
    return head + body + tail


register(
    QuerySpec(
        "corpus_bpe_train_merges",
        _bpe_train,
        _bpe_oracle(),
        doc="true iterative BPE training (8 merge rounds) over the "
        "vocabulary-bounded word-frequency table: argmax pair per "
        "round, greedy left-to-right non-overlap merge expressed "
        "relationally (islands window over candidate runs); oracle "
        "unrolls the same rounds as materialized CTEs, validated "
        "against a pure-Python BPE reference",
        tags=("extension", "corpus", "text", "iterative", "tokenizer"),
    )
)


register(
    QuerySpec(
        "corpus_bpe_encode_lengths",
        _bpe_encode,
        _bpe_oracle(
            tail=rf"""
, dw AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(
      lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ')) AS w
    FROM documents
  ) WHERE length(w) >= 1
)
SELECT dw.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(len(string_split(s.seq, ' '))) AS BIGINT) AS n_bpe_tokens,
       CAST(sum(length(dw.w)) AS BIGINT) AS n_chars
FROM dw JOIN seq{_BPE_ROUNDS} s ON s.rid = dw.w
GROUP BY dw.doc_id ORDER BY dw.doc_id
"""
        ),
        doc="encoding under the trained BPE tokenizer: per-doc token "
        "count = broadcast dictionary join of doc words against the "
        "vocabulary-bounded trained state — the chars-per-token "
        "compression metric tokenizer pipelines watch",
        tags=("extension", "corpus", "text", "tokenizer"),
    )
)


# ---------------------------------------------------------------------------
# WordPiece tokenizer trainer (BERT-style): likelihood-ratio pair scoring
# ---------------------------------------------------------------------------

_WP_ROUNDS = 8


def _wordpiece_core(spark: SparkSession, sf_dir: str):
    """WordPiece trainer core: ``_WP_ROUNDS`` iterative merge rounds over
    the vocabulary-bounded word-frequency table, returning the learned
    merges ``[(round, pair, new_token, pair_count, score)]``.

    WordPiece (Schuster & Nakajima 2012; the BERT tokenizer) differs
    from BPE in exactly two places, and shares everything else:

    1. **Continuation marking.** Each word is pre-split as
       ``first-char  ##c2  ##c3 ...`` — a ``##`` prefix marks a
       word-internal continuation piece. A merge concatenates the left
       symbol with the right symbol's suffix (``##`` stripped), so the
       merged piece keeps the left symbol's word-position marking.
    2. **Likelihood-ratio selection.** Instead of the raw pair count,
       each round merges the pair maximizing
       ``count(ab) / (count(a) * count(b))`` — the pair whose merge most
       increases corpus likelihood under a unigram LM, favoring strongly
       associated pairs over merely frequent ones.

    The merge MECHANICS (greedy left-to-right non-overlap) are
    identical to BPE and shared via ``_merge_fold`` — this trainer
    passes the ``merged`` literal with the continuation prefix
    stripped off the right symbol.

    Determinism across engines: ``score`` is one IEEE double division of
    exactly-summed integers — the denominator product is widened to
    DECIMAL(38,0) (HUGEINT in the oracle) before the division so neither
    engine overflows 64 bits on corpus-sized symbol counts — so Spark
    and the DuckDB oracle compute bit-identical doubles; ties break on
    the pair string. Scale posture is the BPE one — every round
    touches only the vocab-bounded symbol table; per-round argmax is
    the one legitimate driver scalar. r14 optimization (guide §2.4):
    the pair and symbol streams are shuffle-free array transforms over
    the single checkpointed seed (plus lazy merge folds) feeding
    partial+final hash aggregates — the former per-round
    posexplode → lead() window → two-localCheckpoint chain shuffled
    the symbol table three times and ran 3 jobs per round."""
    docs = _docs(spark, sf_dir)
    words = (
        docs.select(
            F.explode(tokens(normalized(F.col("text")))).alias("w")
        )
        .where(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    seq = words.select(
        F.col("w").alias("rid"),
        "freq",
        F.transform(
            F.split(F.col("w"), ""),
            lambda c, i: F.when(i == F.lit(0), c).otherwise(
                F.concat(F.lit("##"), c)
            ),
        ).alias("syms"),
    ).localCheckpoint()

    merges = []
    for r in range(1, _WP_ROUNDS + 1):
        syms = seq.select("freq", F.explode("syms").alias("sym")).groupBy(
            "sym"
        ).agg(F.sum("freq").alias("scnt"))
        pairs = (
            seq.select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(slice(syms, 1, size(syms) - 1),"
                        " (x, i) -> struct(x AS sym, syms[i + 1] AS nxt))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.sym").alias("sym"), F.col("p.nxt").alias("nxt"))
            .agg(F.sum("freq").alias("pcnt"))
        )
        # symbol table is vocab-bounded (|alphabet| + merges) — broadcast
        rows = (
            pairs.join(
                F.broadcast(
                    syms.select("sym", F.col("scnt").alias("cnt_a"))
                ),
                "sym",
            )
            .join(
                F.broadcast(
                    syms.select(
                        F.col("sym").alias("nxt"),
                        F.col("scnt").alias("cnt_b"),
                    )
                ),
                "nxt",
            )
            .withColumn(
                # the symbol counts are corpus-sized, so their product
                # is computed exactly in DECIMAL(38,0) (HUGEINT in the
                # oracle, where sum(BIGINT) widens automatically) and
                # cast to double once — keeping the score one IEEE
                # division of exact operands instead of silently
                # overflowing a 64-bit product at scale
                "score",
                F.col("pcnt")
                / wide_product(F.col("cnt_a"), F.col("cnt_b")).cast(
                    "double"
                ),
            )
            .withColumn("pair", F.concat_ws(" ", "sym", "nxt"))
            .orderBy(F.col("score").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not rows:
            # degenerate corpus: no adjacent pairs left before the
            # round budget — break to match the oracle's shorter merge
            # list instead of raising IndexError (ADVICE r9)
            break
        best = rows[0]
        a, b = best["pair"].split(" ")
        new_token = a + (b[2:] if b.startswith("##") else b)
        merges.append(
            (r, best["pair"], new_token, int(best["pcnt"]),
             float(best["score"]))
        )
        seq = seq.select(
            "rid", "freq", _merge_fold(a, b, new_token).alias("syms")
        )
    return merges, seq


def _wordpiece_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned WordPiece merges (see ``_wordpiece_core``)."""
    merges, _ = _wordpiece_core(spark, sf_dir)
    return spark.createDataFrame(
        merges,
        "round int, merged_pair string, new_token string, "
        "pair_count long, score double",
    ).orderBy("round")


def _wordpiece_oracle() -> str:
    head = r"""
WITH RECURSIVE words AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split(
      lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ')) AS w
    FROM documents
  ) WHERE length(w) >= 1 GROUP BY w
),
wseq0 AS MATERIALIZED (
  SELECT w AS rid, freq,
         CASE WHEN length(w) = 1 THEN w
              ELSE substr(w, 1, 1) || ' ##'
                   || array_to_string(split(substr(w, 2), ''), ' ##')
         END AS seq
  FROM words
)"""
    body = ""
    for i in range(_WP_ROUNDS):
        body += f"""
, wtok{i} AS MATERIALIZED (
  SELECT rid, freq, sym, pos,
         lead(sym) OVER (PARTITION BY rid ORDER BY pos) AS nxt
  FROM (
    SELECT rid, freq, unnest(string_split(seq, ' ')) AS sym,
           generate_subscripts(string_split(seq, ' '), 1) AS pos
    FROM wseq{i}
  )
),
wsym{i} AS MATERIALIZED (
  SELECT sym, sum(freq) AS cnt FROM wtok{i} GROUP BY sym
),
wbest{i} AS MATERIALIZED (
  SELECT p.sym, p.nxt, p.pair, p.cnt AS pair_cnt,
         p.cnt * 1.0 / (sa.cnt * sb.cnt) AS score
  FROM (SELECT sym, nxt, sym || ' ' || nxt AS pair, sum(freq) AS cnt
        FROM wtok{i} WHERE nxt IS NOT NULL GROUP BY 1, 2, 3) p
  JOIN wsym{i} sa ON sa.sym = p.sym
  JOIN wsym{i} sb ON sb.sym = p.nxt
  ORDER BY score DESC, pair ASC LIMIT 1
),
wkeep{i} AS MATERIALIZED (
  SELECT rid, pos FROM (
    SELECT rid, pos,
           pos - row_number() OVER (PARTITION BY rid ORDER BY pos) AS grp
    FROM wtok{i}
    WHERE nxt IS NOT NULL
      AND sym || ' ' || nxt = (SELECT pair FROM wbest{i})
  ) c
  QUALIFY (pos - min(pos) OVER (PARTITION BY rid, grp)) % 2 = 0
),
wseq{i + 1} AS MATERIALIZED (
  SELECT t.rid, t.freq,
         string_agg(
           CASE WHEN k.pos IS NOT NULL THEN t.sym || substr(t.nxt, 3)
                ELSE t.sym END, ' ' ORDER BY t.pos) AS seq
  FROM wtok{i} t
  LEFT JOIN wkeep{i} k ON k.rid = t.rid AND k.pos = t.pos
  LEFT JOIN wkeep{i} k2 ON k2.rid = t.rid AND k2.pos = t.pos - 1
  WHERE k2.pos IS NULL
  GROUP BY t.rid, t.freq
)"""
    tail = (
        "\nSELECT * FROM (\n"
        + "\nUNION ALL\n".join(
            f"SELECT {i + 1} AS round, pair AS merged_pair, "
            f"sym || substr(nxt, 3) AS new_token, "
            f"CAST(pair_cnt AS BIGINT) AS pair_count, "
            f"CAST(score AS DOUBLE) AS score FROM wbest{i}"
            for i in range(_WP_ROUNDS)
        )
        + "\n) ORDER BY round"
    )
    return head + body + tail


register(
    QuerySpec(
        "corpus_wordpiece_train_merges",
        _wordpiece_train,
        _wordpiece_oracle(),
        doc="WordPiece (BERT-style) tokenizer training: 8 merge rounds "
        "over the vocab-bounded word-frequency table with ##-prefixed "
        "continuation pieces and likelihood-ratio pair selection "
        "count(ab)/(count(a)*count(b)); merge mechanics shared with the "
        "BPE trainer via _merge_fold(merged=...); oracle unrolls the "
        "same rounds as materialized CTEs with the identical one-IEEE-"
        "division score, completing the BPE/unigram/WordPiece trio",
        tags=("extension", "corpus", "text", "iterative", "tokenizer"),
    )
)


# ---------------------------------------------------------------------------
# unigram-LM tokenizer (SentencePiece-style): seed vocab + Viterbi encode
# ---------------------------------------------------------------------------

_UNI_MAX_PIECE = 6  # max candidate piece length (chars)
_UNI_TOP_MULTI = 200  # multi-char pieces kept in the seed vocab
_UNI_MAXPOS = 16  # DP horizon: words longer than this use char fallback
_UNI_SEED_OUT = 30  # rows returned by the seed-vocab query


def _uni_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-word frequency table — the vocabulary-bounded state all
    unigram-LM passes run on (same posture as ``_bpe_core``: one corpus
    pass, then every downstream step touches only this table)."""
    return (
        _docs(spark, sf_dir)
        .select(F.explode(tokens(normalized(F.col("text")))).alias("w"))
        .where(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _uni_candidates(words: DataFrame) -> DataFrame:
    """``(w, freq, s, e, piece)`` — every substring of each distinct
    word with length 1..`_UNI_MAX_PIECE` (0-based start ``s``,
    exclusive end ``e``). One flatten+explode over the word table; the
    grid is |word|x6 per DISTINCT word, so candidate volume is
    vocabulary-bounded, never corpus-sized."""
    L = F.length("w")
    grid = F.flatten(
        F.transform(
            F.sequence(F.lit(0), L - 1),
            lambda s: F.transform(
                F.sequence(F.lit(1), F.least(F.lit(_UNI_MAX_PIECE), L - s)),
                lambda l: F.struct(s.alias("s"), l.alias("l")),
            ),
        )
    )
    ex = words.select("w", "freq", F.explode(grid).alias("g"))
    return ex.select(
        "w",
        "freq",
        F.col("g.s").cast("int").alias("s"),
        (F.col("g.s") + F.col("g.l")).cast("int").alias("e"),
        F.expr(f"substring(w, g.s + 1, g.l)").alias("piece"),
    )


def _uni_core(spark: SparkSession, sf_dir: str):
    """Shared unigram-LM core → ``(words, vocab)``.

    Seed vocabulary exactly as Kudo (2018) seeds unigram-LM training:
    score every candidate substring by ``occurrence_freq x len`` (all
    word-internal occurrences, weighted by word frequency), keep ALL
    single characters (coverage guarantee) plus the top
    `_UNI_TOP_MULTI` multi-char pieces by (score desc, piece asc).
    Piece log-probs are integer 0.1-milli-nats:
    ``round(ln(score/total) * 1e4)`` — exact BIGINT inputs to an exact
    double division, libm ``ln`` agreeing to 1 ulp, coarse rounding so
    a last-ulp divergence cannot flip a DP comparison (the
    ``curation_naive_bayes_langid`` round-before-argmax pattern).

    Scale posture: candidates/vocab/DP state are all
    vocabulary-bounded; the corpus is touched exactly once (word
    counts) plus once more at encode time (broadcast dictionary join).
    """
    words = caching.persist_tracked(_uni_words(spark, sf_dir))
    return words, unigram_vocab_core(words)


def unigram_vocab_core(words: DataFrame) -> DataFrame:
    """Seed-vocabulary scoring of ``_uni_core`` over any ``(w, freq)``
    word table — factored so property tests can feed synthetic
    vocabularies and verify the freq x len scoring, the
    all-chars + top-multi selection, and the integer 0.1-milli-nat
    log-probs against a Python replay (tests/test_corpus_property.py)."""
    cand = _uni_candidates(words)
    scored = cand.groupBy("piece").agg(
        F.sum("freq").cast("long").alias("pfreq")
    )
    scored = scored.select(
        "piece",
        "pfreq",
        (F.col("pfreq") * F.length("piece")).cast("long").alias("score"),
    )
    chars = scored.where(F.length("piece") == 1)
    multi = (
        scored.where(F.length("piece") > 1)
        .orderBy(F.col("score").desc(), F.col("piece").asc())
        .limit(_UNI_TOP_MULTI)
    )
    vocab = caching.persist_tracked(chars.unionByName(multi))
    total = vocab.agg(F.sum("score").alias("t"))
    vocab = vocab.crossJoin(F.broadcast(total)).select(
        "piece",
        "pfreq",
        "score",
        F.round(
            F.log(F.col("score").cast("double") / F.col("t").cast("double"))
            * 10000.0,
            0,
        )
        .cast("long")
        .alias("lp"),
    )
    return caching.persist_tracked(vocab)


def _uni_seed_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top multi-char seed pieces with scores and integer log-probs —
    the trained-state view of the seed step."""
    _, vocab = _uni_core(spark, sf_dir)
    w = Window.orderBy(F.col("score").desc(), F.col("piece").asc())
    return (
        vocab.where(F.length("piece") > 1)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _UNI_SEED_OUT)
        .select("rank", "piece", "pfreq", "score", "lp")
        .orderBy("rank")
    )


def _uni_viterbi_wordlens(spark: SparkSession, sf_dir: str):
    """Viterbi-segment every distinct word under the seed vocab →
    ``(words, wlen)`` where ``wlen`` is ``(w, n_pieces, best_lp)``.

    The DP is bounded and PER-WORD: each word's in-vocabulary piece
    matches are gathered once (one vocabulary-bounded broadcast join +
    one hash aggregate), then the position DP runs as a single left
    fold over positions 1..len(w) inside the row — score ties break to
    FEWER pieces deterministically, exactly as the former relational
    per-round formulation. Words longer than the horizon fall back to
    char segmentation (``np = len``, documented; none exist in the
    fixtures). No driver-side data, no collect, no per-round shuffle."""
    words, vocab = _uni_core(spark, sf_dir)
    return words, viterbi_wordlens_core(words, vocab)


def viterbi_wordlens_core(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """The bounded Viterbi DP of ``_uni_viterbi_wordlens`` over any
    ``(w, freq)`` word table and ``(piece, lp)`` vocabulary — factored
    so property tests can feed synthetic vocabularies and verify the
    max-likelihood segmentation (score ties -> fewer pieces) against
    an exhaustive Python enumeration (tests/test_corpus_property.py).

    r14 optimization (guide §2.4): the DP state used to grow one
    position per ROUND — up to 16 scheduled join+union+checkpoint
    stages, each latency-bound at any scale because the rounds are
    sequential. It is now ONE aggregate (collect the word's piece
    matches, ≤ |w|×6 structs) plus ONE fold over positions inside the
    row: state[e] = max over matches ending at e of
    struct(state[s].b + lp, -(state[s].np + 1)) — the identical
    struct-lexicographic comparison (``array_max`` and the former
    ``F.max`` share Spark's struct ordering), so ties still break to
    fewer pieces. Per-word work is O(len × matches); the whole DP is
    one shuffle instead of O(horizon)."""
    dw = words.where(F.length("w") <= _UNI_MAXPOS)
    matches = (
        _uni_candidates(dw.select("w", "freq"))
        .join(
            F.broadcast(vocab.select("piece", "lp")),
            "piece",
        )
        .select("w", "s", "e", "lp")
    )
    ms = matches.groupBy("w").agg(
        F.collect_list(F.struct("s", "e", "lp")).alias("ms")
    )

    def _step(acc: F.Column, e: F.Column) -> F.Column:
        """DP transition: append position e's best (b, np) or NULL.

        ``try_element_at`` (not ``element_at``) in every lambda: the
        invariants (``_uni_candidates`` guarantees s < e, And
        short-circuits the m['e']==e conjunct first) keep the index in
        bounds today, but under Spark 4 ANSI a plain element_at would
        THROW if predicate evaluation order or the candidate invariant
        ever changed — same hazard class ``_merge_fold`` already
        guards (ADVICE r14)."""
        reach = F.filter(
            F.col("ms"),
            lambda m: (m["e"] == e)
            & F.try_element_at(acc, m["s"] + 1).isNotNull(),
        )
        scored = F.transform(
            reach,
            lambda m: F.struct(
                (F.try_element_at(acc, m["s"] + 1)["b"] + m["lp"]).alias(
                    "b"
                ),
                (-F.try_element_at(acc, m["s"] + 1)["np"] - 1).alias(
                    "negnp"
                ),
            ),
        )
        mx = F.array_max(scored)
        nxt = F.when(
            mx.isNotNull(),
            F.struct(
                mx["b"].alias("b"), (-mx["negnp"]).alias("np")
            ),
        )
        return F.concat(acc, F.array(nxt))

    state = ms.select(
        "w",
        F.aggregate(
            F.sequence(F.lit(1), F.length("w")),
            F.array(
                F.struct(
                    F.lit(0).cast("long").alias("b"),
                    F.lit(0).cast("long").alias("np"),
                )
            ),
            _step,
        ).alias("st"),
    )
    final = (
        state.select(
            "w", F.element_at("st", F.length("w") + 1).alias("fin")
        )
        .where(F.col("fin").isNotNull())
        .select(
            "w",
            F.col("fin.np").alias("n_pieces"),
            F.col("fin.b").alias("best_lp"),
        )
    )
    fallback = words.where(F.length("w") > _UNI_MAXPOS).select(
        "w",
        F.length("w").cast("long").alias("n_pieces"),
        F.lit(None).cast("long").alias("best_lp"),
    )
    return final.unionByName(fallback)


def _uni_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document encoded length under the unigram-LM tokenizer —
    the ``corpus_bpe_encode_lengths`` twin for the Viterbi coder:
    pieces are word-internal, so a doc's token count is one broadcast
    dictionary join away from the vocabulary-bounded trained state."""
    _, wlen = _uni_viterbi_wordlens(spark, sf_dir)
    dw = (
        _docs(spark, sf_dir)
        .select(
            "doc_id", F.explode(tokens(normalized(F.col("text")))).alias("w")
        )
        .where(F.length("w") >= 1)
    )
    return (
        dw.join(F.broadcast(wlen), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_pieces").cast("long").alias("n_uni_tokens"),
            F.sum("best_lp").cast("long").alias("sum_lp"),
            F.sum(F.length("w")).cast("long").alias("n_chars"),
        )
        .orderBy("doc_id")
    )


_UNI_WORDS_HEAD = r"""
WITH words AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split(
      lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ')) AS w
    FROM documents
  ) WHERE length(w) >= 1 GROUP BY w
)"""

# the seed-vocab chain, relative to an existing `words` CTE — appended
# to either _UNI_WORDS_HEAD or the BPE oracle's head (same `words`)
_UNI_VOCAB_CHAIN = r""",
cand AS MATERIALIZED (
  SELECT w, freq, s, s + l AS e, substring(w, s + 1, l) AS piece FROM (
    SELECT w, freq, t.s AS s, u.l AS l
    FROM words,
         unnest(generate_series(0, length(w) - 1)) t(s),
         unnest(generate_series(1, __MAXP__)) u(l)
    WHERE t.s + u.l <= length(w)
  )
),
scored AS MATERIALIZED (
  SELECT piece, CAST(sum(freq) AS BIGINT) AS pfreq,
         CAST(sum(freq) * length(piece) AS BIGINT) AS score
  FROM cand GROUP BY piece
),
vocab0 AS MATERIALIZED (
  SELECT piece, pfreq, score FROM scored WHERE length(piece) = 1
  UNION ALL
  SELECT piece, pfreq, score FROM (
    SELECT *, row_number() OVER (ORDER BY score DESC, piece ASC) AS rn
    FROM scored WHERE length(piece) > 1
  ) WHERE rn <= __TOPM__
),
vocab AS MATERIALIZED (
  SELECT piece, pfreq, score,
         CAST(round(ln(CAST(score AS DOUBLE)
               / (SELECT CAST(sum(score) AS DOUBLE) FROM vocab0)) * 10000)
              AS BIGINT) AS lp
  FROM vocab0
)"""

_UNI_WORDS_SQL = _UNI_WORDS_HEAD + _UNI_VOCAB_CHAIN


def _uni_seed_sql() -> str:
    return (
        _UNI_WORDS_SQL.replace("__MAXP__", str(_UNI_MAX_PIECE)).replace(
            "__TOPM__", str(_UNI_TOP_MULTI)
        )
        + f"""
SELECT CAST(rank AS BIGINT) AS rank, piece, pfreq, score, lp FROM (
  SELECT piece, pfreq, score, lp,
         row_number() OVER (ORDER BY score DESC, piece ASC) AS rank
  FROM vocab WHERE length(piece) > 1
) WHERE rank <= {_UNI_SEED_OUT} ORDER BY rank"""
    )


def _uni_dp_sql() -> str:
    """The Viterbi DP chain (matches, a0, p1..aN, wlen), relative to
    existing `cand` / `vocab` / `words` CTEs."""
    parts = [
        f""",
matches AS MATERIALIZED (
  SELECT c.w, c.s, c.e, v.lp
  FROM cand c JOIN vocab v USING (piece)
  WHERE length(c.w) <= {_UNI_MAXPOS}
),
a0 AS MATERIALIZED (
  SELECT w, 0 AS pos, CAST(0 AS BIGINT) AS best, CAST(0 AS BIGINT) AS np
  FROM words WHERE length(w) <= {_UNI_MAXPOS}
)""",
    ]
    for e in range(1, _UNI_MAXPOS + 1):
        parts.append(
            f""",
p{e} AS MATERIALIZED (
  SELECT w, {e} AS pos, best, np FROM (
    SELECT w, best, np, row_number() OVER (
        PARTITION BY w ORDER BY best DESC, np ASC) AS rn
    FROM (
      SELECT m.w, a.best + m.lp AS best, a.np + 1 AS np
      FROM matches m JOIN a{e - 1} a ON a.w = m.w AND a.pos = m.s
      WHERE m.e = {e}
    )
  ) WHERE rn = 1
),
a{e} AS MATERIALIZED (
  SELECT * FROM a{e - 1} UNION ALL SELECT * FROM p{e}
)"""
        )
    parts.append(
        f""",
wlen AS (
  SELECT a.w, a.np AS n_pieces, a.best AS best_lp
  FROM a{_UNI_MAXPOS} a JOIN words ww ON ww.w = a.w
  WHERE a.pos = length(a.w)
  UNION ALL
  SELECT w, CAST(length(w) AS BIGINT) AS n_pieces,
         CAST(NULL AS BIGINT) AS best_lp
  FROM words WHERE length(w) > {_UNI_MAXPOS}
)"""
    )
    return "".join(parts)


def _uni_encode_sql() -> str:
    return (
        _UNI_WORDS_SQL.replace("__MAXP__", str(_UNI_MAX_PIECE)).replace(
            "__TOPM__", str(_UNI_TOP_MULTI)
        )
        + _uni_dp_sql()
        + r""",
dw AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(
      lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ')) AS w
    FROM documents
  ) WHERE length(w) >= 1
)
SELECT dw.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(l.n_pieces) AS BIGINT) AS n_uni_tokens,
       CAST(sum(l.best_lp) AS BIGINT) AS sum_lp,
       CAST(sum(length(dw.w)) AS BIGINT) AS n_chars
FROM dw JOIN wlen l ON l.w = dw.w
GROUP BY dw.doc_id ORDER BY dw.doc_id"""
    )


register(
    QuerySpec(
        "corpus_unigram_seed_vocab",
        _uni_seed_vocab,
        _uni_seed_sql(),
        doc="unigram-LM (SentencePiece) SEED vocabulary: every word-"
        "internal substring (len 1-6) scored freq x len over the "
        "vocabulary-bounded word table; all single chars + top-200 "
        "multi-char pieces, integer 0.1-milli-nat log-probs — the "
        "seeding step of Kudo (2018) beside the BPE trainer",
        tags=("extension", "corpus", "text", "tokenizer"),
    )
)


register(
    QuerySpec(
        "corpus_unigram_viterbi_encode",
        _uni_encode,
        _uni_encode_sql(),
        doc="Viterbi encoding under the unigram-LM seed vocab: exact "
        "integer-log-prob DP per DISTINCT word (bounded horizon, "
        "score ties break to fewer pieces), then per-doc token counts "
        "via one broadcast dictionary join — max-likelihood "
        "segmentation, the decode half of SentencePiece, beside "
        "greedy-merge BPE",
        tags=("extension", "corpus", "text", "tokenizer", "iterative"),
    )
)


# ---------------------------------------------------------------------------
# tokenizer fertility comparison (round 6)
# ---------------------------------------------------------------------------


def _tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fertility (subword tokens per word) per language for BOTH
    trained coders — greedy-merge BPE and unigram-LM Viterbi — the
    standard tokenizer-evaluation metric (multilingual fertility skew
    is how a tokenizer silently taxes some languages with more tokens
    per word). Trained state from both cores is vocabulary-bounded;
    the corpus is touched once for the (lang, word) stream, which
    joins both per-word length tables broadcast."""
    _, seq = _bpe_core(spark, sf_dir)
    bpe_wlen = seq.select(
        F.col("rid").alias("w"),
        F.size("syms").cast("long").alias("bpe_tok"),
    )
    _, uni_wlen = _uni_viterbi_wordlens(spark, sf_dir)
    dwl = (
        _docs(spark, sf_dir)
        .select("lang", F.explode(tokens(normalized(F.col("text")))).alias("w"))
        .where(F.length("w") >= 1)
    )
    agg = (
        dwl.join(F.broadcast(bpe_wlen), "w")
        .join(F.broadcast(uni_wlen.select("w", "n_pieces")), "w")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("bpe_tok").cast("long").alias("bpe_tokens"),
            F.sum("n_pieces").cast("long").alias("uni_tokens"),
        )
    )
    out = agg.select(
        "lang",
        F.lit("bpe").alias("coder"),
        "n_words",
        F.col("bpe_tokens").alias("n_subword_tokens"),
    ).unionByName(
        agg.select(
            "lang",
            F.lit("unigram").alias("coder"),
            "n_words",
            F.col("uni_tokens").alias("n_subword_tokens"),
        )
    )
    return out.select(
        "lang",
        "coder",
        "n_words",
        "n_subword_tokens",
        F.round(
            F.col("n_subword_tokens").cast("double")
            / F.col("n_words").cast("double"),
            6,
        ).alias("fertility_r6"),
    ).orderBy("lang", "coder")


def _fertility_sql() -> str:
    uni_chain = _UNI_VOCAB_CHAIN.replace(
        "__MAXP__", str(_UNI_MAX_PIECE)
    ).replace("__TOPM__", str(_UNI_TOP_MULTI))
    return _bpe_oracle(
        tail=uni_chain
        + _uni_dp_sql()
        + rf""",
dwl AS (
  SELECT lang, w FROM (
    SELECT lang, unnest(string_split(
      lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ')) AS w
    FROM documents
  ) WHERE length(w) >= 1
),
bpe_wlen AS (
  SELECT rid AS w, CAST(len(string_split(seq, ' ')) AS BIGINT) AS bpe_tok
  FROM seq{_BPE_ROUNDS}
),
agg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(b.bpe_tok) AS BIGINT) AS bpe_tokens,
         CAST(sum(u.n_pieces) AS BIGINT) AS uni_tokens
  FROM dwl JOIN bpe_wlen b ON b.w = dwl.w
  JOIN wlen u ON u.w = dwl.w
  GROUP BY lang
),
u AS (
  SELECT lang, 'bpe' AS coder, n_words, bpe_tokens AS n_subword_tokens
  FROM agg
  UNION ALL
  SELECT lang, 'unigram', n_words, uni_tokens FROM agg
)
SELECT lang, coder, n_words, n_subword_tokens,
       round(CAST(n_subword_tokens AS DOUBLE) / n_words, 6)
         AS fertility_r6
FROM u ORDER BY lang, coder"""
    )


register(
    QuerySpec(
        "corpus_tokenizer_fertility",
        _tokenizer_fertility,
        _fertility_sql(),
        doc="tokenizer fertility (subword tokens per word) per language "
        "for BOTH trained coders — BPE greedy merges vs unigram-LM "
        "Viterbi — the multilingual tokenizer-eval metric; one corpus "
        "pass over (lang, word), both per-word length tables broadcast "
        "from vocabulary-bounded trained state",
        tags=("extension", "corpus", "text", "tokenizer", "statistics"),
    )
)


# ---------------------------------------------------------------------------
# END-TO-END corpus pipeline: filter -> dedup -> split -> pack -> manifest
# ---------------------------------------------------------------------------

_PIPE_MIN_TOKENS = 10


def _pipeline_end2end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-corpus pipeline as ONE composed dataflow —
    quality filter → exact-dup keeper election → train-split assignment
    → greedy sequence packing → shard manifest — each stage the
    operator its standalone query verifies, now chained so the ORACLE
    CHECKS THE COMPOSITION (stage interfaces, not just stage outputs:
    a keeper elected from pre-filter docs, or packing run before the
    split, would change the manifest hash).

    Scale posture is inherited stage-by-stage: the filter fuses into
    the scan; keeper election is one hash-groupBy; split assignment is
    per-row md5 arithmetic; packing is the bounded per-(lang, shard)
    fold via applyInPandas. One corpus scan feeds everything — no stage
    re-reads the source."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        normalized(F.col("text")).alias("norm"),
    )
    d = d.withColumn("n_tokens", F.size(F.split("norm", " ")))
    q = d.where(F.col("n_tokens") >= _PIPE_MIN_TOKENS)
    keepers = q.groupBy(F.md5("norm").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    surv = q.join(keepers.select("doc_id"), "doc_id", "left_semi")
    train = surv.where(
        _md5_mod(F.col("doc_id"), "split:", 100) < _TRAIN_PCT
    )
    sharded = train.withColumn(
        "shard", _md5_mod(F.col("doc_id"), "pack:", _PACK_SHARDS).cast("int")
    )
    packed = (
        sharded.select("doc_id", "lang", "n_tokens", "shard")
        .groupBy("lang", "shard")
        .applyInPandas(_make_pack_fn(_PACK_BUDGET), schema=_PACK_SCHEMA)
    )
    return packed.orderBy("lang", "shard", "bin_id")


register(
    QuerySpec(
        "corpus_pipeline_end2end",
        _pipeline_end2end,
        rf"""
WITH RECURSIVE d0 AS (
  SELECT doc_id, lang,
         lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS norm
  FROM documents
),
dt AS (
  SELECT doc_id, lang, norm,
         CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens
  FROM d0
),
q AS (SELECT * FROM dt WHERE n_tokens >= {_PIPE_MIN_TOKENS}),
keep AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(norm)),
surv AS (SELECT q.* FROM q JOIN keep USING (doc_id)),
tr AS (
  SELECT * FROM surv
  WHERE CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
        AS BIGINT) % 100 < {_TRAIN_PCT}
),
st AS (
  SELECT lang,
         CAST(CAST('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) % {_PACK_SHARDS} AS INTEGER) AS shard,
         doc_id, n_tokens
  FROM tr
),
seq AS (
  SELECT lang, shard, doc_id, n_tokens,
         row_number() OVER (PARTITION BY lang, shard ORDER BY doc_id) AS rn
  FROM st
),
pack AS (
  SELECT lang, shard, rn, n_tokens,
         CAST(1 AS BIGINT) AS bin_id, n_tokens AS fill
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.lang, s.shard, s.rn, s.n_tokens,
         CASE WHEN p.fill + s.n_tokens > {_PACK_BUDGET}
              THEN p.bin_id + 1 ELSE p.bin_id END,
         CASE WHEN p.fill + s.n_tokens > {_PACK_BUDGET}
              THEN s.n_tokens ELSE p.fill + s.n_tokens END
  FROM seq s
  JOIN pack p ON s.lang = p.lang AND s.shard = p.shard AND s.rn = p.rn + 1
)
SELECT lang, shard, bin_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
FROM pack GROUP BY lang, shard, bin_id
ORDER BY lang, shard, bin_id
""",
        doc="end-to-end corpus pipeline in one dataflow: quality filter "
        "-> exact-dup keepers -> train split -> greedy packing -> shard "
        "manifest; the oracle checks the COMPOSITION (stage interfaces, "
        "not just stage outputs)",
        tags=("extension", "curation", "pipeline", "pandas-udf"),
    )
)


# ---------------------------------------------------------------------------
# dataset datasheet: the publishable corpus summary card
# ---------------------------------------------------------------------------


def _dataset_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card ("datasheets for datasets") a corpus release
    ships: per language — document and token counts, length extrema,
    exact-duplicate rate, and train/valid/test split sizes, every
    number integer-exact and derived in ONE pass over the corpus plus
    one vocabulary-bounded dup aggregate. The per-language rows are
    the publishable summary; regenerating the card after any pipeline
    change and hash-comparing IS the release check."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        normalized(F.col("text")).alias("norm"),
    )
    d = d.withColumn("n_tokens", F.size(F.split("norm", " "))).withColumn(
        "h", F.md5("norm")
    )
    dup = d.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    d = d.join(F.broadcast(dup), "h")
    split = (
        F.when(_md5_mod(F.col("doc_id"), "split:", 100) < _TRAIN_PCT, "train")
        .when(_md5_mod(F.col("doc_id"), "split:", 100) < _VALID_PCT, "valid")
        .otherwise("test")
    )
    return (
        d.withColumn("split", split)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.min("n_tokens").cast("long").alias("min_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_exact_dup_docs"),
            F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
            .cast("long")
            .alias("n_train"),
            F.sum(F.when(F.col("split") == "valid", 1).otherwise(0))
            .cast("long")
            .alias("n_valid"),
            F.sum(F.when(F.col("split") == "test", 1).otherwise(0))
            .cast("long")
            .alias("n_test"),
        )
        .orderBy("lang")
    )


register(
    QuerySpec(
        "corpus_dataset_datasheet",
        _dataset_datasheet,
        rf"""
WITH d AS (
  SELECT doc_id, lang,
         lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS norm
  FROM documents
),
dt AS (
  SELECT doc_id, lang, norm, md5(norm) AS h,
         CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens
  FROM d
),
dup AS (SELECT h, count(*) AS c FROM dt GROUP BY h),
j AS (
  SELECT dt.*, dup.c,
         CASE WHEN CAST('0x' || substr(md5('split:'
                || CAST(dt.doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100
                < {_TRAIN_PCT} THEN 'train'
              WHEN CAST('0x' || substr(md5('split:'
                || CAST(dt.doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100
                < {_VALID_PCT} THEN 'valid'
              ELSE 'test' END AS split
  FROM dt JOIN dup USING (h)
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(min(n_tokens) AS BIGINT) AS min_tokens,
       CAST(max(n_tokens) AS BIGINT) AS max_tokens,
       CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact_dup_docs,
       CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_train,
       CAST(sum(CASE WHEN split = 'valid' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_valid,
       CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_test
FROM j GROUP BY lang ORDER BY lang
""",
        doc="dataset datasheet: per-language docs/tokens/extrema, exact-"
        "dup rate, and split sizes in one corpus pass + one vocabulary-"
        "bounded dup aggregate — the publishable release card, "
        "hash-comparable across pipeline changes",
        tags=("extension", "corpus", "curation", "datasheet"),
    )
)


# ---------------------------------------------------------------------------
# perplexity-filter curation (round 4): p90 NLL gate per language
# ---------------------------------------------------------------------------


def _perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity filtering: score every document with the
    corpus-trained bigram LM (``corpus_bigram_lm_nll``'s model), set
    the gate at the exact p90 of the per-doc scores, and report the
    per-language keep/filter split — the step that drops the noisiest
    decile before training. A real pipeline swaps in a frozen reference
    LM; gate shape and data flow are identical.

    Determinism: the gate compares 6-dp ROUNDED per-doc scores against
    the 6-dp rounded exact-interpolated p90 of those same rounded
    scores, so both engines gate on bit-identical values (the strict
    ``>`` keeps p90-boundary docs). The threshold is a 1-row broadcast;
    everything after the scoring join is language-bounded."""
    docs = _docs(spark, sf_dir)
    scored = (
        _bigram_nll_stream(spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.round(F.avg("nll"), 6).alias("nll_r6"))
    )
    # consumed twice (threshold + gate): materialize the per-doc scores
    scored = caching.persist_tracked(scored)
    thresh = scored.agg(
        F.round(F.expr("percentile(nll_r6, 0.9)"), 6).alias("p90")
    )
    gated = scored.crossJoin(F.broadcast(thresh)).select(
        "doc_id", (F.col("nll_r6") > F.col("p90")).alias("filtered")
    )
    return (
        docs.select("doc_id", "lang")
        .join(gated, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("filtered").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_unscored"),
            F.sum(F.when(F.col("filtered"), 1).otherwise(0))
            .cast("long")
            .alias("n_filtered"),
            F.round(
                F.sum(
                    F.when(
                        F.col("filtered").isNull() | ~F.col("filtered"), 1
                    ).otherwise(0)
                )
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("keep_rate_r6"),
        )
        .orderBy("lang")
    )


register(
    QuerySpec(
        "curation_perplexity_filter",
        _perplexity_filter,
        r"""
WITH toks AS (
  SELECT doc_id,
         string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')),
                      ' ') AS t
  FROM documents
),
tok AS (
  SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS pos FROM toks
),
big AS (
  SELECT doc_id, w1, w2 FROM (
    SELECT doc_id, w AS w1,
           lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM tok
  ) WHERE w2 IS NOT NULL
),
cb AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY w1, w2),
cu AS (SELECT w1, count(*) AS c1 FROM big GROUP BY w1),
v AS (SELECT count(DISTINCT w) AS vsz FROM tok),
scored AS (
  SELECT big.doc_id,
         round(avg(-ln((cb.c2 + 1.0)
               / (cu.c1 + (SELECT vsz FROM v)))), 6) AS nll_r6
  FROM big JOIN cb USING (w1, w2) JOIN cu USING (w1)
  GROUP BY big.doc_id
),
thresh AS (SELECT round(quantile_cont(nll_r6, 0.9), 6) AS p90 FROM scored),
gated AS (
  SELECT doc_id, nll_r6 > (SELECT p90 FROM thresh) AS filtered FROM scored
)
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN g.filtered IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unscored,
       CAST(sum(CASE WHEN g.filtered THEN 1 ELSE 0 END) AS BIGINT)
         AS n_filtered,
       round(sum(CASE WHEN g.filtered IS NULL OR NOT g.filtered
                      THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS keep_rate_r6
FROM documents d LEFT JOIN gated g USING (doc_id)
GROUP BY d.lang ORDER BY d.lang
""",
        doc="CCNet-style perplexity filter: corpus-trained bigram-LM "
        "scores gated at the exact p90 (rounded-score comparison for "
        "cross-engine bit-equality), per-language keep/filter split — "
        "the drop-the-noisiest-decile curation step",
        tags=("extension", "curation", "quality"),
    )
)


# ---------------------------------------------------------------------------
# span-corruption objective plan (round 5)
# ---------------------------------------------------------------------------

_SPAN_BLOCK = 8   # positions per block
_SPAN_LEN = 3     # masked span = first 3 positions of a selected block
_SPAN_MOD = 4     # 1 in 4 blocks selected -> ~9% token mask rate


def _span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-corruption data generation (the T5/UL2 denoising objective)
    as a DETERMINISTIC relational plan: token positions are cut into
    8-position blocks, a seeded md5 pick selects 1-in-4 blocks, and the
    first 3 positions of each selected block form the masked span —
    non-overlapping BY CONSTRUCTION (blocks partition the position
    space), so no greedy conflict resolution is needed anywhere. The
    report is the per-language mask accounting a data pipeline checks
    before launching a pretraining run (mask rate, span count, mean
    span length including doc-end clamping).

    Shape at 100 TB: posexplode + per-row hash arithmetic + one
    aggregate — no windows, no joins, no state; the masking decision is
    reproducible from (doc_id, block) alone, so shards can be
    regenerated independently."""
    d = _docs(spark, sf_dir).select(
        "doc_id", "lang", tokens(normalized(F.col("text"))).alias("toks")
    )
    tok = d.select(
        "doc_id", "lang", F.posexplode("toks").alias("pos", "t")
    ).where(F.length("t") > 0)
    block = (F.col("pos") / _SPAN_BLOCK).cast("long")
    picked = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("span:"),
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        block.cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _SPAN_MOD
        == 0
    )
    masked = picked & (F.col("pos") % _SPAN_BLOCK < _SPAN_LEN)
    flagged = tok.select(
        "doc_id",
        "lang",
        masked.alias("is_masked"),
        F.when(masked, block).alias("span_key"),
    )
    return (
        flagged.groupBy("lang")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("total_tokens"),
            F.sum(F.when(F.col("is_masked"), 1).otherwise(0))
            .cast("long")
            .alias("masked_tokens"),
            F.countDistinct("doc_id", "span_key")
            .cast("long")
            .alias("n_spans"),
        )
        .select(
            "lang",
            "n_docs",
            "total_tokens",
            "masked_tokens",
            "n_spans",
            F.round(
                F.col("masked_tokens").cast("double") / F.col("total_tokens"),
                6,
            ).alias("mask_ratio_r6"),
            F.round(
                # try_divide: a language whose docs are all too short to
                # fit one span has n_spans = 0 — NULL (DuckDB's x/0), not
                # an ANSI crash
                F.try_divide(
                    F.col("masked_tokens").cast("double"), F.col("n_spans")
                ),
                6,
            ).alias("avg_span_len_r6"),
        )
        .orderBy("lang")
    )


register(
    QuerySpec(
        "corpus_span_corruption_plan",
        _span_corruption_plan,
        f"""
WITH d AS (
  SELECT doc_id, lang,
         string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')
           AS toks
  FROM documents
),
tok AS (
  SELECT doc_id, lang, i AS pos
  FROM d, unnest(generate_series(0, len(toks) - 1)) t(i)
  WHERE length(toks[i + 1]) > 0
),
flagged AS (
  SELECT doc_id, lang, pos,
         pos // {_SPAN_BLOCK} AS block,
         (CAST('0x' || substr(md5('span:' || CAST(doc_id AS VARCHAR) || ':'
               || CAST(pos // {_SPAN_BLOCK} AS VARCHAR)), 1, 8) AS BIGINT)
            % {_SPAN_MOD} = 0)
         AND (pos % {_SPAN_BLOCK} < {_SPAN_LEN}) AS is_masked
  FROM tok
)
SELECT lang,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN is_masked THEN 1 ELSE 0 END) AS BIGINT)
         AS masked_tokens,
       -- DISTINCT over the (doc_id, block) PAIR, not a multiplicative
       -- composite: doc_id * 1e6 + block collides for blocks >= 1e6
       -- (8M-token docs) and overflows BIGINT for doc_id > ~9.2e12
       -- (r10 review)
       CAST(count(DISTINCT CASE WHEN is_masked
            THEN (doc_id, block) END) AS BIGINT) AS n_spans,
       round(CAST(sum(CASE WHEN is_masked THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS mask_ratio_r6,
       round(CAST(sum(CASE WHEN is_masked THEN 1 ELSE 0 END) AS DOUBLE)
             / count(DISTINCT CASE WHEN is_masked
                  THEN (doc_id, block) END), 6) AS avg_span_len_r6
FROM flagged GROUP BY lang ORDER BY lang
""",
        doc="Span-corruption (T5/UL2) data-gen plan: blocks of 8 token "
        "positions, seeded md5 1-in-4 block pick, first-3 positions "
        "masked - non-overlapping by construction, shard-reproducible "
        "from (doc_id, block); per-language mask rate / span count / "
        "mean span length accounting",
        tags=("extension", "corpus", "training"),
    )
)
