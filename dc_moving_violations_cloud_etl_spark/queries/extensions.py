"""LLM-data-pipeline extension queries (BASELINE.json north-star),
oracle-checked: text analysis, dedup family, similarity search,
multimodal plumbing — each over the ``documents`` / ``embeddings``
fixtures with a DuckDB twin mirroring the algorithm hash-for-hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import caching, catalog
from ..operators import dedup, multimodal, similarity
from ..oracle import with_ref_views
from ..operators.text import (
    BPE_PATTERN,
    LANG_MARKERS,
    LANG_PRIORITY,
    RH_ALPHABET,
    RH_BASE,
    RH_MOD,
    RH_PREFIX,
    STOPWORDS,
    bpe_tokens,
    lang_pred,
    lang_scores,
    normalized,
    punct_ratio,
    quality_bucket,
    rolling_hash,
    token_stats,
    tokens,
)
from .registry import QuerySpec, register

# ---------------------------------------------------------------------------
# shared DuckDB CTE mirroring operators/text.py normalization
# ---------------------------------------------------------------------------

_DOCS_CTE = r"""
WITH _d0 AS (
  SELECT doc_id, lang,
         lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS norm
  FROM documents
),
docs_n AS (
  SELECT doc_id, lang, norm,
         md5(norm) AS text_hash,
         md5(substr(norm, 1, 40)) AS fp40,
         -- NULL norm propagates: Spark's shingles of NULL is NULL,
         -- while the bare generate_series spell manufactured a
         -- non-NULL list from NULL input (r11 dirty-fixture
         -- alignment). Short texts (len < 3) correctly pin to ONE
         -- whole-string shingle on both engines: substr(norm, 1, 3)
         -- of a 0-2 char norm IS the whole norm, matching the Spark
         -- side's explicit when(length < n, array(norm)) guard
         -- (operators/text.py shingles_raw)
         CASE WHEN norm IS NULL THEN NULL
              ELSE list_distinct(list_transform(
                     generate_series(1, greatest(len(norm) - 2, 1)),
                     i -> substr(norm, i, 3)))
         END AS sh,
         string_split(norm, ' ') AS toks
  FROM _d0
)
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the corpus arrives as one small parquet file → one input split;
    # fan out to session parallelism so the expression-heavy text/dedup
    # pipelines use every core (no-op when the source is already split)
    return dedup._fan_out(catalog.base(spark, sf_dir, "documents"))


# declared embedding dimensionality (fixture contract; the PCA Gram
# pass pinned it first - eval_ops._PCA_DIM)
EMB_DIM = 64


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings with INGESTION VALIDATION: NULL or off-dimension
    vectors are excluded before any consumer sees them — at 100 TB an
    index build validates dimensionality at ingestion; letting a
    2-dim vector into a 64-dim ranking is meaningless on any engine
    and each engine made it meaningless DIFFERENTLY (zip products vs
    out-of-bounds NULL indexing), which is why the whole ANN family
    diverged on the r11 dirty fixture. Every oracle twin that reads
    the embeddings table carries the identical
    ``WHERE embedding IS NOT NULL AND len(embedding) = 64`` guard
    (clean-neutral: the clean fixture is 100% 64-dim non-NULL,
    verified). In-dimension edge values (zero-norm vectors, NULL
    labels) deliberately STAY IN - their try_divide/NULL-ordering
    handling is part of the certified surface."""
    return catalog.base(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull() & (F.size("embedding") == EMB_DIM)
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def _text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select(
        "doc_id", tokens(normalized(F.col("text"))).alias("toks")
    )
    st = token_stats(F.col("toks"))
    return d.select(
        "doc_id",
        st["n_tokens"].alias("n_tokens"),
        st["n_distinct_tokens"].alias("n_distinct_tokens"),
        st["avg_token_len"],
        st["stopword_ratio"],
    ).withColumn(
        "quality", quality_bucket(F.col("n_tokens"), F.col("stopword_ratio"))
    ).orderBy("doc_id")


_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

register(
    QuerySpec(
        "text_stats_quality",
        _text_stats,
        _DOCS_CTE
        + f"""
, st AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
         CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE)
           / CAST(len(toks) AS BIGINT) AS avg_token_len,
         CAST(len(list_filter(toks, t -> t IN ({_STOP_SQL}))) AS DOUBLE)
           / CAST(len(toks) AS BIGINT) AS stopword_ratio
  FROM docs_n
)
SELECT *,
       CASE WHEN n_tokens < 20 THEN 'low'
            WHEN stopword_ratio >= 0.02 AND n_tokens >= 40 THEN 'high'
            ELSE 'medium' END AS quality
FROM st ORDER BY doc_id
""",
        doc="Token counting + quality scoring over documents (north-star "
        "text analysis; whole-stage-codegen expressions, no UDFs)",
        tags=("extension", "text"),
    )
)


def _lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select(
        "doc_id", "lang", tokens(normalized(F.col("text"))).alias("toks")
    )
    scores = lang_scores(F.col("toks"))
    return (
        d.withColumn("pred_lang", lang_pred(scores))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )


def _lang_sql() -> str:
    score_cols = ",\n         ".join(
        "CAST(len(list_intersect(list_distinct(toks), ["
        + ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        + f"])) AS BIGINT) AS s_{lang}"
        for lang in LANG_PRIORITY
    )
    case_lines = []
    for i, lang in enumerate(LANG_PRIORITY[:-1]):
        conds = " AND ".join(
            f"s_{lang} >= s_{other}" for other in LANG_PRIORITY[i + 1 :]
        )
        case_lines.append(f"WHEN {conds} THEN '{lang}'")
    case_sql = "CASE " + " ".join(case_lines) + f" ELSE '{LANG_PRIORITY[-1]}' END"
    return (
        _DOCS_CTE
        + f"""
, scored AS (
  SELECT doc_id, lang,
         {score_cols}
  FROM docs_n
)
SELECT lang, {case_sql} AS pred_lang, count(*) AS n_docs
FROM scored GROUP BY lang, pred_lang ORDER BY lang, pred_lang
"""
    )


register(
    QuerySpec(
        "lang_id_confusion",
        _lang_id,
        _lang_sql(),
        doc="Marker-stopword language-ID heuristic, confusion matrix vs the "
        "lang label (labels are not content-derived in the fixture — "
        "accuracy is reported, not optimized)",
        tags=("extension", "text"),
    )
)


def _bpe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    norm = normalized(F.col("text"))
    return (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.size(bpe_tokens(norm)).cast("long").alias("n_bpe_tokens"),
            F.size(tokens(norm)).cast("long").alias("n_ws_tokens"),
            punct_ratio(norm).alias("punct_ratio"),
        )
        .orderBy("doc_id")
    )


register(
    QuerySpec(
        "text_bpe_token_stats",
        _bpe_stats,
        _DOCS_CTE
        + f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(norm, '{BPE_PATTERN}')) AS BIGINT) AS n_bpe_tokens,
       CAST(len(toks) AS BIGINT) AS n_ws_tokens,
       CASE WHEN len(norm) > 0
            THEN CAST(len(regexp_replace(norm, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                   / CAST(len(norm) AS DOUBLE)
            ELSE 0.0 END AS punct_ratio
FROM docs_n ORDER BY doc_id
""",
        doc="BPE-ish regex pretoken counting vs whitespace tokens + "
        "punctuation-ratio quality signal (pure regex projections, "
        "whole-stage codegen)",
        tags=("extension", "text"),
    )
)


_RH_CHARS_SQL = "[" + ", ".join(
    "'" + ch.replace("'", "''") + "'" for ch in RH_ALPHABET
) + "]"

register(
    QuerySpec(
        "text_rolling_fingerprint",
        lambda spark, sf_dir: _docs(spark, sf_dir)
        .select(
            "doc_id",
            rolling_hash(normalized(F.col("text"))).alias("rhash"),
        )
        .orderBy("doc_id"),
        _DOCS_CTE
        + f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(
             generate_series(1, greatest(least(len(norm), {RH_PREFIX}), 1)),
             i -> CAST(list_position({_RH_CHARS_SQL}, substr(norm, i, 1)) AS BIGINT))),
         (acc, c) -> (acc * {RH_BASE} + c) % {RH_MOD}) AS rhash
FROM docs_n ORDER BY doc_id
""",
        doc="Rabin-Karp polynomial rolling-hash document fingerprint over "
        "the first 64 normalized chars (integer-exact fold, bit-identical "
        "across engines)",
        tags=("extension", "text"),
    )
)


def _vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select(
        "doc_id", tokens(normalized(F.col("text"))).alias("toks")
    )
    tok = d.select("doc_id", F.explode("toks").alias("t"))
    return (
        tok.groupBy("t")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_total"), F.asc("t"))
        .limit(20)
    )


register(
    QuerySpec(
        "text_vocab_topk",
        _vocab_topk,
        _DOCS_CTE
        + """
, tok AS (
  SELECT doc_id, unnest(toks) AS t FROM docs_n
)
SELECT t, count(*) AS n_total, count(DISTINCT doc_id) AS n_docs
FROM tok GROUP BY t
ORDER BY n_total DESC, t ASC
LIMIT 20
""",
        doc="Corpus vocabulary top-k by occurrence (explode -> hash-agg -> "
        "top-k; deterministic tie-break on the token). The engine's "
        "ORDER BY ... LIMIT path (TakeOrderedAndProject) — absent from "
        "the reference surface",
        tags=("extension", "text", "topk"),
    )
)


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------


register(
    QuerySpec(
        "dedup_exact_summary",
        lambda spark, sf_dir: dedup.exact_dup_summary(_docs(spark, sf_dir)),
        _DOCS_CTE
        + """
SELECT count(*) AS n_docs,
       count(DISTINCT text_hash) AS n_unique_texts,
       count(*) - count(DISTINCT text_hash) AS n_dup_docs
FROM docs_n
WHERE norm IS NOT NULL
""",
        doc="Exact dedup: hash-groupBy accounting on normalized text",
        tags=("extension", "dedup"),
    )
)

register(
    QuerySpec(
        "dedup_fingerprint_groups",
        lambda spark, sf_dir: dedup.fingerprint_dup_groups(_docs(spark, sf_dir)),
        _DOCS_CTE
        + """
SELECT fp40, count(*) AS dup_count, min(doc_id) AS keeper_doc_id
FROM docs_n WHERE norm IS NOT NULL
GROUP BY fp40 HAVING count(*) > 1 ORDER BY fp40
""",
        doc="Prefix-fingerprint near-dup blocking groups (keeper = min id)",
        tags=("extension", "dedup"),
    )
)

_JACCARD_SQL = (
    "round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)"
    " / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6)"
)

register(
    QuerySpec(
        "dedup_ngram_jaccard_pairs",
        lambda spark, sf_dir: dedup.ngram_jaccard_pairs(_docs(spark, sf_dir)),
        _DOCS_CTE
        + f"""
SELECT a.doc_id AS a_doc_id, b.doc_id AS b_doc_id,
       {_JACCARD_SQL} AS jaccard
FROM docs_n a JOIN docs_n b ON a.fp40 = b.fp40 AND a.doc_id < b.doc_id
WHERE {_JACCARD_SQL} >= 0.5
ORDER BY a_doc_id, b_doc_id
""",
        doc="n-gram Jaccard near-dup pairs, fingerprint-blocked (equi-join, "
        "no cross join)",
        tags=("extension", "dedup"),
    )
)


# shared signature CTEs mirroring operators/dedup.minhash_signatures
# hash-for-hash: one 31-bit md5-prefix base hash per shingle, 16
# universal-hash permutations (a·h+b mod p) with the same coefficient
# table, 4 band hashes over the long signatures
_MINHASH_A_SQL = "[" + ", ".join(str(a) for a, _ in dedup.MINHASH_COEFFS) + "]"
_MINHASH_B_SQL = "[" + ", ".join(str(b) for _, b in dedup.MINHASH_COEFFS) + "]"
_MINHASH_SIG_SQL = f"""
, based AS (
  SELECT doc_id,
         list_transform(sh,
           x -> CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)
                % {dedup.MINHASH_PRIME}) AS hb
  FROM docs_n WHERE norm IS NOT NULL
),
sigs AS (
  SELECT doc_id,
         list_transform(generate_series(0, 15),
           s -> list_min(list_transform(hb,
             h -> ({_MINHASH_A_SQL}[s + 1] * h + {_MINHASH_B_SQL}[s + 1])
                  % {dedup.MINHASH_PRIME}))) AS mh
  FROM based
),
bands AS (
  SELECT doc_id,
         i - 1 AS band_idx,
         md5(CAST(mh[(i-1)*4 + 1] AS VARCHAR) || '_' ||
             CAST(mh[(i-1)*4 + 2] AS VARCHAR) || '_' ||
             CAST(mh[(i-1)*4 + 3] AS VARCHAR) || '_' ||
             CAST(mh[(i-1)*4 + 4] AS VARCHAR)) AS band_hash
  FROM sigs, (SELECT unnest(generate_series(1, 4)) AS i)
)
"""


def _minhash_sql() -> str:
    return (
        _DOCS_CTE
        + _MINHASH_SIG_SQL
        + """
, cand AS (
  SELECT DISTINCT a.doc_id AS a_doc_id, b.doc_id AS b_doc_id
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
)
SELECT c.a_doc_id, c.b_doc_id,
       round(CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
         / CAST(len(list_distinct(list_concat(da.sh, db.sh))) AS DOUBLE), 6) AS jaccard
FROM cand c
JOIN docs_n da ON da.doc_id = c.a_doc_id
JOIN docs_n db ON db.doc_id = c.b_doc_id
WHERE round(CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
        / CAST(len(list_distinct(list_concat(da.sh, db.sh))) AS DOUBLE), 6) >= 0.5
ORDER BY a_doc_id, b_doc_id
"""
    )


register(
    QuerySpec(
        "dedup_minhash_lsh_pairs",
        lambda spark, sf_dir: dedup.minhash_lsh_pairs(_docs(spark, sf_dir)),
        _minhash_sql(),
        doc="MinHash(16)+LSH(4 bands) candidate pairs verified by true "
        "Jaccard — seed-free md5 min-hashing, bit-reproducible in SQL",
        tags=("extension", "dedup"),
    )
)

def _minhash_assign_sql() -> str:
    return (
        _DOCS_CTE
        + _MINHASH_SIG_SQL
        + """
, cand AS (
  SELECT DISTINCT doc_id, keeper_doc_id FROM (
    SELECT doc_id,
           min(doc_id) OVER (PARTITION BY band_idx, band_hash) AS keeper_doc_id
    FROM bands
  ) WHERE doc_id <> keeper_doc_id
),
ver AS (
  SELECT c.doc_id, c.keeper_doc_id,
         round(CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
           / CAST(len(list_distinct(list_concat(da.sh, db.sh))) AS DOUBLE), 6) AS jaccard
  FROM cand c
  JOIN docs_n da ON da.doc_id = c.doc_id
  JOIN docs_n db ON db.doc_id = c.keeper_doc_id
)
SELECT doc_id,
       min(keeper_doc_id) AS keeper_doc_id,
       arg_min(jaccard, keeper_doc_id) AS jaccard
FROM ver WHERE jaccard >= 0.5
GROUP BY doc_id ORDER BY doc_id
"""
    )


register(
    QuerySpec(
        "dedup_minhash_assign",
        lambda spark, sf_dir: dedup.minhash_dedup_assign(_docs(spark, sf_dir)),
        _minhash_assign_sql(),
        doc="MinHash LSH dedup as per-doc keeper assignment (star candidates "
        "within each band bucket -> <=4 verify edges/doc -> linear output; "
        "the scale path vs the quadratic all-pairs report)",
        tags=("extension", "dedup"),
    )
)

register(
    QuerySpec(
        "dedup_simhash_fingerprints",
        lambda spark, sf_dir: dedup.simhash_fingerprints(_docs(spark, sf_dir)),
        _DOCS_CTE
        + """
, toks_x AS (
  SELECT doc_id, unnest(list_distinct(toks)) AS t FROM docs_n
),
hs AS (
  SELECT doc_id, CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) AS h FROM toks_x
),
per_bit AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h // CAST(pow(2, b) AS BIGINT)) % 2 = 1
                  THEN 1 ELSE -1 END) AS s
  FROM hs, (SELECT unnest(generate_series(0, 31)) AS b)
  GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END) AS BIGINT)
         AS simhash
FROM per_bit GROUP BY doc_id ORDER BY doc_id
""",
        doc="32-bit SimHash fingerprints (bit-weighted token md5s) — "
        "linear explode+agg, no pairwise work",
        tags=("extension", "dedup"),
    )
)


register(
    QuerySpec(
        "dedup_embedding_cosine_pairs",
        lambda spark, sf_dir: dedup.embedding_cosine_pairs(_emb(spark, sf_dir)),
        """
WITH corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = 64
),
normed AS (
  SELECT vec_id, e,
         sqrt(list_sum(list_transform(generate_series(1, len(e)),
              i -> e[i] * e[i]))) AS nrm
  FROM corpus
),
planes AS (
  SELECT vec_id AS plane_id, e AS pe FROM corpus WHERE vec_id BETWEEN 1 AND 32
),
bits AS (
  SELECT n.vec_id, p.plane_id,
         CASE WHEN list_sum(list_transform(generate_series(1, len(n.e)),
                   i -> n.e[i] * p.pe[i])) > 0 THEN 1 ELSE 0 END AS bit
  FROM normed n, planes p
),
bands AS (
  SELECT vec_id, CAST((plane_id - 1) // 8 AS INTEGER) AS band_idx,
         CAST(sum(bit * CAST(pow(2, (plane_id - 1) % 8) AS BIGINT)) AS INTEGER)
           AS band_sig
  FROM bits GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.vec_id AS a_vec_id, b.vec_id AS b_vec_id
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
   AND a.vec_id < b.vec_id
)
SELECT a_vec_id, b_vec_id, cos_sim FROM (
  SELECT c.a_vec_id, c.b_vec_id,
         round(list_sum(list_transform(generate_series(1, len(na.e)),
               i -> na.e[i] * nb.e[i])) / (na.nrm * nb.nrm), 6) AS cos_sim
  FROM cand c
  JOIN normed na ON na.vec_id = c.a_vec_id
  JOIN normed nb ON nb.vec_id = c.b_vec_id
)
WHERE cos_sim >= 0.4
ORDER BY a_vec_id, b_vec_id
""",
        doc="Embedding-cosine near-dup pairs: banded hyperplane LSH (4 bands "
        "x 8 sign bits over 32 planes) prunes the O(n^2) pair space to band "
        "collisions; exact cosine verifies (the embedding analog of MinHash LSH)",
        tags=("extension", "dedup", "similarity"),
    )
)


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

_EMB_CTE = """
WITH corpus AS (
  -- ingestion validation, mirroring _emb(): NULL/off-dimension
  -- vectors never reach an index or ranking (r11)
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = 64
),
normed AS (
  SELECT vec_id, e,
         sqrt(list_sum(list_transform(generate_series(1, len(e)),
              i -> e[i] * e[i]))) AS nrm
  FROM corpus
)
"""

register(
    QuerySpec(
        "similarity_cosine_topk",
        lambda spark, sf_dir: similarity.cosine_topk_bruteforce(_emb(spark, sf_dir)),
        _EMB_CTE
        + """
, queries AS (
  SELECT vec_id AS query_vec_id, e AS qe, nrm AS qnorm
  FROM normed WHERE vec_id % 100 = 0
),
scored AS (
  SELECT q.query_vec_id, c.vec_id AS neighbor_vec_id,
         round(list_sum(list_transform(generate_series(1, len(c.e)),
               i -> q.qe[i] * c.e[i])) / (q.qnorm * c.nrm), 6) AS cos_sim
  FROM normed c, queries q
)
SELECT query_vec_id, neighbor_vec_id, cos_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_vec_id
      ORDER BY cos_sim DESC, neighbor_vec_id ASC) AS BIGINT) AS rank
  FROM scored
) WHERE rank <= 5
ORDER BY query_vec_id, rank
""",
        doc="Brute-force cosine top-k ANN baseline: broadcast query set, "
        "embarrassingly parallel scan, deterministic fold + 6dp rounding",
        tags=("extension", "similarity"),
    )
)

register(
    QuerySpec(
        "similarity_lsh_topk",
        lambda spark, sf_dir: similarity.cosine_topk_lsh(_emb(spark, sf_dir)),
        _EMB_CTE
        + """
, planes AS (
  SELECT vec_id AS plane_id, e AS pe FROM corpus
  WHERE vec_id BETWEEN 1 AND 8
),
buckets AS (
  SELECT n.vec_id,
         sum(CASE WHEN list_sum(list_transform(generate_series(1, len(n.e)),
                    i -> n.e[i] * p.pe[i])) > 0
                  THEN CAST(pow(2, p.plane_id - 1) AS INTEGER) ELSE 0 END) AS bucket
  FROM normed n, planes p GROUP BY n.vec_id
),
bucketed AS (
  SELECT n.vec_id, n.e, n.nrm, b.bucket
  FROM normed n JOIN buckets b USING (vec_id)
),
queries AS (
  SELECT vec_id AS query_vec_id, e AS qe, nrm AS qnorm, bucket AS qbucket
  FROM bucketed WHERE vec_id % 100 = 0
),
scored AS (
  SELECT q.query_vec_id, c.vec_id AS neighbor_vec_id,
         round(list_sum(list_transform(generate_series(1, len(c.e)),
               i -> q.qe[i] * c.e[i])) / (q.qnorm * c.nrm), 6) AS cos_sim
  FROM bucketed c JOIN queries q ON c.bucket = q.qbucket
)
SELECT query_vec_id, neighbor_vec_id, cos_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_vec_id
      ORDER BY cos_sim DESC, neighbor_vec_id ASC) AS BIGINT) AS rank
  FROM scored
) WHERE rank <= 5
ORDER BY query_vec_id, rank
""",
        doc="Hyperplane-LSH bucketed ANN: 256 sign-pattern buckets prune the "
        "scan to the query's bucket (the 100TB scale path)",
        tags=("extension", "similarity"),
    )
)


# IVF coarse-quantizer chain (centroids -> cell assignment -> in-cell
# scoring), shared by the top-k oracle and the recall oracle
_IVF_CHAIN_SQL = """
, corpus_l AS (
  -- label IS NOT NULL: a trained coarse quantizer has no NULL cell -
  -- an unlabeled vector may be INDEXED (it still gets assigned to its
  -- nearest real centroid) but must not SPAWN a phantom centroid,
  -- whose NULL cell_id the argmax tie-break orders differently per
  -- engine (Spark ASC = NULLS FIRST, DuckDB = NULLS LAST; r11)
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = 64
    AND label IS NOT NULL
),
exd AS (
  SELECT label, unnest(generate_series(1, len(e))) AS pos, e FROM corpus_l
),
exv AS (
  SELECT label, pos, e[pos] AS v FROM exd
),
per_dim AS (
  SELECT label, pos,
         CAST(sum(CAST(v AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS m
  FROM exv GROUP BY 1, 2
),
cen AS (
  SELECT label AS cell_id, list(m ORDER BY pos) AS c
  FROM per_dim GROUP BY label
),
cscored AS (
  SELECT n.vec_id, n.e, n.nrm, k.cell_id,
         round(list_sum(list_transform(generate_series(1, len(n.e)),
               i -> n.e[i] * k.c[i]))
           / (n.nrm * sqrt(list_sum(list_transform(generate_series(1, len(k.c)),
               i -> k.c[i] * k.c[i])))), 6) AS cscore
  FROM normed n, cen k
),
assigned AS (
  SELECT vec_id, e, nrm, cell_id FROM (
    SELECT *, row_number() OVER (
        PARTITION BY vec_id ORDER BY cscore DESC, cell_id ASC) AS rn
    FROM cscored
  ) WHERE rn = 1
),
queries AS (
  SELECT vec_id AS query_vec_id, e AS qe, nrm AS qnorm, cell_id AS qcell
  FROM assigned WHERE vec_id % 100 = 0
),
scored AS (
  SELECT q.query_vec_id, c.vec_id AS neighbor_vec_id,
         round(list_sum(list_transform(generate_series(1, len(c.e)),
               i -> q.qe[i] * c.e[i])) / (q.qnorm * c.nrm), 6) AS cos_sim
  FROM assigned c JOIN queries q ON c.cell_id = q.qcell
)
"""


register(
    QuerySpec(
        "similarity_ivf_topk",
        lambda spark, sf_dir: similarity.cosine_topk_ivf(_emb(spark, sf_dir)),
        _EMB_CTE
        + _IVF_CHAIN_SQL
        + """
SELECT query_vec_id, neighbor_vec_id, cos_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_vec_id
      ORDER BY cos_sim DESC, neighbor_vec_id ASC) AS BIGINT) AS rank
  FROM scored
) WHERE rank <= 5
ORDER BY query_vec_id, rank
""",
        doc="IVF ANN (nprobe=1): deterministic per-label centroids as the "
        "coarse quantizer, nearest-centroid cell assignment via broadcast "
        "join + window argmax, search restricted to the query's cell — "
        "the inverted-file scale path next to the LSH variant",
        tags=("extension", "similarity", "ivf"),
    )
)


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

register(
    QuerySpec(
        "multimodal_decode_metadata",
        lambda spark, sf_dir: multimodal.decode_metadata(_docs(spark, sf_dir)),
        r"""
WITH d AS (
  SELECT doc_id,
         md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS h
  FROM documents
  -- NULL text carries no media payload: with_payload/_digest_bytes_col
  -- exclude it on the engine side (operators/multimodal.py), so the
  -- payload CTE mirrors the WHERE (r11 dirty-fixture alignment)
  WHERE text IS NOT NULL
),
b AS (
  SELECT doc_id,
         list_transform(generate_series(0, 15),
           i -> CAST('0x' || substr(h, 2*i + 1, 2) AS INTEGER)) AS bytes
  FROM d
)
SELECT doc_id,
       16 AS byte_len,
       bytes[1] AS width,
       bytes[2] AS height,
       1 + bytes[3] % 3 AS channels,
       CAST(list_sum(bytes) AS DOUBLE) / 16.0 AS mean_byte
FROM b ORDER BY doc_id
""",
        doc="Multimodal binary-column plumbing: mapInPandas Arrow-batched "
        "decode stub (deterministic fake; real decoder is the documented "
        "extension point)",
        tags=("extension", "multimodal"),
    )
)

# ---------------------------------------------------------------------------
# analytics extensions beyond the reference surface
# ---------------------------------------------------------------------------


def _qa_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qa with ROLLUP (SURVEY.md §2.F: the natural GROUPING SETS
    extension the reference's MySQL query surface lacks): per-(month,
    agency) counts plus month subtotals plus the grand total in one
    aggregation pass."""
    v = catalog.violations(spark, sf_dir)
    return (
        v.rollup("month", "issuing_agency_name")
        .agg(F.count(F.lit(1)).alias("tickets_count"))
        .select(
            F.coalesce("month", F.lit("<ALL>")).alias("month"),
            F.coalesce("issuing_agency_name", F.lit("<ALL>")).alias(
                "issuing_agency_name"
            ),
            "tickets_count",
        )
        .orderBy("month", "issuing_agency_name")
    )


register(
    QuerySpec(
        "qa_rollup_totals",
        _qa_rollup,
        with_ref_views(
            """
SELECT coalesce(month, '<ALL>') AS month,
       coalesce(issuing_agency_name, '<ALL>') AS issuing_agency_name,
       count(*) AS tickets_count
FROM violations
GROUP BY ROLLUP(month, issuing_agency_name)
ORDER BY 1, 2
"""
        ),
        doc="Qa extended with ROLLUP subtotals/grand total (GROUPING SETS "
        "in one hash-agg pass; reference sql/analysis_queries.sql:5-12)",
        tags=("extension", "aggregation", "rollup"),
    )
)


def _sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows over the events stream (30-min inactivity
    gap) via Spark's native ``session_window`` — the streaming-capable
    sessionization primitive, run here in batch (same operator powers the
    readStream variant). Oracle: classic gaps-and-islands SQL."""
    ev = catalog.base(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_last"),
        )
        .select("user_id", "session_start", "session_last", "n_events")
        .orderBy("user_id", "session_start")
    )


register(
    QuerySpec(
        "sessionize_gap30",
        _sessionize,
        """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
numbered AS (
  SELECT user_id, ts,
         sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_last,
       count(*) AS n_events
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_start
""",
        doc="Per-user 30-min-gap sessionization via native session_window "
        "(the Structured Streaming sessionization operator, batch-checked "
        "against gaps-and-islands SQL)",
        tags=("extension", "streaming", "session-window"),
    )
)


def _json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON handling (the reference's source boundary is
    JSON APIs, SURVEY.md §1.1.4): parse the ``props`` JSON column with
    ``from_json`` and aggregate the typed field per event_type.

    ``from_json`` with a typed ``k BIGINT`` schema is the STRICTEST of
    the three JSON read paths (measured r11): ONLY bare JSON integral
    numbers parse — doubles (12.7, 12.0, 1e3), strings ("12", " 12 "),
    and booleans are all NULL, unlike ``get_json_object().try_cast``
    (integral strings cast) and ``try_variant_get`` (doubles truncate,
    bools map). The twin therefore gates on ``json_type IN
    ('BIGINT','UBIGINT')`` rather than the varchar-regex guard the
    try_cast twins use (ADVICE r10 dirty-fixture alignment)."""
    ev = catalog.base(spark, sf_dir, "events")
    k = F.from_json("props", "k BIGINT").getField("k")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("k_sum"),
            (F.sum("k").cast("double") / F.count("k")).alias("k_avg"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
        .orderBy("event_type")
    )


register(
    QuerySpec(
        "events_json_extract",
        _json_extract,
        """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(k) AS BIGINT) AS k_sum,
       CAST(sum(k) AS DOUBLE) / count(k) AS k_avg,
       min(k) AS k_min,
       max(k) AS k_max
FROM (
  SELECT event_type,
         CASE WHEN json_valid(props)
                   AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
              THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
         END AS k
  FROM events
)
GROUP BY event_type ORDER BY event_type
""",
        doc="from_json typed extraction over the semi-structured props "
        "column + grouped aggregation (the reference's JSON source "
        "boundary as a query-surface operator)",
        tags=("extension", "json"),
    )
)


_PAYLOAD_CTE = r"""
WITH d AS (
  SELECT doc_id,
         md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS h
  FROM documents
  -- NULL text carries no media payload: with_payload/_digest_bytes_col
  -- exclude it on the engine side (operators/multimodal.py), so the
  -- payload CTE mirrors the WHERE (r11 dirty-fixture alignment)
  WHERE text IS NOT NULL
),
b AS (
  SELECT doc_id,
         list_transform(generate_series(0, 15),
           i -> CAST('0x' || substr(h, 2*i + 1, 2) AS INTEGER)) AS bytes
  FROM d
)
"""

register(
    QuerySpec(
        "multimodal_resize_thumbnail",
        lambda spark, sf_dir: multimodal.resize_thumbnail(_docs(spark, sf_dir)),
        _PAYLOAD_CTE
        + """
SELECT doc_id, 2 AS thumb_w, 2 AS thumb_h,
       CAST(bytes[1] + bytes[2] + bytes[3] + bytes[4] AS DOUBLE) / 4.0 AS q00,
       CAST(bytes[5] + bytes[6] + bytes[7] + bytes[8] AS DOUBLE) / 4.0 AS q01,
       CAST(bytes[9] + bytes[10] + bytes[11] + bytes[12] AS DOUBLE) / 4.0 AS q10,
       CAST(bytes[13] + bytes[14] + bytes[15] + bytes[16] AS DOUBLE) / 4.0 AS q11
FROM b ORDER BY doc_id
""",
        doc="Image-resize plumbing: mapInPandas Arrow-batched 2x2 thumbnail "
        "stub (quadrant byte means; PIL resize is the documented extension "
        "point)",
        tags=("extension", "multimodal"),
    )
)

register(
    QuerySpec(
        "multimodal_frame_sample",
        lambda spark, sf_dir: multimodal.frame_sample(_docs(spark, sf_dir)),
        _PAYLOAD_CTE
        + """
, f AS (
  SELECT doc_id, bytes, 8 + bytes[1] % 8 AS n_frames FROM b
),
x AS (
  SELECT doc_id, bytes, n_frames,
         unnest(generate_series(0, n_frames - 1, 3)) AS i
  FROM f
)
SELECT doc_id,
       CAST(i AS INTEGER) AS frame_idx,
       CAST(n_frames AS INTEGER) AS n_frames,
       bytes[CAST(i % 16 AS INTEGER) + 1] AS frame_byte
FROM x ORDER BY doc_id, frame_idx
""",
        doc="Video frame-sampling plumbing: row-expanding mapInPandas stub "
        "(1 doc -> ceil(n_frames/3) frame rows; ffmpeg keyframe extraction "
        "is the documented extension point)",
        tags=("extension", "multimodal"),
    )
)


# ---------------------------------------------------------------------------
# exact percentile report (sort-based, interpolated)
# ---------------------------------------------------------------------------


def _value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated p50/p90/p99 of event value per type. Spark's
    ``percentile`` is the exact sort-based aggregate (not the t-digest
    approx): at 100 TB one uses approx_percentile, but the exact variant
    is the verifiable baseline, and its interpolation arithmetic matches
    DuckDB's quantile_cont at 6 dp (empirically bit-equal here)."""
    ev = catalog.base(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50_r6"),
            F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90_r6"),
            F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99_r6"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


register(
    QuerySpec(
        "events_value_percentiles",
        _value_percentiles,
        """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50_r6,
       round(quantile_cont(value, 0.9), 6) AS p90_r6,
       round(quantile_cont(value, 0.99), 6) AS p99_r6,
       count(*) AS n_events
FROM events GROUP BY event_type ORDER BY event_type
""",
        doc="Exact interpolated percentile report (p50/p90/p99 of event "
        "value per type) — the verifiable baseline for approx_percentile "
        "at scale",
        tags=("extension", "analytics"),
    )
)


# ---------------------------------------------------------------------------
# ANN quality measurement: LSH recall vs the exact baseline
# ---------------------------------------------------------------------------


def _recall_report(
    exact: DataFrame, approx: DataFrame, approx_name: str
) -> DataFrame:
    """One-row recall report ``(n_exact_pairs, <approx_name>,
    n_matched, recall_r6)``: three one-row aggregates cross-joined as
    1-row BROADCAST combines (allowlisted BNLJs).

    Shape note (r14, measured): this is deliberately NOT a fused
    single join — the three independent broadcast subtrees (exact
    count / approx count / matched count) are materialized as
    CONCURRENT broadcast-exchange futures, so the wall-clock is
    max(subtree), not sum(subtree) (guide §2.6, overlap independent
    work). A fused full-outer/left-join single-pass variant was built
    and measured 1.5-2x SLOWER on similarity_pq_recall (3.65 s →
    7.29 s isolated median) because it serializes the exact and
    approx pipelines behind a join barrier; the duplicated bounded
    subtree evaluation is cheaper than the lost concurrency."""
    matched = exact.join(approx, ["query_vec_id", "neighbor_vec_id"])
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    n_a = approx.agg(F.count(F.lit(1)).alias(approx_name))
    n_match = matched.agg(F.count(F.lit(1)).alias("n_matched"))
    return (
        n_exact.crossJoin(F.broadcast(n_a))
        .crossJoin(F.broadcast(n_match))
        .select(
            "n_exact_pairs",
            approx_name,
            "n_matched",
            F.round(
                F.try_divide(
                    F.col("n_matched").cast("double"),
                    F.col("n_exact_pairs"),
                ),
                6,
            ).alias("recall_r6"),
        )
    )


def _lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the LSH-bucketed ANN against the brute-force exact
    baseline — the measurement that justifies (or vetoes) the bucketed
    scale path. One fused aggregate (``_recall_report``); the only
    non-integer output is one division rounded to 6 dp."""
    emb = _emb(spark, sf_dir)
    exact = similarity.cosine_topk_bruteforce(emb).select(
        "query_vec_id", "neighbor_vec_id"
    )
    lsh = similarity.cosine_topk_lsh(emb).select(
        "query_vec_id", "neighbor_vec_id"
    )
    return _recall_report(exact, lsh, "n_lsh_pairs")


register(
    QuerySpec(
        "similarity_lsh_recall",
        _lsh_recall,
        _EMB_CTE
        + """
, bq AS (
  SELECT vec_id AS query_vec_id, e AS qe, nrm AS qnorm
  FROM normed WHERE vec_id % 100 = 0
),
bscored AS (
  SELECT q.query_vec_id, c.vec_id AS neighbor_vec_id,
         round(list_sum(list_transform(generate_series(1, len(c.e)),
               i -> q.qe[i] * c.e[i])) / (q.qnorm * c.nrm), 6) AS cos_sim
  FROM normed c, bq q
),
exact AS (
  SELECT query_vec_id, neighbor_vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_vec_id
        ORDER BY cos_sim DESC, neighbor_vec_id ASC) AS rank
    FROM bscored
  ) WHERE rank <= 5
),
planes8 AS (
  SELECT vec_id AS plane_id, e AS pe FROM corpus WHERE vec_id BETWEEN 1 AND 8
),
lbuckets AS (
  SELECT n.vec_id,
         sum(CASE WHEN list_sum(list_transform(generate_series(1, len(n.e)),
                    i -> n.e[i] * p.pe[i])) > 0
                  THEN CAST(pow(2, p.plane_id - 1) AS INTEGER) ELSE 0 END) AS bucket
  FROM normed n, planes8 p GROUP BY n.vec_id
),
lbucketed AS (
  SELECT n.vec_id, n.e, n.nrm, b.bucket
  FROM normed n JOIN lbuckets b USING (vec_id)
),
lq AS (
  SELECT vec_id AS query_vec_id, e AS qe, nrm AS qnorm, bucket AS qbucket
  FROM lbucketed WHERE vec_id % 100 = 0
),
lscored AS (
  SELECT q.query_vec_id, c.vec_id AS neighbor_vec_id,
         round(list_sum(list_transform(generate_series(1, len(c.e)),
               i -> q.qe[i] * c.e[i])) / (q.qnorm * c.nrm), 6) AS cos_sim
  FROM lbucketed c JOIN lq q ON c.bucket = q.qbucket
),
lsh AS (
  SELECT query_vec_id, neighbor_vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_vec_id
        ORDER BY cos_sim DESC, neighbor_vec_id ASC) AS rank
    FROM lscored
  ) WHERE rank <= 5
),
m AS (
  SELECT count(*) AS n_matched
  FROM exact e JOIN lsh l USING (query_vec_id, neighbor_vec_id)
)
SELECT CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact_pairs,
       CAST((SELECT count(*) FROM lsh) AS BIGINT) AS n_lsh_pairs,
       CAST(m.n_matched AS BIGINT) AS n_matched,
       round(CAST(m.n_matched AS DOUBLE)
             / (SELECT count(*) FROM exact), 6) AS recall_r6
FROM m
""",
        doc="Recall@5 of LSH-bucketed ANN vs the brute-force exact "
        "baseline — the quality metric justifying the bucketed scale "
        "path (documented recall trade, now measured)",
        tags=("extension", "similarity", "quality"),
    )
)


# ---------------------------------------------------------------------------
# transitive dup clusters: connected components of the band graph
# ---------------------------------------------------------------------------


register(
    QuerySpec(
        "dedup_components",
        lambda spark, sf_dir: dedup.dedup_components(_docs(spark, sf_dir)),
        (_DOCS_CTE + _MINHASH_SIG_SQL).replace("WITH ", "WITH RECURSIVE ", 1)
        + """
, bucket_min AS (
  SELECT band_idx, band_hash, min(doc_id) AS root
  FROM bands GROUP BY 1, 2
),
star AS (
  SELECT DISTINCT b.doc_id AS a, m.root AS b
  FROM bands b JOIN bucket_min m USING (band_idx, band_hash)
  WHERE b.doc_id <> m.root
),
sym AS (SELECT a, b FROM star UNION SELECT b AS a, a AS b FROM star),
reach AS (
  SELECT a AS x, a AS y FROM (SELECT DISTINCT a FROM sym)
  UNION
  SELECT r.x, e.b AS y FROM reach r JOIN sym e ON r.y = e.a
),
comp AS (SELECT x AS doc_id, min(y) AS component_id FROM reach GROUP BY x)
SELECT component_id, count(*) AS n_members,
       max(doc_id) AS max_doc_id
FROM comp GROUP BY component_id ORDER BY component_id
""",
        doc="TRANSITIVE dup clusters: connected components of the MinHash "
        "band graph — linear star edges per bucket, iterative min-label "
        "propagation with localCheckpoint lineage truncation and a "
        "monotone-scalar convergence test; oracle = DuckDB RECURSIVE CTE "
        "transitive closure (independent fixpoint computation)",
        tags=("extension", "dedup", "iterative"),
    )
)


# ---------------------------------------------------------------------------
# semantic dup clusters: embedding LSH pairs -> connected components
# ---------------------------------------------------------------------------


def _embedding_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) dup CLUSTERS: CAPPED verified
    hyperplane-LSH near-dup edges (≤ EMB_BUCKET_CAP anchors per band
    bucket — linear in duplication factor, where the former all-pairs
    edge list was quadratic and died at the r7 100x copy-blowup stress
    point with 75 GB of spill) closed into transitive components by the
    generic distributed hook+pointer-jump operator (operators/dedup.py::
    components_from_edges). ``overflow_buckets`` is the truncation-
    accounting column: how many band buckets actually LOST candidate
    pairs (population > cap + 1; at exactly cap+1 every pair still
    touches an anchor) — the capped audit SAYS when and where it
    capped. Oracle mirrors the cap: same per-bucket vec_id ranking,
    same anchor join, same > cap+1 accounting, RECURSIVE CTE closure."""
    edges, overflow = dedup.embedding_capped_pair_edges(_emb(spark, sf_dir))
    labels = dedup.components_from_edges(
        edges.select(F.col("a_vec_id").alias("a"), F.col("b_vec_id").alias("b"))
    )
    return (
        labels.groupBy(F.col("label").alias("component_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.max("node").cast("long").alias("max_vec_id"),
        )
        .crossJoin(F.broadcast(overflow))
        .orderBy("component_id")
    )


register(
    QuerySpec(
        "embedding_dup_components",
        _embedding_components,
        """
WITH RECURSIVE corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = 64
),
normed AS (
  SELECT vec_id, e,
         sqrt(list_sum(list_transform(generate_series(1, len(e)),
              i -> e[i] * e[i]))) AS nrm
  FROM corpus
),
planes AS (
  SELECT vec_id AS plane_id, e AS pe FROM corpus WHERE vec_id BETWEEN 1 AND 32
),
bits AS (
  SELECT n.vec_id, p.plane_id,
         CASE WHEN list_sum(list_transform(generate_series(1, len(n.e)),
                   i -> n.e[i] * p.pe[i])) > 0 THEN 1 ELSE 0 END AS bit
  FROM normed n, planes p
),
bands AS (
  SELECT vec_id, CAST((plane_id - 1) // 8 AS INTEGER) AS band_idx,
         CAST(sum(bit * CAST(pow(2, (plane_id - 1) % 8) AS BIGINT)) AS INTEGER)
           AS band_sig
  FROM bits GROUP BY 1, 2
),
ranked AS (
  SELECT vec_id, band_idx, band_sig,
         row_number() OVER (PARTITION BY band_idx, band_sig
                            ORDER BY vec_id) AS rnk
  FROM bands
),
cand AS (
  SELECT DISTINCT a.vec_id AS a_vec_id, m.vec_id AS b_vec_id
  FROM ranked a JOIN ranked m
    ON a.band_idx = m.band_idx AND a.band_sig = m.band_sig
   AND a.vec_id < m.vec_id
  WHERE a.rnk <= 8
),
overflow AS (
  -- COALESCE mirrors the engine (operators/dedup.py): sum over zero
  -- buckets reads 0, not NULL, so the no-truncation contract holds on
  -- an empty input too
  SELECT CAST(coalesce(sum(CASE WHEN n > 9 THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS overflow_buckets
  FROM (SELECT band_idx, band_sig, count(*) AS n
        FROM bands GROUP BY 1, 2)
),
edges AS (
  SELECT a_vec_id AS a, b_vec_id AS b FROM (
    SELECT c.a_vec_id, c.b_vec_id,
           round(list_sum(list_transform(generate_series(1, len(na.e)),
                 i -> na.e[i] * nb.e[i])) / (na.nrm * nb.nrm), 6) AS cos_sim
    FROM cand c
    JOIN normed na ON na.vec_id = c.a_vec_id
    JOIN normed nb ON nb.vec_id = c.b_vec_id
  )
  WHERE cos_sim >= 0.4
),
sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
reach AS (
  SELECT a AS x, a AS y FROM (SELECT DISTINCT a FROM sym)
  UNION
  SELECT r.x, e.b AS y FROM reach r JOIN sym e ON r.y = e.a
),
comp AS (SELECT x AS node, min(y) AS component_id FROM reach GROUP BY x)
SELECT component_id,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(max(node) AS BIGINT) AS max_vec_id,
       o.overflow_buckets
FROM comp, overflow o GROUP BY component_id, o.overflow_buckets
ORDER BY component_id
""",
        doc="semantic dup clusters: CAPPED hyperplane-LSH verified edges "
        "(<=8 anchors per band bucket — linear in duplication factor) "
        "closed into transitive components by the distributed "
        "hook+pointer-jump operator, with an overflow_buckets truncation-"
        "accounting column; oracle mirrors the cap + RECURSIVE CTE closure",
        tags=("extension", "dedup", "embedding", "iterative"),
    )
)


register(
    QuerySpec(
        "multimodal_decode_arrow",
        lambda spark, sf_dir: multimodal.decode_metadata_arrow(
            _docs(spark, sf_dir)
        ),
        r"""
WITH d AS (
  SELECT doc_id,
         md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS h
  FROM documents
  -- NULL text carries no media payload: with_payload/_digest_bytes_col
  -- exclude it on the engine side (operators/multimodal.py), so the
  -- payload CTE mirrors the WHERE (r11 dirty-fixture alignment)
  WHERE text IS NOT NULL
),
b AS (
  SELECT doc_id,
         list_transform(generate_series(0, 15),
           i -> CAST('0x' || substr(h, 2*i + 1, 2) AS INTEGER)) AS bytes
  FROM d
)
SELECT doc_id,
       16 AS byte_len,
       bytes[1] AS width,
       bytes[2] AS height,
       1 + bytes[3] % 3 AS channels,
       CAST(list_sum(bytes) AS DOUBLE) / 16.0 AS mean_byte
FROM b ORDER BY doc_id
""",
        doc="mapInArrow twin of the multimodal decode: RecordBatch in / "
        "RecordBatch out, no Arrow->pandas materialization — the "
        "leanest Python hop for binary payload processing",
        tags=("extension", "multimodal", "arrow"),
    )
)


# ---------------------------------------------------------------------------
# REAL uncompressed-codec decode (round 4): BMP + WAV without any libs
# ---------------------------------------------------------------------------


def _bmp_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = multimodal.decode_bmp_real(_docs(spark, sf_dir))
    return d.select(
        "doc_id",
        "file_size",
        "width",
        "height",
        "bpp",
        F.round("mean_pixel", 6).alias("mean_pixel"),
    )


register(
    QuerySpec(
        "multimodal_bmp_decode_real",
        _bmp_decode_real,
        r"""
WITH d AS (
  SELECT doc_id,
         md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS h
  FROM documents
  -- NULL text carries no media payload: with_payload/_digest_bytes_col
  -- exclude it on the engine side (operators/multimodal.py), so the
  -- payload CTE mirrors the WHERE (r11 dirty-fixture alignment)
  WHERE text IS NOT NULL
),
b AS (
  SELECT doc_id,
         list_transform(generate_series(0, 15),
           i -> CAST('0x' || substr(h, 2*i + 1, 2) AS INTEGER)) AS bytes
  FROM d
)
SELECT doc_id,
       246 AS file_size,
       8 AS width,
       8 AS height,
       24 AS bpp,
       round(CAST(list_sum(bytes) AS DOUBLE) / 16.0, 6) AS mean_pixel
FROM b ORDER BY doc_id
""",
        doc="REAL 24bpp BMP decode (no codec libs: struct-parsed "
        "BITMAPFILE/INFO headers + numpy pixel mean over the actual "
        "byte array); pixels tile the text digest, so the oracle "
        "recomputes the stats analytically — 192 bytes = 12 exact "
        "digest tiles makes mean_pixel == mean(digest)",
        tags=("extension", "multimodal", "real-codec"),
    )
)


def _wav_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = multimodal.decode_wav_real(_docs(spark, sf_dir))
    return d.select(
        "doc_id",
        "sample_rate",
        "n_samples",
        F.round("rms", 6).alias("rms"),
    )


register(
    QuerySpec(
        "multimodal_wav_decode_real",
        _wav_decode_real,
        r"""
WITH d AS (
  SELECT doc_id,
         md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS h
  FROM documents
  -- NULL text carries no media payload: with_payload/_digest_bytes_col
  -- exclude it on the engine side (operators/multimodal.py), so the
  -- payload CTE mirrors the WHERE (r11 dirty-fixture alignment)
  WHERE text IS NOT NULL
),
b AS (
  SELECT doc_id,
         list_transform(generate_series(0, 15),
           i -> CAST('0x' || substr(h, 2*i + 1, 2) AS INTEGER)) AS bytes
  FROM d
)
SELECT doc_id,
       16000 AS sample_rate,
       64 AS n_samples,
       round(sqrt(list_sum(list_transform(bytes,
               x -> pow(x * 256.0 - 32768.0, 2))) / 16.0), 6) AS rms
FROM b ORDER BY doc_id
""",
        doc="REAL RIFF/PCM16 WAV decode (no codec libs: struct-parsed "
        "RIFF/fmt/data chunks + numpy RMS over the actual int16 "
        "samples); 64 samples = 4 exact digest tiles makes the RMS "
        "analytically recomputable by the oracle",
        tags=("extension", "multimodal", "real-codec"),
    )
)


def _y4m_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = multimodal.decode_y4m_real(_docs(spark, sf_dir))
    return d.select(
        "doc_id",
        "width",
        "height",
        "n_frames",
        "frame_idx",
        F.round("mean_luma", 6).alias("mean_luma"),
    )


register(
    QuerySpec(
        "multimodal_y4m_decode_real",
        _y4m_decode_real,
        r"""
WITH d AS (
  SELECT doc_id,
         md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS h
  FROM documents
  -- NULL text carries no media payload: with_payload/_digest_bytes_col
  -- exclude it on the engine side (operators/multimodal.py), so the
  -- payload CTE mirrors the WHERE (r11 dirty-fixture alignment)
  WHERE text IS NOT NULL
),
b AS (
  SELECT doc_id,
         list_transform(generate_series(0, 15),
           i -> CAST('0x' || substr(h, 2*i + 1, 2) AS INTEGER)) AS bytes
  FROM d
),
frames AS (
  SELECT doc_id, bytes, unnest([0, 2]) AS frame_idx FROM b
)
SELECT doc_id,
       8 AS width,
       8 AS height,
       4 AS n_frames,
       frame_idx,
       -- frame k luma bytes tile (digest[(i+3k) mod 16] + k) mod 256
       -- over 64 pixels = 4 exact tiles, so the mean reduces to the
       -- 16-byte digest mean after the same rotation+offset transform
       round(CAST(list_sum(list_transform(bytes,
               x -> (x + frame_idx) % 256)) AS DOUBLE) / 16.0, 6)
         AS mean_luma
FROM frames ORDER BY doc_id, frame_idx
""",
        doc="REAL YUV4MPEG2 (uncompressed video) decode: stream-header "
        "tag parse, FRAME-marker walk, numpy luma mean per sampled "
        "frame (stride 2) — ffmpeg-free frame sampling; frame bytes "
        "tile a rotated+offset digest, so the oracle recomputes each "
        "sampled frame's mean analytically (rotation preserves the "
        "mean; the +k offset wraps mod 256)",
        tags=("extension", "multimodal", "real-codec"),
    )
)


def _ahash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup over the REAL BMP decode: aHash each
    decoded image (integer-exact mean test), block candidate pairs by
    4×16-bit Hamming-LSH band collisions — the Hamming-space twin of
    MinHash banding, never an all-pairs scan — and verify each candidate
    with the exact Hamming distance (bit_count of per-band XOR), flagged
    near-dup at the classic ≤8/64-bit threshold.

    Plan: one Arrow-batched decode pass (persisted — the self-join and
    the two verify join-backs must not re-run the Python decode),
    posexplode to (band_idx, band_val) → equi-join on uniform 16-bit
    band keys → distinct pair → join bands back → exact Hamming. At
    100 TB the band join shuffles only the 10-byte fingerprints, and
    candidate volume is Σ bucket², not corpus².
    """
    per_doc = caching.persist_tracked(
        multimodal.ahash_bands(_docs(spark, sf_dir))
    )
    bands = per_doc.select(
        "doc_id",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias(
            "band_idx", "band_val"
        ),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val")),
        )
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    wa = per_doc.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"b{k}").alias(f"a_b{k}") for k in range(4)],
    )
    wb = per_doc.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"b{k}").alias(f"b_b{k}") for k in range(4)],
    )
    hamming = sum(
        F.bit_count(
            F.col(f"a_b{k}").bitwiseXOR(F.col(f"b_b{k}")).cast("long")
        )
        for k in range(4)
    ).cast("int")
    return (
        cand.join(wa, "doc_a")
        .join(wb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            hamming.alias("hamming"),
            F.when(hamming <= 8, F.lit(1)).otherwise(F.lit(0)).alias(
                "is_near_dup"
            ),
        )
        .orderBy("doc_a", "doc_b")
    )


register(
    QuerySpec(
        "multimodal_ahash_near_dup",
        _ahash_near_dup,
        r"""
WITH d AS (
  SELECT doc_id,
         md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS h
  FROM documents
  -- NULL text carries no media payload: with_payload/_digest_bytes_col
  -- exclude it on the engine side (operators/multimodal.py), so the
  -- payload CTE mirrors the WHERE (r11 dirty-fixture alignment)
  WHERE text IS NOT NULL
),
b AS (
  SELECT doc_id,
         list_transform(generate_series(0, 15),
           i -> CAST('0x' || substr(h, 2*i + 1, 2) AS INTEGER)) AS bytes
  FROM d
),
-- textured pixel-buffer byte i = (digest[i%16] + i//16) % 256; gray is
-- the x3 channel sum of file-order pixel p (bytes 3p, 3p+1, 3p+2)
g AS (
  SELECT doc_id,
         list_transform(generate_series(0, 63),
           p -> (bytes[(3*p) % 16 + 1] + (3*p) // 16) % 256
              + (bytes[(3*p+1) % 16 + 1] + (3*p+1) // 16) % 256
              + (bytes[(3*p+2) % 16 + 1] + (3*p+2) // 16) % 256) AS g3
  FROM b
),
t AS (
  SELECT doc_id, g3, list_sum(g3) AS total FROM g
),
bands AS (
  SELECT doc_id,
         list_transform(generate_series(0, 3), k ->
           list_sum(list_transform(generate_series(0, 15), j ->
             CASE WHEN 64 * g3[16*k + j + 1] >= total
                  THEN 1 << (15 - j) ELSE 0 END))) AS bv
  FROM t
),
w AS (
  SELECT doc_id, bv[1] AS b0, bv[2] AS b1, bv[3] AS b2, bv[4] AS b3
  FROM bands
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
          + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
         AS INTEGER) AS hamming,
       CASE WHEN bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
               + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
              <= 8
            THEN 1 ELSE 0 END AS is_near_dup
FROM w a JOIN w b
  ON a.doc_id < b.doc_id
 AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
ORDER BY doc_a, doc_b
""",
        doc="perceptual-hash (aHash) image dedup over the real BMP "
        "decode: integer-exact 64-bit average hash, 4x16-bit "
        "Hamming-LSH band blocking (the image twin of MinHash "
        "banding), exact bit_count(xor) Hamming verify with the "
        "classic <=8-bit near-dup flag",
        tags=("extension", "multimodal", "dedup", "real-codec"),
    )
)


# ---------------------------------------------------------------------------
# incremental signature maintenance: sketch the delta, not the corpus
# ---------------------------------------------------------------------------


def _incremental_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB dedup-index maintenance path: when a delta batch of
    documents arrives, only the DELTA is re-sketched; the stored base
    signature table is reused as-is and the keeper assignment runs over
    base ∪ delta. Per-doc MinHash signatures are pure functions of the
    text, so the union is bit-identical to a full re-sketch — which is
    exactly what the oracle checks: this query's result must hash-match
    the FULL-recompute assignment SQL (same oracle as
    ``dedup_minhash_assign``).

    Here the "stored base" is simulated by sketching the two disjoint
    slices separately (delta = every 10th doc); in production the base
    half is a parquet/Delta signature table read back from storage.
    """
    docs = _docs(spark, sf_dir)
    base = docs.where(F.col("doc_id") % 10 != 0)
    delta = docs.where(F.col("doc_id") % 10 == 0)
    sig_cols = ["doc_id", "sh", "bands"]
    merged = caching.persist_tracked(
        dedup.spread_by_doc(
            dedup.minhash_signatures(base)
            .select(*sig_cols)
            .unionByName(dedup.minhash_signatures(delta).select(*sig_cols))
        )
    )
    return dedup.minhash_assign_from_signatures(merged)


register(
    QuerySpec(
        "dedup_incremental_signatures",
        _incremental_assign,
        _minhash_assign_sql(),
        doc="incremental dedup-index maintenance: delta-only re-sketch, "
        "stored-base signature reuse, keeper assignment over the union "
        "— oracle-checked equal to the full recompute",
        tags=("extension", "dedup", "incremental"),
    )
)


def _ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVF (nprobe=1) ANN against the brute-force exact
    baseline — the same measurement ``similarity_lsh_recall`` publishes
    for the hyperplane variant, closing the loop on BOTH bucketed scale
    paths: nprobe=1 trades recall for a single-cell search, and this is
    the number that decides whether to raise nprobe."""
    emb = _emb(spark, sf_dir)
    exact = similarity.cosine_topk_bruteforce(emb).select(
        "query_vec_id", "neighbor_vec_id"
    )
    ivf = similarity.cosine_topk_ivf(emb).select(
        "query_vec_id", "neighbor_vec_id"
    )
    return _recall_report(exact, ivf, "n_ivf_pairs")


register(
    QuerySpec(
        "similarity_ivf_recall",
        _ivf_recall,
        _EMB_CTE
        + _IVF_CHAIN_SQL
        + """
, ivf5 AS (
  SELECT query_vec_id, neighbor_vec_id FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_vec_id
        ORDER BY cos_sim DESC, neighbor_vec_id ASC) AS rank
    FROM scored
  ) WHERE rank <= 5
),
bq AS (
  SELECT vec_id AS query_vec_id, e AS qe, nrm AS qnorm
  FROM normed WHERE vec_id % 100 = 0
),
bscored AS (
  SELECT q.query_vec_id, c.vec_id AS neighbor_vec_id,
         round(list_sum(list_transform(generate_series(1, len(c.e)),
               i -> q.qe[i] * c.e[i])) / (q.qnorm * c.nrm), 6) AS cos_sim
  FROM normed c, bq q
),
exact AS (
  SELECT query_vec_id, neighbor_vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_vec_id
        ORDER BY cos_sim DESC, neighbor_vec_id ASC) AS rank
    FROM bscored
  ) WHERE rank <= 5
),
m AS (
  SELECT count(*) AS n_matched
  FROM exact JOIN ivf5 USING (query_vec_id, neighbor_vec_id)
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_exact_pairs,
       (SELECT CAST(count(*) AS BIGINT) FROM ivf5) AS n_ivf_pairs,
       (SELECT CAST(n_matched AS BIGINT) FROM m) AS n_matched,
       round(CAST((SELECT n_matched FROM m) AS DOUBLE)
             / (SELECT count(*) FROM exact), 6) AS recall_r6
""",
        doc="recall@5 of the IVF nprobe=1 cell search vs the brute-force "
        "exact baseline — the measured evidence for the inverted-file "
        "scale path (sibling of similarity_lsh_recall)",
        tags=("extension", "similarity", "ivf", "recall"),
    )
)


def _ivf_recall_nprobe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of multi-probe IVF (nprobe=2) vs the brute-force exact
    baseline — the other end of the dial measured by
    ``similarity_ivf_recall`` (nprobe=1): doubling the probed cells
    should close most of the recall gap at 2x the per-query candidate
    cost, and this query is the evidence."""
    emb = _emb(spark, sf_dir)
    exact = similarity.cosine_topk_bruteforce(emb).select(
        "query_vec_id", "neighbor_vec_id"
    )
    ivf2 = similarity.cosine_topk_ivf_multiprobe(emb, nprobe=2).select(
        "query_vec_id", "neighbor_vec_id"
    )
    return _recall_report(exact, ivf2, "n_ivf2_pairs")


register(
    QuerySpec(
        "similarity_ivf_nprobe2_recall",
        _ivf_recall_nprobe2,
        _EMB_CTE
        + _IVF_CHAIN_SQL
        + """
, qcells2 AS (
  SELECT query_vec_id, qe, qnorm, qcell FROM (
    SELECT vec_id AS query_vec_id, e AS qe, nrm AS qnorm,
           cell_id AS qcell,
           row_number() OVER (PARTITION BY vec_id
               ORDER BY cscore DESC, cell_id ASC) AS qrn
    FROM cscored WHERE vec_id % 100 = 0
  ) WHERE qrn <= 2
),
scored2 AS (
  SELECT q.query_vec_id, c.vec_id AS neighbor_vec_id,
         round(list_sum(list_transform(generate_series(1, len(c.e)),
               i -> q.qe[i] * c.e[i])) / (q.qnorm * c.nrm), 6) AS cos_sim
  FROM assigned c JOIN qcells2 q ON c.cell_id = q.qcell
),
ivf5_2 AS (
  SELECT query_vec_id, neighbor_vec_id FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_vec_id
        ORDER BY cos_sim DESC, neighbor_vec_id ASC) AS rank
    FROM scored2
  ) WHERE rank <= 5
),
bq AS (
  SELECT vec_id AS query_vec_id, e AS qe, nrm AS qnorm
  FROM normed WHERE vec_id % 100 = 0
),
bscored AS (
  SELECT q.query_vec_id, c.vec_id AS neighbor_vec_id,
         round(list_sum(list_transform(generate_series(1, len(c.e)),
               i -> q.qe[i] * c.e[i])) / (q.qnorm * c.nrm), 6) AS cos_sim
  FROM normed c, bq q
),
exact AS (
  SELECT query_vec_id, neighbor_vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_vec_id
        ORDER BY cos_sim DESC, neighbor_vec_id ASC) AS rank
    FROM bscored
  ) WHERE rank <= 5
),
m AS (
  SELECT count(*) AS n_matched
  FROM exact JOIN ivf5_2 USING (query_vec_id, neighbor_vec_id)
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_exact_pairs,
       (SELECT CAST(count(*) AS BIGINT) FROM ivf5_2) AS n_ivf2_pairs,
       (SELECT CAST(n_matched AS BIGINT) FROM m) AS n_matched,
       round(CAST((SELECT n_matched FROM m) AS DOUBLE)
             / (SELECT count(*) FROM exact), 6) AS recall_r6
""",
        doc="recall@5 of multi-probe IVF (nprobe=2) vs brute force — "
        "the measured other end of the nprobe dial next to "
        "similarity_ivf_recall's nprobe=1",
        tags=("extension", "similarity", "ivf", "recall"),
    )
)


# ---------------------------------------------------------------------------
# MinHash-LSH candidate-generation recall vs exact Jaccard (query subset)
# ---------------------------------------------------------------------------

_DEDUP_QUERY_MOD = 50


def _minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of MinHash(16)+LSH(4-band) CANDIDATE GENERATION against
    the exact char-3-gram Jaccard ground truth, measured on a bounded
    query subset (``doc_id % 50 = 0``) — the text-dedup twin of
    ``similarity_lsh_recall``/``similarity_ivf_recall``: those measure
    the embedding ANN trade, this measures the banded-MinHash trade the
    whole dedup family rides on. Ground truth is exact Jaccard of the
    query docs against the corpus via POSTING-LIST INTERSECTION —
    explode the distinct shingles, equi-join on the shingle against the
    broadcast query posting list, count matches per (doc, query) — one
    linear pass over corpus shingles instead of a crossJoin that
    re-scans both shingle arrays per (doc, query) pair (measured 8× on
    this query; the same plan shape survives 100 TB because nothing is
    quadratic in the corpus). The ≥0.5 threshold is cross-multiplied to
    exact integers (``3·|∩| ≥ |a|+|b|``, since ``|∪| = |a|+|b|−|∩|``) —
    no rounded float boundary on either engine. Candidates are the
    band-collision pairs touching the query set, BEFORE Jaccard
    verification (post-verify pairs equal truth-intersect-candidates by
    construction, so verifying first would make recall trivially 1)."""
    per_doc = dedup.persist_tracked(
        dedup.spread_by_doc(
            dedup.minhash_signatures(_docs(spark, sf_dir)).select(
                "doc_id", "sh", "bands"
            )
        )
    )
    qset = per_doc.where(F.col("doc_id") % _DEDUP_QUERY_MOD == 0).select(
        F.col("doc_id").alias("q_doc_id"), F.col("sh").alias("q_sh")
    )
    sizes = per_doc.select("doc_id", F.size("sh").alias("n"))
    q_post = qset.select("q_doc_id", F.explode("q_sh").alias("x"))
    c_post = per_doc.select("doc_id", F.explode("sh").alias("x"))
    inter = (
        c_post.join(F.broadcast(q_post), "x")
        .where(F.col("doc_id") != F.col("q_doc_id"))
        .groupBy("doc_id", "q_doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = (
        inter.join(sizes, "doc_id")
        .join(
            F.broadcast(
                sizes.select(
                    F.col("doc_id").alias("q_doc_id"),
                    F.col("n").alias("qn"),
                )
            ),
            "q_doc_id",
        )
        .where(F.lit(3) * F.col("c") >= F.col("n") + F.col("qn"))
        .select(
            F.least("doc_id", "q_doc_id").alias("a"),
            F.greatest("doc_id", "q_doc_id").alias("b"),
        )
        .distinct()
    )
    bands = per_doc.select(
        "doc_id", F.posexplode("bands").alias("band_idx", "band_hash")
    )
    qbands = bands.join(
        F.broadcast(qset.select(F.col("q_doc_id").alias("doc_id"))),
        "doc_id",
    ).select(
        F.col("doc_id").alias("q_doc_id"), "band_idx", "band_hash"
    )
    cand = (
        bands.join(F.broadcast(qbands), ["band_idx", "band_hash"])
        .where(F.col("doc_id") != F.col("q_doc_id"))
        .select(
            F.least("doc_id", "q_doc_id").alias("a"),
            F.greatest("doc_id", "q_doc_id").alias("b"),
        )
        .distinct()
    )
    # ONE aggregate over a full-outer join of the two bounded pair sets
    # (r14, guide §1.2/§2.4): the former three separate one-row
    # aggregates re-evaluated the unpersisted ground-truth intersection
    # and band-candidate subtrees twice each.
    return (
        exact.withColumn("_tm", F.lit(1))
        .join(
            cand.withColumn("_cm", F.lit(1)), ["a", "b"], "full_outer"
        )
        .agg(
            F.count("_tm").alias("n_true_pairs"),
            F.count("_cm").alias("n_candidate_pairs"),
            F.count(
                F.when(
                    F.col("_tm").isNotNull() & F.col("_cm").isNotNull(), 1
                )
            ).alias("n_matched"),
        )
        .select(
            "n_true_pairs",
            "n_candidate_pairs",
            "n_matched",
            F.round(
                F.try_divide(
                    F.col("n_matched").cast("double"),
                    F.col("n_true_pairs"),
                ),
                6,
            ).alias("recall_r6"),
        )
    )


register(
    QuerySpec(
        "dedup_minhash_recall",
        _minhash_recall,
        _DOCS_CTE
        + _MINHASH_SIG_SQL
        + f"""
, per_doc AS (
  SELECT s.doc_id, d.sh FROM sigs s JOIN docs_n d USING (doc_id)
),
qset AS (
  SELECT doc_id AS q_doc_id, sh AS q_sh FROM per_doc
  WHERE doc_id % {_DEDUP_QUERY_MOD} = 0
),
exact AS (
  SELECT DISTINCT least(p.doc_id, q.q_doc_id) AS a,
         greatest(p.doc_id, q.q_doc_id) AS b
  FROM per_doc p, qset q
  WHERE p.doc_id <> q.q_doc_id
    -- jaccard >= 0.5 cross-multiplied: 3|∩| >= |a|+|b| (sh is distinct,
    -- so |∪| = |a|+|b|-|∩|) — no rounded float boundary
    AND 3 * len(list_intersect(p.sh, q.q_sh)) >= len(p.sh) + len(q.q_sh)
),
qbands AS (
  SELECT b.doc_id AS q_doc_id, b.band_idx, b.band_hash
  FROM bands b JOIN qset q ON b.doc_id = q.q_doc_id
),
cand AS (
  SELECT DISTINCT least(b.doc_id, q.q_doc_id) AS a,
         greatest(b.doc_id, q.q_doc_id) AS b
  FROM bands b JOIN qbands q
    ON b.band_idx = q.band_idx AND b.band_hash = q.band_hash
  WHERE b.doc_id <> q.q_doc_id
),
m AS (SELECT count(*) AS n_matched FROM exact JOIN cand USING (a, b))
SELECT (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_true_pairs,
       (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidate_pairs,
       (SELECT CAST(n_matched AS BIGINT) FROM m) AS n_matched,
       round(CAST((SELECT n_matched FROM m) AS DOUBLE)
             / (SELECT count(*) FROM exact), 6) AS recall_r6
""",
        doc="MinHash-LSH candidate-generation recall vs exact Jaccard "
        "ground truth on a bounded query subset — the text-dedup twin "
        "of the ANN recall audits",
        tags=("extension", "dedup", "recall"),
    )
)


# ---------------------------------------------------------------------------
# MinHash-LSH band-configuration trade-off (round 6)
# ---------------------------------------------------------------------------

# (n_bands, band_width) splits of the 16 minhash values: the S-curve
# dial — more/narrower bands catch lower-similarity pairs (higher
# recall, more candidates); fewer/wider bands sharpen the threshold
_LSH_CONFIGS = ((16, 1), (8, 2), (4, 4), (2, 8))


def _lsh_band_tradeoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH banding S-curve, MEASURED: candidate volume and recall
    (vs the same exact-Jaccard >= 0.5 ground truth as
    ``dedup_minhash_recall``) for four (bands x width) splits of ONE
    16-value MinHash signature — 16x1, 8x2, 4x4 (the production
    config), 2x8. The collision probability at similarity s is
    1-(1-s^w)^b, so width w sets the threshold sharpness and band
    count b the recall; this query turns that formula into measured
    numbers on the corpus, the evidence behind choosing 4x4.

    Scale shape: the signature pass runs ONCE (same persisted table
    all four configs read); the band hashes of ALL FOUR configs are a
    vocabulary of md5 expressions over the in-row ``mh`` array (no
    re-sketch) exploded as one (config, band_idx, band_hash) stream,
    so candidate generation + distinct + truth-marking run as ONE
    bounded query-set broadcast band join keyed by config — r14
    (guide §2.4): the former per-config loop built the identical
    join+distinct subtree TWICE per config (once under the candidate
    count, once under the matched count), eight heavy subtrees for
    four rows; the fused stream computes both counts from one
    left-join against the persisted ground truth. Ground truth is
    computed once. Output is 4 rows."""
    per_doc = dedup.persist_tracked(
        dedup.spread_by_doc(
            dedup.minhash_signatures(_docs(spark, sf_dir)).select(
                "doc_id", "sh", "mh"
            )
        )
    )
    qset = per_doc.where(F.col("doc_id") % _DEDUP_QUERY_MOD == 0).select(
        F.col("doc_id").alias("q_doc_id"), F.col("sh").alias("q_sh")
    )
    sizes = per_doc.select("doc_id", F.size("sh").alias("n"))
    q_post = qset.select("q_doc_id", F.explode("q_sh").alias("x"))
    c_post = per_doc.select("doc_id", F.explode("sh").alias("x"))
    inter = (
        c_post.join(F.broadcast(q_post), "x")
        .where(F.col("doc_id") != F.col("q_doc_id"))
        .groupBy("doc_id", "q_doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = dedup.persist_tracked(
        inter.join(sizes, "doc_id")
        .join(
            F.broadcast(
                sizes.select(
                    F.col("doc_id").alias("q_doc_id"),
                    F.col("n").alias("qn"),
                )
            ),
            "q_doc_id",
        )
        .where(F.lit(3) * F.col("c") >= F.col("n") + F.col("qn"))
        .select(
            F.least("doc_id", "q_doc_id").alias("a"),
            F.greatest("doc_id", "q_doc_id").alias("b"),
        )
        .distinct()
    )
    n_true = exact.agg(F.count(F.lit(1)).cast("long").alias("n_true_pairs"))

    # all four configs as ONE exploded (n_bands, band_idx, band_hash)
    # stream over the in-row mh array: 16+8+4+2 = 30 structs per doc
    entries = [
        F.struct(
            F.lit(nb).cast("long").alias("nb"),
            F.lit(b).alias("band_idx"),
            F.md5(
                F.concat_ws(
                    "_",
                    *[
                        F.col("mh")[b * wid + j].cast("string")
                        for j in range(wid)
                    ],
                )
            ).alias("band_hash"),
        )
        for nb, wid in _LSH_CONFIGS
        for b in range(nb)
    ]
    bands = per_doc.select(
        "doc_id", F.explode(F.array(*entries)).alias("e")
    ).select("doc_id", "e.nb", "e.band_idx", "e.band_hash")
    qbands = bands.join(
        F.broadcast(qset.select(F.col("q_doc_id").alias("doc_id"))),
        "doc_id",
    ).select(
        F.col("doc_id").alias("q_doc_id"), "nb", "band_idx", "band_hash"
    )
    cand = (
        bands.join(F.broadcast(qbands), ["nb", "band_idx", "band_hash"])
        .where(F.col("doc_id") != F.col("q_doc_id"))
        .select(
            "nb",
            F.least("doc_id", "q_doc_id").alias("a"),
            F.greatest("doc_id", "q_doc_id").alias("b"),
        )
        .distinct()
    )
    per_cfg = (
        cand.join(
            exact.withColumn("m", F.lit(1)), ["a", "b"], "left"
        )
        .groupBy("nb")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidate_pairs"),
            F.count("m").cast("long").alias("n_matched"),
        )
    )
    # 4-row config spine (left join: a config with ZERO candidates at a
    # tiny sf must still emit its row, counts 0 — the per-config agg of
    # the former loop did)
    cfg_rows = per_doc.sparkSession.createDataFrame(
        [(nb, wid) for nb, wid in _LSH_CONFIGS],
        "nb long, band_width long",
    )
    return (
        cfg_rows.join(F.broadcast(per_cfg), "nb", "left")
        .crossJoin(F.broadcast(n_true))
        .select(
            F.col("nb").alias("n_bands"),
            "band_width",
            "n_true_pairs",
            F.coalesce("n_candidate_pairs", F.lit(0).cast("long")).alias(
                "n_candidate_pairs"
            ),
            F.coalesce("n_matched", F.lit(0).cast("long")).alias(
                "n_matched"
            ),
            F.round(
                F.try_divide(
                    F.coalesce("n_matched", F.lit(0).cast("long")).cast(
                        "double"
                    ),
                    F.col("n_true_pairs"),
                ),
                6,
            ).alias("recall_r6"),
        )
        .orderBy("band_width")
    )


def _lsh_band_tradeoff_sql() -> str:
    cfg_sqls = []
    for nb, wid in _LSH_CONFIGS:
        band_exprs = []
        for b in range(nb):
            parts = " || '_' || ".join(
                f"CAST(mh[{b * wid + j + 1}] AS VARCHAR)"
                for j in range(wid)
            )
            band_exprs.append(f"({b}, md5({parts}))")
        cfg_sqls.append(
            f"""
SELECT CAST({nb} AS BIGINT) AS n_bands,
       CAST({wid} AS BIGINT) AS band_width,
       (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_true_pairs,
       (SELECT CAST(count(*) AS BIGINT) FROM (
          SELECT DISTINCT least(c.doc_id, q.doc_id) AS a,
                 greatest(c.doc_id, q.doc_id) AS b
          FROM cfg_{nb}_{wid} c JOIN cfg_{nb}_{wid} q
            ON c.band_idx = q.band_idx AND c.band_hash = q.band_hash
          WHERE q.doc_id % {_DEDUP_QUERY_MOD} = 0
            AND c.doc_id <> q.doc_id
       )) AS n_candidate_pairs,
       (SELECT CAST(count(*) AS BIGINT) FROM exact e JOIN (
          SELECT DISTINCT least(c.doc_id, q.doc_id) AS a,
                 greatest(c.doc_id, q.doc_id) AS b
          FROM cfg_{nb}_{wid} c JOIN cfg_{nb}_{wid} q
            ON c.band_idx = q.band_idx AND c.band_hash = q.band_hash
          WHERE q.doc_id % {_DEDUP_QUERY_MOD} = 0
            AND c.doc_id <> q.doc_id
       ) cd USING (a, b)) AS n_matched,
       round((SELECT CAST(count(*) AS DOUBLE) FROM exact e JOIN (
          SELECT DISTINCT least(c.doc_id, q.doc_id) AS a,
                 greatest(c.doc_id, q.doc_id) AS b
          FROM cfg_{nb}_{wid} c JOIN cfg_{nb}_{wid} q
            ON c.band_idx = q.band_idx AND c.band_hash = q.band_hash
          WHERE q.doc_id % {_DEDUP_QUERY_MOD} = 0
            AND c.doc_id <> q.doc_id
       ) cd USING (a, b)) / (SELECT count(*) FROM exact), 6)
         AS recall_r6"""
        )
    cfg_ctes = ",\n".join(
        f"""cfg_{nb}_{wid} AS (
  SELECT doc_id, t.i - 1 AS band_idx,
         md5({" || '_' || ".join(
             "CAST(mh[(t.i-1)*" + str(wid) + " + " + str(j + 1)
             + "] AS VARCHAR)" for j in range(wid)
         )}) AS band_hash
  FROM sigs, unnest(generate_series(1, {nb})) t(i)
)"""
        for nb, wid in _LSH_CONFIGS
    )
    return (
        _DOCS_CTE
        + _MINHASH_SIG_SQL
        + f"""
, per_doc AS (
  SELECT s.doc_id, d.sh FROM sigs s JOIN docs_n d USING (doc_id)
),
qset AS (
  SELECT doc_id AS q_doc_id, sh AS q_sh FROM per_doc
  WHERE doc_id % {_DEDUP_QUERY_MOD} = 0
),
exact AS (
  SELECT DISTINCT least(p.doc_id, q.q_doc_id) AS a,
         greatest(p.doc_id, q.q_doc_id) AS b
  FROM per_doc p, qset q
  WHERE p.doc_id <> q.q_doc_id
    AND 3 * len(list_intersect(p.sh, q.q_sh)) >= len(p.sh) + len(q.q_sh)
),
{cfg_ctes}
"""
        + "\nUNION ALL\n".join(cfg_sqls)
        + "\nORDER BY band_width"
    )


register(
    QuerySpec(
        "dedup_lsh_band_tradeoff",
        _lsh_band_tradeoff,
        _lsh_band_tradeoff_sql(),
        doc="measured LSH banding S-curve: candidate volume + recall vs "
        "exact Jaccard >= 0.5 truth for 16x1 / 8x2 / 4x4 / 2x8 splits "
        "of one 16-value MinHash signature — the trade behind the "
        "production 4x4 config (collision prob 1-(1-s^w)^b)",
        tags=("extension", "dedup", "recall", "tuning"),
    )
)


# ---------------------------------------------------------------------------
# product quantization ADC search + recall (round 4)
# ---------------------------------------------------------------------------

_PQ_M = similarity.PQ_M
_PQ_DSUB = similarity.PQ_DSUB

_PQ_CHAIN_SQL = f"""
, corpus_pq AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = 64
),
pq_per_dim AS (
  -- NULL labels never spawn a phantom codeword (pq_codebooks rule)
  SELECT label, (t.pos - 1) // {_PQ_DSUB} AS sub, t.pos AS pos,
         CAST(sum(CAST(e[t.pos] AS DECIMAL(28,12))) AS DOUBLE) / count(*)
           AS m
  FROM corpus_pq, unnest(generate_series(1, 64)) t(pos)
  WHERE label IS NOT NULL
  GROUP BY 1, 2, 3
),
pq_cb AS (
  SELECT sub, label AS code, list(m ORDER BY pos) AS cw
  FROM pq_per_dim GROUP BY sub, label
),
pq_cbn AS (
  SELECT sub, code, cw,
         list_sum(list_transform(generate_series(1, len(cw)),
               i -> cw[i] * cw[i])) AS cwn2
  FROM pq_cb
),
pq_subs AS (
  SELECT vec_id, s.sub AS sub,
         e[s.sub * {_PQ_DSUB} + 1 : s.sub * {_PQ_DSUB} + {_PQ_DSUB}] AS sv
  FROM corpus_pq, unnest(generate_series(0, {_PQ_M} - 1)) s(sub)
),
pq_enc0 AS (
  SELECT p.vec_id, p.sub, c.code,
         round(list_sum(list_transform(generate_series(1, len(p.sv)),
               i -> (p.sv[i] - c.cw[i]) * (p.sv[i] - c.cw[i]))), 6) AS d2
  FROM pq_subs p JOIN pq_cbn c USING (sub)
),
pq_codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT *, row_number() OVER (
        PARTITION BY vec_id, sub ORDER BY d2 ASC, code ASC) AS rn
    FROM pq_enc0
  ) WHERE rn = 1
),
pq_queries AS (
  SELECT vec_id AS query_vec_id, e AS qe, nrm AS qnorm
  FROM normed WHERE vec_id % 100 = 0
),
pq_lut AS (
  SELECT q.query_vec_id, q.qnorm, c.sub, c.code,
         list_sum(list_transform(generate_series(1, {_PQ_DSUB}),
               i -> q.qe[c.sub * {_PQ_DSUB} + i] * c.cw[i])) AS pdot,
         c.cwn2
  FROM pq_queries q, pq_cbn c
),
pq_pair AS (
  SELECT l.query_vec_id, k.vec_id,
         CAST(sum(CAST(l.pdot AS DECIMAL(28,12))) AS DOUBLE) AS adot,
         CAST(sum(CAST(l.cwn2 AS DECIMAL(28,12))) AS DOUBLE) AS rn2,
         max(l.qnorm) AS qnorm
  FROM pq_codes k JOIN pq_lut l USING (sub, code)
  GROUP BY 1, 2
),
pq_scored AS (
  SELECT query_vec_id, vec_id AS neighbor_vec_id,
         round(adot / (qnorm * sqrt(rn2)), 6) AS cos_pq
  FROM pq_pair
)
"""


register(
    QuerySpec(
        "similarity_pq_adc_topk",
        lambda spark, sf_dir: similarity.cosine_topk_pq_adc(
            _emb(spark, sf_dir)
        ),
        _EMB_CTE
        + _PQ_CHAIN_SQL
        + """
SELECT query_vec_id, neighbor_vec_id, cos_pq, rank FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_vec_id
      ORDER BY cos_pq DESC, neighbor_vec_id ASC) AS BIGINT) AS rank
  FROM pq_scored
) WHERE rank <= 5
ORDER BY query_vec_id, rank
""",
        doc="Product-quantization ADC top-k (Jegou et al. 2011): per-"
        "(subspace, label) mean-subvector codebooks, L2-argmin encode to "
        "PQ_M small ints per vector (~32x smaller stored index), query-"
        "side lookup tables broadcast against the code stream — the "
        "compressed-domain ANN path next to LSH and IVF",
        tags=("extension", "similarity", "pq"),
    )
)


def _pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of PQ-ADC against the brute-force exact baseline, plus
    the measured index compression (float bytes vs code bytes per
    vector) — the two numbers that decide whether the 32x-smaller
    compressed scan is worth its recall loss, completing the measured
    ANN trade-off matrix (LSH, IVF nprobe=1/2, PQ)."""
    emb = _emb(spark, sf_dir)
    exact = similarity.cosine_topk_bruteforce(emb).select(
        "query_vec_id", "neighbor_vec_id"
    )
    pq = similarity.cosine_topk_pq_adc(emb).select(
        "query_vec_id", "neighbor_vec_id"
    )
    nvec = emb.agg(F.count(F.lit(1)).alias("n_vectors"))
    return (
        _recall_report(exact, pq, "n_pq_pairs")
        .crossJoin(F.broadcast(nvec))
        .select(
            "n_exact_pairs",
            "n_pq_pairs",
            "n_matched",
            "recall_r6",
            (F.col("n_vectors") * 64 * 4).cast("long").alias(
                "bytes_float_index"
            ),
            (F.col("n_vectors") * similarity.PQ_M).cast("long").alias(
                "bytes_pq_index"
            ),
        )
    )


register(
    QuerySpec(
        "similarity_pq_recall",
        _pq_recall,
        _EMB_CTE
        + _PQ_CHAIN_SQL
        + """
, pq5 AS (
  SELECT query_vec_id, neighbor_vec_id FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_vec_id
        ORDER BY cos_pq DESC, neighbor_vec_id ASC) AS rank
    FROM pq_scored
  ) WHERE rank <= 5
),
bq AS (
  SELECT vec_id AS query_vec_id, e AS qe, nrm AS qnorm
  FROM normed WHERE vec_id % 100 = 0
),
bscored AS (
  SELECT q.query_vec_id, c.vec_id AS neighbor_vec_id,
         round(list_sum(list_transform(generate_series(1, len(c.e)),
               i -> q.qe[i] * c.e[i])) / (q.qnorm * c.nrm), 6) AS cos_sim
  FROM normed c, bq q
),
exact AS (
  SELECT query_vec_id, neighbor_vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_vec_id
        ORDER BY cos_sim DESC, neighbor_vec_id ASC) AS rank
    FROM bscored
  ) WHERE rank <= 5
),
m AS (
  SELECT count(*) AS n_matched
  FROM exact JOIN pq5 USING (query_vec_id, neighbor_vec_id)
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_exact_pairs,
       (SELECT CAST(count(*) AS BIGINT) FROM pq5) AS n_pq_pairs,
       (SELECT CAST(n_matched AS BIGINT) FROM m) AS n_matched,
       round(CAST((SELECT n_matched FROM m) AS DOUBLE)
             / (SELECT count(*) FROM exact), 6) AS recall_r6,
       (SELECT CAST(count(*) * 64 * 4 AS BIGINT) FROM corpus_pq)
         AS bytes_float_index,
       (SELECT CAST(count(*) * """
        + str(similarity.PQ_M)
        + """ AS BIGINT) FROM corpus_pq) AS bytes_pq_index
""",
        doc="recall@5 of PQ-ADC vs the brute-force exact baseline, with "
        "the measured 32x index compression — completes the ANN "
        "trade-off matrix (LSH / IVF nprobe=1 / IVF nprobe=2 / PQ)",
        tags=("extension", "similarity", "pq", "recall"),
    )
)


# ---------------------------------------------------------------------------
# two-stage retrieval: ADC candidates + exact refine (round 5)
# ---------------------------------------------------------------------------


def _two_stage_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured effect of the two-stage refine (`operators/similarity.
    cosine_topk_pq_refine` — FAISS IndexRefineFlat): recall@5 of raw
    PQ-ADC top-5 vs recall@5 after exact re-scoring of the ADC top-50,
    against the brute-force baseline. The refine stage touches only
    |queries| x 50 float vectors (point lookups), yet recovers most of
    the recall the compressed-domain scan loses — the number that
    justifies running the 32x-smaller index at 100 TB."""
    emb = _emb(spark, sf_dir)
    exact = similarity.cosine_topk_bruteforce(emb).select(
        "query_vec_id", "neighbor_vec_id"
    )
    adc5 = similarity.cosine_topk_pq_adc(emb).select(
        "query_vec_id", "neighbor_vec_id"
    )
    ref5 = similarity.cosine_topk_pq_refine(emb).select(
        "query_vec_id", "neighbor_vec_id"
    )
    # three 1-row aggregates cross-joined as concurrent broadcast
    # futures (see _recall_report's shape note: a fused single-pass
    # variant measured SLOWER because it serializes the subtrees)
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    n_adc = exact.join(adc5, ["query_vec_id", "neighbor_vec_id"]).agg(
        F.count(F.lit(1)).alias("n_adc_matched")
    )
    n_ref = exact.join(ref5, ["query_vec_id", "neighbor_vec_id"]).agg(
        F.count(F.lit(1)).alias("n_refined_matched")
    )
    return (
        n_exact.crossJoin(F.broadcast(n_adc))
        .crossJoin(F.broadcast(n_ref))
        .select(
            "n_exact_pairs",
            "n_adc_matched",
            "n_refined_matched",
            F.round(
                F.try_divide(
                    F.col("n_adc_matched").cast("double"),
                    F.col("n_exact_pairs"),
                ),
                6,
            ).alias("adc_recall_r6"),
            F.round(
                F.try_divide(
                    F.col("n_refined_matched").cast("double"),
                    F.col("n_exact_pairs"),
                ),
                6,
            ).alias("refined_recall_r6"),
            F.lit(similarity.REFINE_C).cast("long").alias("refine_depth"),
        )
    )


register(
    QuerySpec(
        "retrieval_two_stage_rerank",
        _two_stage_rerank,
        _EMB_CTE
        + _PQ_CHAIN_SQL
        + f"""
, adc_ranked AS (
  SELECT query_vec_id, neighbor_vec_id,
         row_number() OVER (PARTITION BY query_vec_id
             ORDER BY cos_pq DESC, neighbor_vec_id ASC) AS rank
  FROM pq_scored
),
adc5 AS (
  SELECT query_vec_id, neighbor_vec_id FROM adc_ranked WHERE rank <= 5
),
cand AS (
  SELECT query_vec_id, neighbor_vec_id FROM adc_ranked
  WHERE rank <= {similarity.REFINE_C}
),
refined AS (
  SELECT c.query_vec_id, c.neighbor_vec_id,
         round(list_sum(list_transform(generate_series(1, len(n.e)),
               i -> q.e[i] * n.e[i])) / (q.nrm * n.nrm), 6) AS cos_exact
  FROM cand c
  JOIN normed n ON n.vec_id = c.neighbor_vec_id
  JOIN normed q ON q.vec_id = c.query_vec_id
),
ref5 AS (
  SELECT query_vec_id, neighbor_vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_vec_id
        ORDER BY cos_exact DESC, neighbor_vec_id ASC) AS rank
    FROM refined
  ) WHERE rank <= 5
),
bq AS (
  SELECT vec_id AS query_vec_id, e AS qe, nrm AS qnorm
  FROM normed WHERE vec_id % 100 = 0
),
bscored AS (
  SELECT q.query_vec_id, c.vec_id AS neighbor_vec_id,
         round(list_sum(list_transform(generate_series(1, len(c.e)),
               i -> q.qe[i] * c.e[i])) / (q.qnorm * c.nrm), 6) AS cos_sim
  FROM normed c, bq q
),
exact AS (
  SELECT query_vec_id, neighbor_vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_vec_id
        ORDER BY cos_sim DESC, neighbor_vec_id ASC) AS rank
    FROM bscored
  ) WHERE rank <= 5
),
ma AS (SELECT count(*) AS n FROM exact JOIN adc5
       USING (query_vec_id, neighbor_vec_id)),
mr AS (SELECT count(*) AS n FROM exact JOIN ref5
       USING (query_vec_id, neighbor_vec_id))
SELECT (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_exact_pairs,
       (SELECT CAST(n AS BIGINT) FROM ma) AS n_adc_matched,
       (SELECT CAST(n AS BIGINT) FROM mr) AS n_refined_matched,
       round(CAST((SELECT n FROM ma) AS DOUBLE)
             / (SELECT count(*) FROM exact), 6) AS adc_recall_r6,
       round(CAST((SELECT n FROM mr) AS DOUBLE)
             / (SELECT count(*) FROM exact), 6) AS refined_recall_r6,
       CAST({similarity.REFINE_C} AS BIGINT) AS refine_depth
""",
        doc="Two-stage retrieval audit: recall@5 of raw PQ-ADC top-5 vs "
        "exact-refined ADC top-50 (FAISS IndexRefineFlat pattern) "
        "against the brute-force baseline — the compressed scan plus "
        "|Q| x 50 point lookups recovers the recall the codes lose",
        tags=("extension", "similarity", "pq", "retrieval", "recall"),
    )
)


def _png_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = multimodal.decode_png_real(_docs(spark, sf_dir))
    return d.select(
        "doc_id",
        "width",
        "height",
        "bit_depth",
        "color_type",
        "n_chunks",
        "crc_ok",
        F.round("mean_pixel", 6).alias("mean_pixel"),
    )


register(
    QuerySpec(
        "multimodal_png_decode_real",
        _png_decode_real,
        r"""
WITH d AS (
  SELECT doc_id,
         md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS h
  FROM documents
  -- NULL text carries no media payload: with_payload/_digest_bytes_col
  -- exclude it on the engine side (operators/multimodal.py), so the
  -- payload CTE mirrors the WHERE (r11 dirty-fixture alignment)
  WHERE text IS NOT NULL
),
b AS (
  SELECT doc_id,
         list_transform(generate_series(0, 15),
           i -> CAST('0x' || substr(h, 2*i + 1, 2) AS INTEGER)) AS bytes
  FROM d
)
SELECT doc_id,
       8 AS width,
       8 AS height,
       8 AS bit_depth,
       2 AS color_type,
       3 AS n_chunks,
       TRUE AS crc_ok,
       round(CAST(list_sum(bytes) AS DOUBLE) / 16.0, 6) AS mean_pixel
FROM b ORDER BY doc_id
""",
        doc="REAL compressed-format PNG decode (stdlib zlib, no codec "
        "libs): chunk walk with CRC-32 verification, genuine DEFLATE "
        "inflate of the IDAT stream, Sub-filter row reconstruction, "
        "numpy pixel mean — the reconstructed pixels tile the text "
        "digest so the oracle recomputes mean_pixel analytically while "
        "the Spark side exercises the full inflate+defilter path",
        tags=("extension", "multimodal", "real-codec"),
    )
)


# ---------------------------------------------------------------------------
# IVF-PQ composite index (round 4): cell pruning + compressed-domain ADC
# ---------------------------------------------------------------------------

_IVFPQ_TAIL_SQL = f"""
, ivfpq_lut AS (
  SELECT q.query_vec_id, q.qnorm, q.qcell, c.sub, c.code,
         list_sum(list_transform(generate_series(1, {_PQ_DSUB}),
               i -> q.qe[c.sub * {_PQ_DSUB} + i] * c.cw[i])) AS pdot,
         c.cwn2
  FROM queries q, pq_cbn c
),
ivfpq_pair AS (
  SELECT l.query_vec_id, k.vec_id,
         CAST(sum(CAST(l.pdot AS DECIMAL(28,12))) AS DOUBLE) AS adot,
         CAST(sum(CAST(l.cwn2 AS DECIMAL(28,12))) AS DOUBLE) AS rn2,
         max(l.qnorm) AS qnorm
  FROM pq_codes k
  JOIN assigned a ON a.vec_id = k.vec_id
  JOIN ivfpq_lut l
    ON l.qcell = a.cell_id AND l.sub = k.sub AND l.code = k.code
  GROUP BY 1, 2
),
ivfpq_scored AS (
  SELECT query_vec_id, vec_id AS neighbor_vec_id,
         round(adot / (qnorm * sqrt(rn2)), 6) AS cos_pq
  FROM ivfpq_pair
)
"""


register(
    QuerySpec(
        "similarity_ivfpq_topk",
        lambda spark, sf_dir: similarity.cosine_topk_ivfpq(
            _emb(spark, sf_dir)
        ),
        _EMB_CTE
        + _IVF_CHAIN_SQL
        + _PQ_CHAIN_SQL
        + _IVFPQ_TAIL_SQL
        + """
SELECT query_vec_id, neighbor_vec_id, cos_pq, rank FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_vec_id
      ORDER BY cos_pq DESC, neighbor_vec_id ASC) AS BIGINT) AS rank
  FROM ivfpq_scored
) WHERE rank <= 5
ORDER BY query_vec_id, rank
""",
        doc="IVF-PQ composite ANN (the FAISS IndexIVFPQ shape): coarse "
        "cell pruning via the IVF quantizer, compressed-domain ADC "
        "scoring within the cell via PQ codes — one 3-key broadcast "
        "equi-join (cell, sub, code) does both pruning and table "
        "lookup; corpus side touches only (cell_id, codes)",
        tags=("extension", "similarity", "ivf", "pq"),
    )
)


def _ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of IVF-PQ vs the brute-force exact baseline — the final
    cell of the measured ANN matrix (LSH, IVF x nprobe, PQ, IVF-PQ):
    how much recall the doubly-approximate index (cell pruning AND code
    compression) keeps, which is the number that decides the production
    configuration."""
    emb = _emb(spark, sf_dir)
    exact = similarity.cosine_topk_bruteforce(emb).select(
        "query_vec_id", "neighbor_vec_id"
    )
    ivfpq = similarity.cosine_topk_ivfpq(emb).select(
        "query_vec_id", "neighbor_vec_id"
    )
    return _recall_report(exact, ivfpq, "n_ivfpq_pairs")


register(
    QuerySpec(
        "similarity_ivfpq_recall",
        _ivfpq_recall,
        _EMB_CTE
        + _IVF_CHAIN_SQL
        + _PQ_CHAIN_SQL
        + _IVFPQ_TAIL_SQL
        + """
, ivfpq5 AS (
  SELECT query_vec_id, neighbor_vec_id FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_vec_id
        ORDER BY cos_pq DESC, neighbor_vec_id ASC) AS rank
    FROM ivfpq_scored
  ) WHERE rank <= 5
),
bq AS (
  SELECT vec_id AS query_vec_id, e AS qe, nrm AS qnorm
  FROM normed WHERE vec_id % 100 = 0
),
bscored AS (
  SELECT q.query_vec_id, c.vec_id AS neighbor_vec_id,
         round(list_sum(list_transform(generate_series(1, len(c.e)),
               i -> q.qe[i] * c.e[i])) / (q.qnorm * c.nrm), 6) AS cos_sim
  FROM normed c, bq q
),
exact AS (
  SELECT query_vec_id, neighbor_vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_vec_id
        ORDER BY cos_sim DESC, neighbor_vec_id ASC) AS rank
    FROM bscored
  ) WHERE rank <= 5
),
m AS (
  SELECT count(*) AS n_matched
  FROM exact JOIN ivfpq5 USING (query_vec_id, neighbor_vec_id)
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_exact_pairs,
       (SELECT CAST(count(*) AS BIGINT) FROM ivfpq5) AS n_ivfpq_pairs,
       (SELECT CAST(n_matched AS BIGINT) FROM m) AS n_matched,
       round(CAST((SELECT n_matched FROM m) AS DOUBLE)
             / (SELECT count(*) FROM exact), 6) AS recall_r6
""",
        doc="recall@5 of the IVF-PQ composite vs the brute-force exact "
        "baseline — the final cell of the measured ANN trade-off matrix",
        tags=("extension", "similarity", "ivf", "pq", "recall"),
    )
)


def _matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of exact search over the FIRST 16 of 64 dimensions vs
    the full-dimension baseline — the Matryoshka/dimension-truncation
    serving trade measured like every other approximation here. Also
    reports the scan-width ratio (the cost side of the dial)."""
    emb = _emb(spark, sf_dir)
    exact = similarity.cosine_topk_bruteforce(emb).select(
        "query_vec_id", "neighbor_vec_id"
    )
    trunc = similarity.cosine_topk_truncated(emb).select(
        "query_vec_id", "neighbor_vec_id"
    )
    return _recall_report(exact, trunc, "n_trunc_pairs").select(
        "n_exact_pairs",
        "n_trunc_pairs",
        "n_matched",
        "recall_r6",
        F.lit(similarity.MRL_DIMS).cast("long").alias("dims_scored"),
        F.lit(64).cast("long").alias("dims_full"),
    )


register(
    QuerySpec(
        "similarity_matryoshka_recall",
        _matryoshka_recall,
        _EMB_CTE
        + f"""
, tcorpus AS (
  SELECT vec_id, e[1:{similarity.MRL_DIMS}] AS te FROM corpus
),
tnormed AS (
  SELECT vec_id, te,
         sqrt(list_sum(list_transform(generate_series(1, len(te)),
              i -> te[i] * te[i]))) AS tnrm
  FROM tcorpus
),
tq AS (
  SELECT vec_id AS query_vec_id, te AS qe, tnrm AS qnorm
  FROM tnormed WHERE vec_id % 100 = 0
),
tscored AS (
  SELECT q.query_vec_id, c.vec_id AS neighbor_vec_id,
         round(list_sum(list_transform(generate_series(1, len(c.te)),
               i -> q.qe[i] * c.te[i])) / (q.qnorm * c.tnrm), 6) AS cos_sim
  FROM tnormed c, tq q
),
trunc5 AS (
  SELECT query_vec_id, neighbor_vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_vec_id
        ORDER BY cos_sim DESC, neighbor_vec_id ASC) AS rank
    FROM tscored
  ) WHERE rank <= 5
),
bq AS (
  SELECT vec_id AS query_vec_id, e AS qe, nrm AS qnorm
  FROM normed WHERE vec_id % 100 = 0
),
bscored AS (
  SELECT q.query_vec_id, c.vec_id AS neighbor_vec_id,
         round(list_sum(list_transform(generate_series(1, len(c.e)),
               i -> q.qe[i] * c.e[i])) / (q.qnorm * c.nrm), 6) AS cos_sim
  FROM normed c, bq q
),
exact AS (
  SELECT query_vec_id, neighbor_vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_vec_id
        ORDER BY cos_sim DESC, neighbor_vec_id ASC) AS rank
    FROM bscored
  ) WHERE rank <= 5
),
m AS (
  SELECT count(*) AS n_matched
  FROM exact JOIN trunc5 USING (query_vec_id, neighbor_vec_id)
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_exact_pairs,
       (SELECT CAST(count(*) AS BIGINT) FROM trunc5) AS n_trunc_pairs,
       (SELECT CAST(n_matched AS BIGINT) FROM m) AS n_matched,
       round(CAST((SELECT n_matched FROM m) AS DOUBLE)
             / (SELECT count(*) FROM exact), 6) AS recall_r6,
       CAST({similarity.MRL_DIMS} AS BIGINT) AS dims_scored,
       CAST(64 AS BIGINT) AS dims_full
""",
        doc="Matryoshka/dimension-truncation recall: exact top-5 over "
        "the first 16 of 64 dims vs the full-dimension baseline — the "
        "4x-narrower-scan serving trade, measured (honest pessimistic "
        "floor on a non-MRL-trained fixture)",
        tags=("extension", "similarity", "recall"),
    )
)


# ---------------------------------------------------------------------------
# contrastive-training triple mining (round 4)
# ---------------------------------------------------------------------------


def _contrastive_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pair mining for a retrieval/embedding model — the step
    between ANN search and contrastive fine-tuning: for every query
    vector, emit its POSITIVE (nearest non-self neighbor), three HARD
    negatives (ranks 20-22 — similar enough to be informative, far
    enough to be wrong: the band in-batch negatives miss), and three
    deterministic RANDOM negatives (hash-picked over the corpus id
    space; a collision with the top ranks is possible and harmless —
    random negatives are random). One brute-force ranking pass over the
    broadcast query set feeds all three via rank slicing; ids are
    CSV-serialized in rank order for the driver canonicalizer."""
    emb = _emb(spark, sf_dir)
    ranked = similarity.cosine_topk_bruteforce(emb, k=22)
    n_vec = emb.agg(F.count(F.lit(1)).alias("n_vec"))
    pos = ranked.where(F.col("rank") == 2).select(
        "query_vec_id", F.col("neighbor_vec_id").alias("pos_id")
    )
    hard = (
        ranked.where(F.col("rank").between(20, 22))
        .groupBy("query_vec_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rank", "neighbor_vec_id"))
                    ),
                    lambda s: s["neighbor_vec_id"].cast("string"),
                ),
                ",",
            ).alias("hard_negs_csv")
        )
    )
    rand = pos.crossJoin(F.broadcast(n_vec)).select(
        "query_vec_id",
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(3)),
                lambda j: (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit("cneg:"),
                                    F.col("query_vec_id").cast("string"),
                                    F.lit(":"),
                                    j.cast("string"),
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % F.col("n_vec")
                ).cast("string"),
            ),
            ",",
        ).alias("rand_negs_csv"),
    )
    return (
        pos.join(hard, "query_vec_id")
        .join(rand, "query_vec_id")
        .orderBy("query_vec_id")
    )


register(
    QuerySpec(
        "mining_contrastive_triples",
        _contrastive_triples,
        _EMB_CTE
        + """
, bq AS (
  SELECT vec_id AS query_vec_id, e AS qe, nrm AS qnorm
  FROM normed WHERE vec_id % 100 = 0
),
bscored AS (
  SELECT q.query_vec_id, c.vec_id AS neighbor_vec_id,
         round(list_sum(list_transform(generate_series(1, len(c.e)),
               i -> q.qe[i] * c.e[i])) / (q.qnorm * c.nrm), 6) AS cos_sim
  FROM normed c, bq q
),
ranked AS (
  SELECT query_vec_id, neighbor_vec_id,
         row_number() OVER (PARTITION BY query_vec_id
             ORDER BY cos_sim DESC, neighbor_vec_id ASC) AS rank
  FROM bscored
),
pos AS (
  SELECT query_vec_id, neighbor_vec_id AS pos_id FROM ranked WHERE rank = 2
),
hard AS (
  SELECT query_vec_id,
         string_agg(CAST(neighbor_vec_id AS VARCHAR), ',' ORDER BY rank)
           AS hard_negs_csv
  FROM ranked WHERE rank BETWEEN 20 AND 22 GROUP BY query_vec_id
),
nv AS (SELECT count(*) AS n_vec FROM corpus),
rand AS (
  SELECT p.query_vec_id,
         string_agg(
           CAST(CAST('0x' || substr(md5('cneg:'
                  || CAST(p.query_vec_id AS VARCHAR) || ':'
                  || CAST(j.j AS VARCHAR)), 1, 8) AS BIGINT)
                % (SELECT n_vec FROM nv) AS VARCHAR),
           ',' ORDER BY j.j) AS rand_negs_csv
  FROM pos p, unnest(generate_series(1, 3)) j(j)
  GROUP BY p.query_vec_id
)
SELECT p.query_vec_id, p.pos_id, h.hard_negs_csv, r.rand_negs_csv
FROM pos p JOIN hard h USING (query_vec_id) JOIN rand r USING (query_vec_id)
ORDER BY p.query_vec_id
""",
        doc="contrastive-training triple mining: positive = nearest "
        "non-self neighbor, hard negatives = ranks 20-22 of the same "
        "brute-force ranking, random negatives = deterministic "
        "hash-picks over the id space — the pair-mining step between "
        "ANN search and embedding fine-tuning",
        tags=("extension", "mining", "similarity", "training"),
    )
)


# ---------------------------------------------------------------------------
# DPO preference-pair mining (round 5)
# ---------------------------------------------------------------------------

_PREF_CHOSEN_RANK = 2   # nearest non-self neighbor plays "chosen"
_PREF_REJECTED_RANK = 15  # a plausible-but-worse response plays "rejected"


def _preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair mining for DPO/RLHF-style training — the sibling
    of `mining_contrastive_triples` for PAIRWISE objectives: for every
    query (prompt stand-in), CHOSEN = its nearest non-self neighbor and
    REJECTED = rank 15 of the SAME ranking pass (a plausible but
    measurably worse response), with the score margin that pair
    curricula sort and filter by. Pairs with sub-threshold margin are
    dropped (margin <= 0.05 teaches nothing and destabilizes the DPO
    loss) and the per-pair margin is reported for curriculum bucketing.

    Shape at 100 TB: ONE brute-force ranking pass over the broadcast
    query set (rank slicing, exactly like the triples miner — no second
    scoring pass), then a per-query pivot of two rank rows. The margin
    filter is a post-aggregation predicate on a |queries|-row table."""
    emb = _emb(spark, sf_dir)
    ranked = similarity.cosine_topk_bruteforce(emb, k=_PREF_REJECTED_RANK)
    picked = ranked.where(
        F.col("rank").isin(_PREF_CHOSEN_RANK, _PREF_REJECTED_RANK)
    )
    pairs = picked.groupBy("query_vec_id").agg(
        F.max(
            F.when(
                F.col("rank") == _PREF_CHOSEN_RANK, F.col("neighbor_vec_id")
            )
        ).alias("chosen_id"),
        F.max(
            F.when(
                F.col("rank") == _PREF_REJECTED_RANK,
                F.col("neighbor_vec_id"),
            )
        ).alias("rejected_id"),
        F.round(
            F.max(
                F.when(F.col("rank") == _PREF_CHOSEN_RANK, F.col("cos_sim"))
            )
            - F.max(
                F.when(
                    F.col("rank") == _PREF_REJECTED_RANK, F.col("cos_sim")
                )
            ),
            6,
        ).alias("margin_r6"),
    )
    return pairs.where(F.col("margin_r6") > 0.05).orderBy("query_vec_id")


register(
    QuerySpec(
        "mining_preference_pairs",
        _preference_pairs,
        _EMB_CTE
        + f"""
, bq AS (
  SELECT vec_id AS query_vec_id, e AS qe, nrm AS qnorm
  FROM normed WHERE vec_id % 100 = 0
),
bscored AS (
  SELECT q.query_vec_id, c.vec_id AS neighbor_vec_id,
         round(list_sum(list_transform(generate_series(1, len(c.e)),
               i -> q.qe[i] * c.e[i])) / (q.qnorm * c.nrm), 6) AS cos_sim
  FROM normed c, bq q
),
ranked AS (
  SELECT query_vec_id, neighbor_vec_id, cos_sim,
         row_number() OVER (PARTITION BY query_vec_id
             ORDER BY cos_sim DESC, neighbor_vec_id ASC) AS rank
  FROM bscored
),
pairs AS (
  SELECT query_vec_id,
         max(CASE WHEN rank = {_PREF_CHOSEN_RANK}
                  THEN neighbor_vec_id END) AS chosen_id,
         max(CASE WHEN rank = {_PREF_REJECTED_RANK}
                  THEN neighbor_vec_id END) AS rejected_id,
         round(max(CASE WHEN rank = {_PREF_CHOSEN_RANK} THEN cos_sim END)
             - max(CASE WHEN rank = {_PREF_REJECTED_RANK} THEN cos_sim END),
           6) AS margin_r6
  FROM ranked
  WHERE rank IN ({_PREF_CHOSEN_RANK}, {_PREF_REJECTED_RANK})
  GROUP BY query_vec_id
)
SELECT query_vec_id, chosen_id, rejected_id, margin_r6
FROM pairs WHERE margin_r6 > 0.05
ORDER BY query_vec_id
""",
        doc="DPO/RLHF preference-pair mining: chosen = nearest non-self "
        "neighbor, rejected = rank 15 of the same single ranking pass, "
        "margin-filtered (> 0.05) with per-pair margins for curriculum "
        "bucketing — the pairwise sibling of the contrastive triples",
        tags=("extension", "mining", "similarity", "training"),
    )
)


# ---------------------------------------------------------------------------
# binary-quantized Hamming ANN (round 5)
# ---------------------------------------------------------------------------

_BINARY_CTE = """
, bcoded AS (
  SELECT vec_id,
         CAST(list_sum(list_transform(generate_series(1, 32),
              i -> CASE WHEN e[i] > 0
                        THEN CAST(power(2, i - 1) AS BIGINT)
                        ELSE 0 END)) AS BIGINT) AS blo,
         CAST(list_sum(list_transform(generate_series(33, 64),
              i -> CASE WHEN e[i] > 0
                        THEN CAST(power(2, i - 33) AS BIGINT)
                        ELSE 0 END)) AS BIGINT) AS bhi
  FROM normed
),
bqueries AS (
  SELECT vec_id AS query_vec_id, blo AS qlo, bhi AS qhi
  FROM bcoded WHERE vec_id % 100 = 0
),
hscored AS (
  SELECT q.query_vec_id, c.vec_id AS neighbor_vec_id,
         CAST(bit_count(xor(c.blo, q.qlo))
            + bit_count(xor(c.bhi, q.qhi)) AS BIGINT) AS hamming
  FROM bcoded c, bqueries q
),
htop AS (
  SELECT query_vec_id, neighbor_vec_id, hamming,
         CAST(row_number() OVER (PARTITION BY query_vec_id
             ORDER BY hamming ASC, neighbor_vec_id ASC) AS BIGINT) AS rank
  FROM hscored
)
"""


register(
    QuerySpec(
        "similarity_binary_hamming_topk",
        lambda spark, sf_dir: similarity.hamming_topk_binary(
            _emb(spark, sf_dir)
        ),
        _EMB_CTE
        + _BINARY_CTE
        + """
SELECT query_vec_id, neighbor_vec_id, hamming, rank
FROM htop WHERE rank <= 5
ORDER BY query_vec_id, rank
""",
        doc="Binary-quantized ANN: 64 sign bits packed into two longs "
        "(8 bytes/vector, 32x smaller index), top-5 by XOR+popcount "
        "Hamming distance — integer-only whole-stage codegen, the "
        "cheapest compressed scan in the ANN matrix "
        "(operators/similarity.py binary_codes/hamming_topk_binary)",
        tags=("extension", "similarity", "recall"),
    )
)


def _binary_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@5 of the binary-Hamming scan vs the exact brute-force
    baseline, with the measured index bytes — positioning binary
    quantization inside the ANN trade-off matrix (LSH / IVF / PQ /
    Matryoshka / binary)."""
    emb = _emb(spark, sf_dir)
    exact = similarity.cosine_topk_bruteforce(emb).select(
        "query_vec_id", "neighbor_vec_id"
    )
    ham = similarity.hamming_topk_binary(emb).select(
        "query_vec_id", "neighbor_vec_id"
    )
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    n_match = exact.join(ham, ["query_vec_id", "neighbor_vec_id"]).agg(
        F.count(F.lit(1)).alias("n_matched")
    )
    nvec = emb.agg(F.count(F.lit(1)).alias("n_vectors"))
    return (
        n_exact.crossJoin(F.broadcast(n_match))
        .crossJoin(F.broadcast(nvec))
        .select(
            "n_exact_pairs",
            "n_matched",
            F.round(
                F.try_divide(
                    F.col("n_matched").cast("double"),
                    F.col("n_exact_pairs"),
                ),
                6,
            ).alias("recall_r6"),
            (F.col("n_vectors") * 64 * 4).cast("long").alias(
                "bytes_float_index"
            ),
            (F.col("n_vectors") * 8).cast("long").alias("bytes_binary_index"),
        )
    )


register(
    QuerySpec(
        "similarity_binary_recall",
        _binary_recall,
        _EMB_CTE
        + _BINARY_CTE
        + """
, ham5 AS (
  SELECT query_vec_id, neighbor_vec_id FROM htop WHERE rank <= 5
),
bq AS (
  SELECT vec_id AS query_vec_id, e AS qe, nrm AS qnorm
  FROM normed WHERE vec_id % 100 = 0
),
bscored AS (
  SELECT q.query_vec_id, c.vec_id AS neighbor_vec_id,
         round(list_sum(list_transform(generate_series(1, len(c.e)),
               i -> q.qe[i] * c.e[i])) / (q.qnorm * c.nrm), 6) AS cos_sim
  FROM normed c, bq q
),
exact AS (
  SELECT query_vec_id, neighbor_vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_vec_id
        ORDER BY cos_sim DESC, neighbor_vec_id ASC) AS rank
    FROM bscored
  ) WHERE rank <= 5
),
m AS (
  SELECT count(*) AS n_matched
  FROM exact JOIN ham5 USING (query_vec_id, neighbor_vec_id)
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_exact_pairs,
       (SELECT CAST(n_matched AS BIGINT) FROM m) AS n_matched,
       round(CAST((SELECT n_matched FROM m) AS DOUBLE)
             / (SELECT count(*) FROM exact), 6) AS recall_r6,
       (SELECT CAST(count(*) * 64 * 4 AS BIGINT) FROM corpus)
         AS bytes_float_index,
       (SELECT CAST(count(*) * 8 AS BIGINT) FROM corpus)
         AS bytes_binary_index
""",
        doc="recall@5 of the binary sign-bit Hamming scan vs the exact "
        "baseline, with measured 32x index compression — completes the "
        "ANN matrix (LSH / IVF / PQ / IVF-PQ / Matryoshka / binary)",
        tags=("extension", "similarity", "recall"),
    )
)


# ---------------------------------------------------------------------------
# int8 symmetric ANN (round 5)
# ---------------------------------------------------------------------------

_INT8_CTE = """
, q8 AS (
  SELECT vec_id,
         list_transform(e, x -> CASE
             WHEN amax = 0 THEN CAST(0 AS BIGINT)
             ELSE greatest(CAST(-127 AS BIGINT), least(CAST(127 AS BIGINT),
                  CAST(floor(x / (amax / 127.0) + 0.5) AS BIGINT))) END)
           AS q
  FROM (SELECT vec_id, e,
               list_max(list_transform(e, x -> abs(x))) AS amax
        FROM normed)
),
q8n AS (
  SELECT vec_id, q,
         CAST(list_sum(list_transform(generate_series(1, len(q)),
              i -> q[i] * q[i])) AS BIGINT) AS qq
  FROM q8
),
q8queries AS (
  SELECT vec_id AS query_vec_id, q AS quer, qq AS qq_q
  FROM q8n WHERE vec_id % 100 = 0
),
q8scored AS (
  SELECT s.query_vec_id, c.vec_id AS neighbor_vec_id,
         round(CAST(list_sum(list_transform(generate_series(1, len(c.q)),
               i -> c.q[i] * s.quer[i])) AS DOUBLE)
               / (sqrt(CAST(c.qq AS DOUBLE)) * sqrt(CAST(s.qq_q AS DOUBLE))),
               6) AS cos_q8
  FROM q8n c, q8queries s
),
q8top AS (
  SELECT query_vec_id, neighbor_vec_id, cos_q8,
         CAST(row_number() OVER (PARTITION BY query_vec_id
             ORDER BY cos_q8 DESC, neighbor_vec_id ASC) AS BIGINT) AS rank
  FROM q8scored
)
"""


register(
    QuerySpec(
        "similarity_int8_topk",
        lambda spark, sf_dir: similarity.cosine_topk_int8(
            _emb(spark, sf_dir)
        ),
        _EMB_CTE
        + _INT8_CTE
        + """
SELECT query_vec_id, neighbor_vec_id, cos_q8, rank
FROM q8top WHERE rank <= 5
ORDER BY query_vec_id, rank
""",
        doc="int8 symmetric ANN: per-vector max-abs/127 quantization "
        "(floor(x+0.5), engine-round-safe), EXACT integer dots with "
        "cosine reconstructed from integer self-dots (scales cancel) — "
        "64 bytes/vector, the 4x-compression midpoint between float "
        "brute force and binary sign bits",
        tags=("extension", "similarity", "recall"),
    )
)


def _int8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@5 of the int8 symmetric scan vs the float brute-force
    baseline, with measured index bytes — slotting 4x compression into
    the ANN matrix between float (1x) and binary (32x)."""
    emb = _emb(spark, sf_dir)
    exact = similarity.cosine_topk_bruteforce(emb).select(
        "query_vec_id", "neighbor_vec_id"
    )
    q8 = similarity.cosine_topk_int8(emb).select(
        "query_vec_id", "neighbor_vec_id"
    )
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    n_match = exact.join(q8, ["query_vec_id", "neighbor_vec_id"]).agg(
        F.count(F.lit(1)).alias("n_matched")
    )
    nvec = emb.agg(F.count(F.lit(1)).alias("n_vectors"))
    return (
        n_exact.crossJoin(F.broadcast(n_match))
        .crossJoin(F.broadcast(nvec))
        .select(
            "n_exact_pairs",
            "n_matched",
            F.round(
                F.try_divide(
                    F.col("n_matched").cast("double"),
                    F.col("n_exact_pairs"),
                ),
                6,
            ).alias("recall_r6"),
            (F.col("n_vectors") * 64 * 4).cast("long").alias(
                "bytes_float_index"
            ),
            (F.col("n_vectors") * 64).cast("long").alias("bytes_int8_index"),
        )
    )


register(
    QuerySpec(
        "similarity_int8_recall",
        _int8_recall,
        _EMB_CTE
        + _INT8_CTE
        + """
, q85 AS (
  SELECT query_vec_id, neighbor_vec_id FROM q8top WHERE rank <= 5
),
bq AS (
  SELECT vec_id AS query_vec_id, e AS qe, nrm AS qnorm
  FROM normed WHERE vec_id % 100 = 0
),
bscored AS (
  SELECT q.query_vec_id, c.vec_id AS neighbor_vec_id,
         round(list_sum(list_transform(generate_series(1, len(c.e)),
               i -> q.qe[i] * c.e[i])) / (q.qnorm * c.nrm), 6) AS cos_sim
  FROM normed c, bq q
),
exact AS (
  SELECT query_vec_id, neighbor_vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_vec_id
        ORDER BY cos_sim DESC, neighbor_vec_id ASC) AS rank
    FROM bscored
  ) WHERE rank <= 5
),
m AS (
  SELECT count(*) AS n_matched
  FROM exact JOIN q85 USING (query_vec_id, neighbor_vec_id)
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_exact_pairs,
       (SELECT CAST(n_matched AS BIGINT) FROM m) AS n_matched,
       round(CAST((SELECT n_matched FROM m) AS DOUBLE)
             / (SELECT count(*) FROM exact), 6) AS recall_r6,
       (SELECT CAST(count(*) * 64 * 4 AS BIGINT) FROM corpus)
         AS bytes_float_index,
       (SELECT CAST(count(*) * 64 AS BIGINT) FROM corpus)
         AS bytes_int8_index
""",
        doc="recall@5 of int8 symmetric quantized search vs the float "
        "baseline with measured 4x compression — the ANN matrix now "
        "spans 1x float / 4x int8 / ~32x PQ / 32x binary",
        tags=("extension", "similarity", "recall"),
    )
)
