"""Similarity search over embedding columns (BASELINE.json north-star):
brute-force cosine top-k as the exact baseline, and a hyperplane-LSH
bucketed variant as the scale path.

Embeddings are ``array<float>``; all arithmetic is promoted to double
element-wise and folded left-to-right (``F.aggregate``) so the result is
a deterministic IEEE sequence the DuckDB oracle reproduces; cosines are
rounded to 6 dp before ranking to absorb any engine-level fold
difference, with doc-id tie-breaks for a total order.

Scale posture:
- brute force: corpus × queries via **broadcast** of the (small) query
  set — an embarrassingly parallel map over corpus partitions, no
  shuffle. Cost O(|corpus|·|queries|·dim): the right baseline, and the
  right answer when |queries| is small.
- LSH: 8 deterministic hyperplanes (taken from the corpus itself —
  seed-free) → 256 sign-pattern buckets; candidates = same-bucket rows
  (equi-join on bucket id), then exact cosine within the bucket. At
  100 TB this turns the scan-per-query into a bucket-pruned lookup, the
  classic IVF/LSH trade: recall loss (measured against the brute-force
  baseline) for ~2^nplanes less compute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOP_K = 5
QUERY_MOD = 100  # query set = vec_id % 100 == 0
N_PLANES = 8  # hyperplanes = embeddings of vec_id 1..8


def _as_double(c: F.Column) -> F.Column:
    return F.transform(c, lambda x: x.cast("double"))


def _dot(a: F.Column, b: F.Column) -> F.Column:
    """Left-to-right fold of element products — deterministic order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def with_norm(embeddings: DataFrame) -> DataFrame:
    from .dedup import _fan_out

    e = _as_double(F.col("embedding"))
    return _fan_out(embeddings).select(
        "vec_id",
        "label",
        e.alias("e"),
        F.sqrt(_dot(e, e)).alias("norm"),
    )


def cosine_topk_bruteforce(embeddings: DataFrame, k: int = TOP_K) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (vec_id %
    QUERY_MOD == 0), self-match included at rank 1."""
    corpus = with_norm(embeddings)
    queries = corpus.where(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_vec_id"),
        F.col("e").alias("qe"),
        F.col("norm").alias("qnorm"),
    )
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        "query_vec_id",
        F.col("vec_id").alias("neighbor_vec_id"),
        F.round(
            _dot(F.col("qe"), F.col("e")) / (F.col("qnorm") * F.col("norm")), 6
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_vec_id", "rank")
    )


def _bucket(e: F.Column, planes: list[list[float]]) -> F.Column:
    """Sign-pattern bucket id: bit i set iff dot(e, plane_i) > 0."""
    b = F.lit(0)
    for i, p in enumerate(planes):
        pe = F.array(*[F.lit(float(x)) for x in p])
        b = b + F.when(_dot(e, pe) > 0, F.lit(2**i)).otherwise(F.lit(0))
    return b


def collect_planes(embeddings: DataFrame) -> list[list[float]]:
    """Deterministic hyperplanes: the embeddings with vec_id 1..N_PLANES
    (seed-free so the oracle can reproduce bucket assignment)."""
    rows = (
        embeddings.where(F.col("vec_id").between(1, N_PLANES))
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    return [[float(x) for x in r["embedding"]] for r in rows]


def cosine_topk_lsh(embeddings: DataFrame, k: int = TOP_K) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket (equi-join on bucket id instead of a cross join)."""
    planes = collect_planes(embeddings)
    corpus = with_norm(embeddings).withColumn("bucket", _bucket(F.col("e"), planes))
    queries = corpus.where(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_vec_id"),
        F.col("e").alias("qe"),
        F.col("norm").alias("qnorm"),
        F.col("bucket").alias("qbucket"),
    )
    scored = corpus.join(
        F.broadcast(queries), F.col("bucket") == F.col("qbucket")
    ).select(
        "query_vec_id",
        F.col("vec_id").alias("neighbor_vec_id"),
        F.round(
            _dot(F.col("qe"), F.col("e")) / (F.col("qnorm") * F.col("norm")), 6
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_vec_id", "rank")
    )
