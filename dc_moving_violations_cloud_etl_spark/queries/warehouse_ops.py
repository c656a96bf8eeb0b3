"""Warehouse-pattern operators (round 3): SCD Type-2 history build,
CDC log compaction, Markov transition matrix, BPE merge-pair mining,
and a key-skew (Gini) audit.

These are the dimensional-modeling / change-capture shapes the
reference's MySQL upsert sinks (SURVEY.md §2.B) gesture at but never
materialize as queries: the reference overwrites state (last-writer
wins); a warehouse keeps the history (SCD-2) or compacts an op-log
(CDC). Every query windows over PRE-AGGREGATED or per-key-bounded data
with a deterministic (ts, event_id) tiebreak, so results hash-match the
DuckDB oracles exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import catalog
from .registry import QuerySpec, register


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return catalog.base(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# SCD Type-2: per-user attribute-version history from the props.k stream
# ---------------------------------------------------------------------------


def _scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the Type-2 slowly-changing-dimension history of each user's
    ``props.k`` attribute: a new version opens at every change-point
    (lag-compare), closes at the next change (lead). Output is the
    per-user version summary (bounded by |users|), not the raw interval
    table — the interval build itself is the operator under test.

    Scale: both windows partition by user_id over already-projected
    3-column rows; at cluster scale this is one shuffle on the user key,
    and the change-point filter drops ~(1 - 1/|k-domain|) of rows before
    the second window."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        "ts",
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_k", F.lag("k").over(w))
        .where(F.col("prev_k").isNull() | (F.col("k") != F.col("prev_k")))
        .select("user_id", "ts", "event_id", "k")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    versions = changes.withColumn("valid_to", F.lead("ts").over(w2))
    return (
        versions.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_versions"),
            F.count("valid_to").cast("long").alias("n_closed"),
            F.round(
                F.sum(
                    F.unix_micros("valid_to") - F.unix_micros("ts")
                ).cast("double")
                / 1000000.0,
                3,
            ).alias("closed_duration_s"),
            F.max(F.struct("ts", "event_id", "k"))["k"]
            .cast("long")
            .alias("current_k"),
        )
        .orderBy("user_id")
    )


register(
    QuerySpec(
        "scd2_user_attribute_history",
        _scd2_history,
        """
WITH ev AS (
  SELECT user_id, ts, event_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
),
changes AS (
  SELECT user_id, ts, event_id, k
  FROM (
    SELECT *, lag(k) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_k
    FROM ev
  )
  WHERE prev_k IS NULL OR k <> prev_k
),
versions AS (
  SELECT *, lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to
  FROM changes
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_versions,
       CAST(count(valid_to) AS BIGINT) AS n_closed,
       round(CAST(sum(epoch_us(valid_to) - epoch_us(ts)) AS DOUBLE)
             / 1000000.0, 3) AS closed_duration_s,
       CAST(max({'ts': ts, 'event_id': event_id, 'k': k}).k AS BIGINT)
         AS current_k
FROM versions
GROUP BY user_id ORDER BY user_id
""",
        doc="SCD Type-2 interval build (change-point lag filter + lead "
        "close) from the props.k attribute stream, summarized per user",
        tags=("extension", "warehouse", "scd2"),
    )
)


# ---------------------------------------------------------------------------
# CDC op-log compaction: last state per key
# ---------------------------------------------------------------------------


def _cdc_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Treat the event stream as a CDC op-log (signup=insert,
    error=delete, anything else=upsert) and compact it to final state:
    one partitioned-window pass picks each key's last op, a filter drops
    deleted keys. This is the read-side MERGE the reference's
    ``ON DUPLICATE KEY UPDATE`` sink performs write-side
    (reference etl/daily_load/violation_etl_daily.py:289)."""
    ev = _events(spark, sf_dir).select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    last = (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    alive = last.where(F.col("event_type") != "error")
    dead = last.where(F.col("event_type") == "error")
    return alive.agg(
        F.count(F.lit(1)).cast("long").alias("n_alive"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("alive_value_sum"),
    ).crossJoin(
        dead.agg(F.count(F.lit(1)).cast("long").alias("n_deleted"))
    )


register(
    QuerySpec(
        "cdc_last_state_compaction",
        _cdc_compaction,
        """
WITH last AS (
  SELECT * FROM (
    SELECT user_id, event_type, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1
)
SELECT CAST(count(*) FILTER (WHERE event_type <> 'error') AS BIGINT)
         AS n_alive,
       CAST(sum(CAST(value AS DECIMAL(18,2)))
              FILTER (WHERE event_type <> 'error') AS DOUBLE)
         AS alive_value_sum,
       CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)
         AS n_deleted
FROM last
""",
        doc="CDC op-log compaction to last-key state (partitioned "
        "row_number, delete-op filter) — read-side MERGE semantics",
        tags=("extension", "warehouse", "cdc"),
    )
)


# ---------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences
# ---------------------------------------------------------------------------


def _transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition counts + row-conditional
    probabilities: lag() per user (deterministic (ts, event_id) order),
    then one hash-agg over the 5×5 type space. The probability divides
    by the per-prev-type total via a tiny second window over the
    25-row aggregate — no second pass over the data."""
    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wt = Window.partitionBy("prev_type")
    return (
        pairs.withColumn(
            "p",
            F.round(F.col("n") / F.sum("n").over(wt), 6),
        )
        .orderBy("prev_type", "next_type")
    )


register(
    QuerySpec(
        "event_transition_matrix",
        _transition_matrix,
        """
WITH seq AS (
  SELECT event_type AS next_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
pairs AS (
  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n,
       round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type), 6)
         AS p
FROM pairs
ORDER BY prev_type, next_type
""",
        doc="first-order Markov transition matrix (lag pairs -> 5x5 "
        "hash-agg -> conditional probability over the aggregate)",
        tags=("extension", "analytics", "sequence"),
    )
)


# ---------------------------------------------------------------------------
# BPE merge-candidate mining: top adjacent character pairs
# ---------------------------------------------------------------------------

BPE_TOPK = 20


def _bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The counting step of one BPE-training merge round: frequency of
    adjacent character pairs inside whitespace tokens, corpus-wide.
    ``transform(sequence(...))`` generates the pairs as a JVM-side
    higher-order function — no UDF — and the count is one explode +
    hash-agg, linear in corpus characters."""
    docs = catalog.base(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    toks = docs.select(F.explode(F.split(norm, " ")).alias("t")).where(
        F.length("t") >= 2
    )
    pairs = toks.select(
        F.explode(
            F.expr("transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(BPE_TOPK)
    )


register(
    QuerySpec(
        "bpe_merge_pair_counts",
        _bpe_pairs,
        rf"""
WITH toks AS (
  SELECT t
  FROM (
    SELECT unnest(string_split(
             lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' '))
           AS t
    FROM documents
  ) WHERE length(t) >= 2
),
pairs AS (
  SELECT unnest(list_transform(
           generate_series(1, length(t) - 1),
           i -> substr(t, i, 2))) AS pair
  FROM toks
)
SELECT pair, CAST(count(*) AS BIGINT) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair ASC
LIMIT {BPE_TOPK}
""",
        doc="BPE merge-candidate mining: adjacent char-pair counts via "
        "transform(sequence(...)) higher-order function, top-k with "
        "deterministic tiebreak",
        tags=("extension", "text", "bpe-training"),
    )
)


# ---------------------------------------------------------------------------
# key-skew audit: Gini coefficient of the per-key distribution
# ---------------------------------------------------------------------------


def _skew_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantifies join/agg key skew per event_type: Gini coefficient of
    the per-user event-count distribution, computed from the PRE-
    aggregated (type, user) counts (bounded by |types|×|users|). The
    skew number is what decides salting/AQE-skew-join treatment at
    100 TB (operators/skew.py implements the remediation; this query is
    the detector)."""
    counts = (
        _events(spark, sf_dir)
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy("c", "user_id")
    ranked = counts.withColumn("i", F.row_number().over(w).cast("long"))
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("c").cast("long").alias("n_events"),
            F.max("c").cast("long").alias("max_key_count"),
            F.round(
                (2.0 * F.sum(F.col("i") * F.col("c")))
                / (F.count(F.lit(1)) * F.sum("c"))
                - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1)),
                6,
            ).alias("gini"),
        )
        .orderBy("event_type")
    )


register(
    QuerySpec(
        "key_skew_gini_audit",
        _skew_gini,
        """
WITH counts AS (
  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, user_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY event_type
                                    ORDER BY c, user_id) AS BIGINT) AS i
  FROM counts
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(c) AS BIGINT) AS n_events,
       CAST(max(c) AS BIGINT) AS max_key_count,
       round((2.0 * sum(i * c)) / (count(*) * sum(c))
             - (count(*) + 1.0) / count(*), 6) AS gini
FROM ranked
GROUP BY event_type ORDER BY event_type
""",
        doc="key-skew detector: Gini coefficient of per-key counts over "
        "the pre-aggregated (type, user) table — decides salting/AQE "
        "skew treatment",
        tags=("extension", "quality", "skew"),
    )
)


# ---------------------------------------------------------------------------
# inverted index build: term -> sorted posting list
# ---------------------------------------------------------------------------


def _inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list construction — the search-index build step over the
    corpus: explode tokens, dedupe (term, doc) pairs, aggregate each
    term's SORTED doc-id posting list. Selective terms only (document
    frequency 2..50): head terms would emit postings proportional to the
    corpus (those belong in a stopword/impact-ordered tier at scale, not
    in an array column). One shuffle on the term key; ``sort_array``
    makes the list deterministic, and the posting list is SERIALIZED to a
    comma-joined string — the driver's canonicalizer sorts raw result
    values before hashing and cannot hash a raw array cell
    (CORRECTNESS_r03: ``TypeError: unhashable type: 'list'``)."""
    docs = catalog.base(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    pairs = (
        docs.select("doc_id", F.explode(F.split(norm, " ")).alias("term"))
        .where(F.length("term") >= 3)
        .distinct()
    )
    return (
        pairs.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
        .where((F.col("df") >= 2) & (F.col("df") <= 50))
        .orderBy("term")
    )


register(
    QuerySpec(
        "inverted_index_postings",
        _inverted_index,
        r"""
WITH pairs AS (
  SELECT DISTINCT doc_id, t AS term
  FROM (
    SELECT doc_id,
           unnest(string_split(
             lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ')) AS t
    FROM documents
  ) WHERE length(t) >= 3
)
SELECT term,
       CAST(count(*) AS BIGINT) AS df,
       array_to_string(list_sort(list(doc_id)), ',') AS postings
FROM pairs
GROUP BY term
HAVING count(*) BETWEEN 2 AND 50
ORDER BY term
""",
        doc="inverted-index posting lists for selective terms (df 2..50): "
        "explode -> (term, doc) dedup -> sorted array_agg serialized to "
        "a comma-joined string; one term-key shuffle",
        tags=("extension", "text", "inverted-index"),
    )
)


# ---------------------------------------------------------------------------
# incremental aggregate maintenance: partial merge vs full recompute
# ---------------------------------------------------------------------------

INCR_CUTOFF = "2024-01-20"


def _incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental-recompute contract a 100 TB rollup relies on:
    yesterday's materialized partial aggregate plus today's delta
    partial must MERGE to exactly the full recompute (count and DECIMAL
    sum are associative/commutative, so union-of-partials + re-agg is
    lossless). The query performs both paths — merge of the base/delta
    partials and a direct full aggregate — and emits a per-group
    equality flag; at scale the base partial is a stored table and only
    the delta scans new data, which is the entire point."""
    ev = catalog.base(spark, sf_dir, "events").select(
        "event_type", "ts", F.col("value").cast("decimal(18,2)").alias("v")
    )
    cutoff = F.lit(INCR_CUTOFF).cast("timestamp")

    def partial(df: DataFrame, part: str) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias(f"n_{part}"),
            F.sum("v").alias(f"sum_{part}"),
        )

    base = partial(ev.where(F.col("ts") < cutoff), "base")
    delta = partial(ev.where(F.col("ts") >= cutoff), "delta")
    merged = (
        base.join(delta, "event_type", "full_outer")
        .select(
            "event_type",
            F.coalesce("n_base", F.lit(0)).alias("n_base"),
            F.coalesce("n_delta", F.lit(0)).alias("n_delta"),
            (
                F.coalesce("n_base", F.lit(0))
                + F.coalesce("n_delta", F.lit(0))
            ).alias("n_merged"),
            (
                F.coalesce(
                    "sum_base", F.lit("0.00").cast("decimal(18,2)")
                )
                + F.coalesce(
                    "sum_delta", F.lit("0.00").cast("decimal(18,2)")
                )
            ).alias("sum_merged_dec"),
        )
    )
    full = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_full"),
        F.sum("v").alias("sum_full"),
    )
    return (
        merged.join(full, "event_type")
        .select(
            "event_type",
            "n_base",
            "n_delta",
            "n_merged",
            F.col("sum_merged_dec").cast("double").alias("total_merged"),
            (
                (F.col("n_merged") == F.col("n_full"))
                & (F.col("sum_merged_dec") == F.col("sum_full"))
            ).cast("int").alias("matches_full"),
        )
        .orderBy("event_type")
    )


register(
    QuerySpec(
        "incremental_agg_maintenance",
        _incremental_agg,
        f"""
WITH ev AS (
  SELECT event_type, ts, CAST(value AS DECIMAL(18,2)) AS v FROM events
),
base AS (
  SELECT event_type, count(*) AS n_base, sum(v) AS sum_base
  FROM ev WHERE ts < TIMESTAMP '{INCR_CUTOFF}' GROUP BY event_type
),
delta AS (
  SELECT event_type, count(*) AS n_delta, sum(v) AS sum_delta
  FROM ev WHERE ts >= TIMESTAMP '{INCR_CUTOFF}' GROUP BY event_type
),
merged AS (
  SELECT coalesce(base.event_type, delta.event_type) AS event_type,
         coalesce(n_base, 0) AS n_base,
         coalesce(n_delta, 0) AS n_delta,
         coalesce(n_base, 0) + coalesce(n_delta, 0) AS n_merged,
         coalesce(sum_base, CAST('0.00' AS DECIMAL(18,2)))
           + coalesce(sum_delta, CAST('0.00' AS DECIMAL(18,2)))
           AS sum_merged_dec
  FROM base FULL OUTER JOIN delta USING (event_type)
),
full_agg AS (
  SELECT event_type, count(*) AS n_full, sum(v) AS sum_full
  FROM ev GROUP BY event_type
)
SELECT m.event_type,
       CAST(n_base AS BIGINT) AS n_base,
       CAST(n_delta AS BIGINT) AS n_delta,
       CAST(n_merged AS BIGINT) AS n_merged,
       CAST(sum_merged_dec AS DOUBLE) AS total_merged,
       CAST(n_merged = n_full AND sum_merged_dec = sum_full AS INT)
         AS matches_full
FROM merged m JOIN full_agg f ON m.event_type = f.event_type
ORDER BY m.event_type
""",
        doc="incremental aggregate maintenance: base+delta partial merge "
        "proven equal to the full recompute per group (associative "
        "count/DECIMAL-sum partials; the stored-rollup update pattern)",
        tags=("extension", "warehouse", "incremental"),
    )
)
