"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference ETL project
(``wangz99-crypto/dc-moving-violations-cloud-etl``).

The reference is a requests+pandas+MySQL pipeline; this engine re-expresses
its entire surface (SURVEY.md §2) Spark-first:

- ``session``      — SparkSession factory (UTC, AQE, tuned shuffle partitions)
- ``catalog``      — fixture tables + the ``violations`` / ``weather_daily``
                     reference-shaped views (FIXTURES.md §2 mapping)
- ``expressions``  — MySQL-dialect shims as native Column expressions
                     (DAYNAME, FIELD ordering, is_rain variants, safe casts)
- ``etl``          — the reference's transform pipelines as DataFrame ops
- ``operators``    — idempotent sinks (upsert / insert-ignore), watermark
                     incremental, dedup, similarity, text analysis
- ``queries``      — the declared query surface Qa–Qh / Q0 / V1–V4
- ``streaming``    — Structured Streaming daily-rollup (micro-batch analog
                     of the reference's Lambda cadence)

Everything here is built from public Apache Spark APIs only.
"""

__version__ = "0.1.0"
