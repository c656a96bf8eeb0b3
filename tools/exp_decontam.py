"""Round-15 decomposition of curation_decontaminate_neardup: time each
stage with the noop sink (guide §1.4) on a warm session so the ~10 s
warm cost is attributed to a stage, not to 'codegen' folklore.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from dc_moving_violations_cloud_etl_spark import caching
from dc_moving_violations_cloud_etl_spark.operators import dedup as _dedup
from dc_moving_violations_cloud_etl_spark.queries.curation import (
    BENCH_MOD,
    _docs,
)
from dc_moving_violations_cloud_etl_spark.session import get_spark


def noop(df, label):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print(f"{time.perf_counter() - t0:8.3f}s  {label}", flush=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="exp-decontam")
    for rep in range(int(os.environ.get("REPS", "2"))):
        print(f"--- pass {rep}")
        t0 = time.perf_counter()
        per = caching.persist_tracked(
            _dedup.minhash_signatures(_docs(spark, sf_dir)).select(
                "doc_id", "lang", "text_hash", "sh", "bands"
            )
        )
        noop(per, "per materialize (signatures+persist)")
        is_bench = F.col("doc_id") % BENCH_MOD == 0
        w_th = Window.partitionBy("text_hash")
        reps = caching.persist_tracked(
            per.where(~is_bench)
            .withColumn("_rep", F.min("doc_id").over(w_th))
            .where(F.col("doc_id") == F.col("_rep"))
            .select("text_hash", "sh", "bands")
        )
        noop(reps, "reps (window rep election+persist)")
        rep_bands = reps.select(
            "text_hash", F.posexplode("bands").alias("band_idx", "band_hash")
        )
        bench_bands = per.where(is_bench).select(
            F.col("doc_id").alias("bench_doc_id"),
            F.posexplode("bands").alias("band_idx", "band_hash"),
        )
        cand = (
            rep_bands.join(
                F.broadcast(bench_bands), ["band_idx", "band_hash"]
            )
            .select("text_hash", "bench_doc_id")
            .distinct()
        )
        noop(cand, "cand (band join+distinct)")
        verified = (
            cand.join(reps.select("text_hash", "sh"), "text_hash")
            .join(
                F.broadcast(
                    per.where(is_bench).select(
                        F.col("doc_id").alias("bench_doc_id"),
                        F.col("sh").alias("sh_b"),
                    )
                ),
                "bench_doc_id",
            )
            .select(
                "text_hash",
                _dedup._jaccard(F.col("sh"), F.col("sh_b")).alias("jaccard"),
            )
            .where(F.col("jaccard") >= _dedup.JACCARD_THRESHOLD)
            .groupBy("text_hash")
            .agg(F.max("jaccard").alias("max_jaccard"))
        )
        noop(verified, "verified (jaccard verify)")
        corpus = per.where(~is_bench).select("doc_id", "lang", "text_hash")
        final = (
            corpus.join(verified, "text_hash", "left")
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs_checked"),
                F.count("max_jaccard").cast("long").alias("n_contaminated"),
                F.coalesce(F.max("max_jaccard"), F.lit(0.0)).alias(
                    "max_jaccard_r6"
                ),
            )
            .orderBy("lang")
        )
        noop(final, "final rollup")
        print(f"{time.perf_counter() - t0:8.3f}s  TOTAL", flush=True)
        caching.release_tracked()
    spark.stop()


if __name__ == "__main__":
    main()
