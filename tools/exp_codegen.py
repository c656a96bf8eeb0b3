"""Round-15 experiment: attribute cold-vs-warm cost of the minhash
signature pipeline to whole-stage-codegen compilation, using Spark's
own CodegenMetrics source (compile time ms, generated method bytecode
sizes). Fresh JVM per invocation; run under different
SPARK_GRAFT_HUGE_METHOD_LIMIT / method-split settings to A/B.

Usage: python tools/exp_codegen.py [query_callable] (default: raw
minhash_signatures noop-sink; pass 'decontam' to run the full
curation_decontaminate_neardup query).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dc_moving_violations_cloud_etl_spark import caching  # noqa: E402
from dc_moving_violations_cloud_etl_spark.session import get_spark  # noqa: E402


def codegen_snapshot(spark):
    jvm = spark._jvm
    m = jvm.org.apache.spark.metrics.source.CodegenMetrics
    comp = m.METRIC_COMPILATION_TIME()
    meth = m.METRIC_GENERATED_METHOD_BYTECODE_SIZE()
    src = m.METRIC_SOURCE_CODE_SIZE()
    def hist(h):
        s = h.getSnapshot()
        vals = list(s.getValues())
        return {
            "count": int(h.getCount()),
            "sum": int(sum(vals)),
            "max": int(max(vals)) if vals else 0,
        }
    return {
        "compile_ms": hist(comp),
        "method_bytes": hist(meth),
        "source_bytes": hist(src),
    }


def main() -> None:
    target = sys.argv[1] if len(sys.argv) > 1 else "signatures"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="exp-codegen")
    print("hugeMethodLimit =", spark.conf.get("spark.sql.codegen.hugeMethodLimit"))
    try:
        print("methodSplitThreshold =", spark.conf.get(
            "spark.sql.codegen.methodSplitThreshold"))
    except Exception:
        pass

    if target == "signatures":
        from dc_moving_violations_cloud_etl_spark.operators import dedup
        from dc_moving_violations_cloud_etl_spark.queries.extensions import _docs

        def build():
            return dedup.minhash_signatures(_docs(spark, sf_dir)).select(
                "doc_id", "mh", "bands"
            )
    elif target == "decontam":
        from dc_moving_violations_cloud_etl_spark.queries import get_queries

        q = get_queries()["curation_decontaminate_neardup"]

        def build():
            return q(spark, sf_dir)
    else:
        from dc_moving_violations_cloud_etl_spark.queries import get_queries

        q = get_queries()[target]

        def build():
            return q(spark, sf_dir)

    base = codegen_snapshot(spark)
    for i in range(3):
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        caching.release_tracked()
        snap = codegen_snapshot(spark)
        print(
            f"pass{i}: {dt:7.3f}s  compile_ms(count={snap['compile_ms']['count']-base['compile_ms']['count']:3d}, "
            f"sum={snap['compile_ms']['sum']-base['compile_ms']['sum']:6d}ms)  "
            f"method_bytes(max={snap['method_bytes']['max']}, n={snap['method_bytes']['count']-base['method_bytes']['count']})  "
            f"src_bytes(sum={snap['source_bytes']['sum']-base['source_bytes']['sum']})",
            flush=True,
        )
        base = snap
    spark.stop()


if __name__ == "__main__":
    main()
