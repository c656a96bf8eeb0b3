"""Simulate the driver's correctness harness locally.

Runs every ``__spark_entry__.queries()`` entry under a **vanilla**
SparkSession (no engine session.py confs — the exact contract the driver
holds us to) at the given sf dir, and compares row count / column names /
order-insensitive canonical values against the DuckDB oracle.

Usage: python tools/driver_sim.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import json
import math
import sys
import time
import traceback

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_value(v) -> str:
    # scalar NULL check first: covers None / NaN / NaT AND pd.NA (pandas
    # nullable dtypes from DuckDB .df() / Arrow-backed toPandas stringify
    # to '<NA>' otherwise — ADVICE r2). Guarded against array-likes,
    # where pd.isna returns an array.
    if not isinstance(v, (list, tuple)) and type(v).__name__ != "ndarray":
        try:
            if pd.isna(v):
                return "<NULL>"
        except (TypeError, ValueError):
            pass
    if isinstance(v, float):
        # 9 significant digits, not repr: Spark vs DuckDB float aggregates
        # can differ in the last ulp from accumulation order (ADVICE r2);
        # bit-exact comparison would flag those as false FAILs.
        return f"{v:.9g}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return str(v)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    # Match the REAL driver's order of operations exactly: sort RAW pandas
    # values first, stringify after. The r3 sim stringified first, which
    # masked the driver's ``TypeError: unhashable type: 'list'`` on raw
    # array columns (inverted_index_postings went sim-green, driver-red).
    # With raw-first sorting, an array-valued result column raises here
    # too — the sim now fails exactly where the driver fails.
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )
    for c in df.columns:
        df[c] = df[c].map(canon_value)
    return df


def main() -> int:
    from pyspark.sql import SparkSession

    # vanilla: only master + a shuffle-partition count sized for local
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    results: dict[str, dict] = {}
    fails = 0
    for name, build in qs.items():
        if ONLY and not any(f in name for f in ONLY):
            continue
        t0 = time.time()
        rec: dict = {}
        try:
            sdf = build(spark, SF_DIR).toPandas()
            rec["spark_rows"] = len(sdf)
            oracle = oracles.get(name)
            if oracle is None:
                rec["mode"] = "rows-only"
                rec["ok"] = True
            else:
                odf = con.execute(oracle).df()
                # strict column-ORDER agreement recorded separately
                # (ADVICE r2): the driver sorts columns by name before
                # hashing, so order doesn't gate ok — but an order
                # mismatch is still worth surfacing.
                rec["schema_order_match"] = list(sdf.columns) == list(
                    odf.columns
                )
                g, w = canon(sdf), canon(odf)
                rec["oracle_rows"] = len(w)
                rec["rows_match"] = len(g) == len(w)
                rec["schema_match"] = list(g.columns) == list(w.columns)
                rec["hash_match"] = (
                    rec["rows_match"]
                    and rec["schema_match"]
                    and g.equals(w)
                )
                rec["ok"] = bool(rec["hash_match"])
                if not rec["schema_match"]:
                    rec["cols"] = [list(g.columns), list(w.columns)]
                elif rec["rows_match"] and not rec["hash_match"]:
                    neq = (g != w).any(axis=1)
                    i = int(neq.idxmax())
                    rec["first_diff"] = {
                        "spark": g.iloc[i].to_dict(),
                        "oracle": w.iloc[i].to_dict(),
                    }
        except Exception:
            rec["ok"] = False
            rec["err"] = traceback.format_exc().splitlines()[-1]
        rec["sec"] = round(time.time() - t0, 2)
        results[name] = rec
        if not rec["ok"]:
            fails += 1
        tag = "ok " if rec["ok"] else "FAIL"
        print(f"{tag} {name} ({rec['sec']}s)"
              + ("" if rec["ok"] else f" :: {json.dumps({k: v for k, v in rec.items() if k not in ('ok', 'sec')}, default=str)[:400]}"))
        sys.stdout.flush()

    print(f"\n{len(results) - fails}/{len(results)} ok")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
