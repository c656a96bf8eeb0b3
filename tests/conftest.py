from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

from dc_moving_violations_cloud_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="engine-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def ddb():
    """DuckDB connection with base tables registered as views, mirroring
    the driver's oracle environment."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Order-insensitive canonical form: columns sorted by name, rows
    sorted by stringified values (mirrors the driver's order-insensitive
    value-hash)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(_canon_value)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _canon_value(v) -> str:
    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "<NULL>"
    if isinstance(v, float):
        # exact repr — the driver hashes values; we require bit-level parity
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def assert_df_matches_oracle(spark_df, ddb, oracle: str, name: str = "") -> None:
    got = _canon(spark_df.toPandas())
    want = _canon(ddb.execute(oracle).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    neq = (got != want).any(axis=1)
    if neq.any():
        i = int(neq.idxmax())
        raise AssertionError(
            f"{name}: first differing row {i}:\n spark={got.iloc[i].to_dict()}\n"
            f" oracle={want.iloc[i].to_dict()}"
        )
