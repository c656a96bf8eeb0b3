"""The Z-order audit (`layout_zorder_pruning_audit`) SIMULATES parquet
row-group zone maps with a rank//1000 assignment. This test pins that
simulation to reality: write the same keys as an actual parquet file
with 1000-row row groups in each sort order, read the REAL footer
min/max statistics back with pyarrow, and assert the per-predicate
scanned-group counts equal the simulation's."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dc_moving_violations_cloud_etl_spark.queries.source_ops import (
    _Z_BITS,
    _Z_PREDICATES,
    _Z_RG_ROWS,
)


@pytest.fixture(scope="module")
def keyed():
    # sf0.01 (10k events -> 10 row groups): the sf0.001 CI default has
    # only one 1000-row group, where every layout trivially ties
    df = pq.read_table("/root/testdata/sf0.01/events.parquet").to_pandas()
    mod = 1 << _Z_BITS
    did = (
        (pd.to_datetime(df["ts"]).dt.normalize()
         - pd.Timestamp("1970-01-01")).dt.days % mod
    ).astype("int64")
    ub = (df["user_id"] % mod).astype("int64")
    z = sum(
        ((did // (1 << i)) % 2) * (1 << (2 * i))
        + ((ub // (1 << i)) % 2) * (1 << (2 * i + 1))
        for i in range(_Z_BITS)
    )
    return pd.DataFrame(
        {"event_id": df["event_id"], "did": did, "ub": ub, "z": z}
    )


def _simulated_counts(keyed, order_cols):
    s = keyed.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
    s["rg"] = s.index // _Z_RG_ROWS
    g = s.groupby("rg").agg(
        lo_d=("did", "min"), hi_d=("did", "max"),
        lo_u=("ub", "min"), hi_u=("ub", "max"),
    )
    out = {}
    for name, (dlo, dhi, ulo, uhi) in _Z_PREDICATES.items():
        out[name] = int(
            (
                (g.lo_d <= dhi) & (g.hi_d >= dlo)
                & (g.lo_u <= uhi) & (g.hi_u >= ulo)
            ).sum()
        )
    return out, len(g)


def _real_footer_counts(keyed, order_cols, tmp_path, tag):
    s = keyed.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
    path = str(tmp_path / f"z_{tag}.parquet")
    pq.write_table(
        pa.Table.from_pandas(s, preserve_index=False),
        path,
        row_group_size=_Z_RG_ROWS,
    )
    md = pq.ParquetFile(path).metadata
    cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out = {name: 0 for name in _Z_PREDICATES}
    for rg in range(md.num_row_groups):
        row = md.row_group(rg)
        d = row.column(cols["did"]).statistics
        u = row.column(cols["ub"]).statistics
        for name, (dlo, dhi, ulo, uhi) in _Z_PREDICATES.items():
            if (
                d.min <= dhi and d.max >= dlo
                and u.min <= uhi and u.max >= ulo
            ):
                out[name] += 1
    return out, md.num_row_groups


@pytest.mark.parametrize(
    "order_cols",
    [["did", "ub", "event_id"], ["ub", "did", "event_id"],
     ["z", "event_id"]],
    ids=["linear_day", "linear_user", "zorder"],
)
def test_zorder_real_parquet_footers(keyed, order_cols, tmp_path):
    sim, n_sim = _simulated_counts(keyed, order_cols)
    real, n_real = _real_footer_counts(
        keyed, order_cols, tmp_path, "-".join(order_cols)
    )
    assert n_sim == n_real
    assert sim == real, (sim, real)


def test_zorder_bounds_both_dimensions(keyed):
    """The layout claim itself: on the single-dimension predicates the
    Morton layout scans strictly less than the linear layout sorted on
    the OTHER dimension."""
    day_major, _ = _simulated_counts(keyed, ["did", "ub", "event_id"])
    user_major, _ = _simulated_counts(keyed, ["ub", "did", "event_id"])
    zorder, _ = _simulated_counts(keyed, ["z", "event_id"])
    assert zorder["user_box"] < day_major["user_box"]
    assert zorder["day_box"] < user_major["day_box"]
