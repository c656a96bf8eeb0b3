"""Automated streaming-plan audit (VERDICT r4 rec #5): stream_* queries
execute at build time, so the registry-wide BATCH plan guardrail skips
them — their auditable surface is the per-micro-batch PROGRESS record
captured by ``streaming.daily.PROGRESS_LEDGER``. This suite replays the
stateful / watermarked streaming queries and asserts, from the recorded
progress, the two properties that keep state BOUNDED on a long-running
cluster:

1. every stateful query that relies on event-time eviction reports a
   real (non-epoch) watermark in its progress — a refactor that drops
   ``withWatermark`` from a stream-stream join or windowed dedup would
   silently switch to keep-forever state and only OOM in production;
2. every state operator reports its state rows, and state never exceeds
   the total input rows (a sanity ceiling that catches key-explosion
   regressions such as salting leaking into the state key).
"""

from __future__ import annotations

import pytest

from dc_moving_violations_cloud_etl_spark.queries import QUERIES, get_queries
from dc_moving_violations_cloud_etl_spark.streaming import daily

get_queries()

_EPOCH = "1970-01-01T00:00:00.000Z"

# stream queries whose correctness depends on event-time state eviction:
# each must surface an advanced watermark and bounded state operators
_WATERMARKED_STATEFUL = [
    "stream_hopping_window",
    "stream_late_drop_audit",
    "stream_late_data_watermark",
    "stream_dedup_watermark",
    "stream_session_window",
    "stream_interval_join",
    "stream_outer_join_sealed",
    "stream_full_outer_sealed",
    "stream_semi_join_matched",
    "stream_right_outer_sealed",
]

# custom-stateful queries with NO event-time watermark BY DESIGN
# (applyInPandasWithState + NoTimeout under availableNow: the state is
# sealed by source exhaustion, bounded by key cardinality, and a
# production continuous deployment adds GroupStateTimeout) — audited
# for state presence + key-bounded size, not watermark
_KEYED_STATEFUL = [
    "stream_stateful_sessions",
]

# source/sink lifecycle and keyed-aggregation streams with no
# event-time-eviction dependence: audited for the weaker invariant that
# ANY state they report stays keyed (bounded by input rows), so a future
# stateful refactor of one of these cannot silently dodge the audit by
# staying off the watermarked list (VERDICT r5 rec #6)
_LEDGERED_LIFECYCLE = [
    "stream_chained_pipeline",
    "stream_custom_source_ingest",
    "stream_daily_rollup",
    "stream_file_sink_exactly_once",
    "stream_foreachbatch_upsert",
    "stream_occ_snapshot_rollup",
    "stream_py_sink_roundtrip",
    "stream_rate_limited_backfill",
    "stream_static_join",
    "stream_update_mode_counts",
]

# batch readers over a once-driven checkpoint (streaming/statestore.py):
# on the warm path NO streaming query runs (the point of the
# demonstrators — state outlives the query), so there is no per-run
# progress to audit; the checkpoint-driving aggregation goes through
# _run_to_completion (ledgered) on its one cold start
_CHECKPOINT_READERS = [
    "stream_state_metadata_read",
    "stream_statestore_read",
]


def _progress_for(spark, sf_dir, name):
    """Build (= run) the streaming query and return the ledger entries
    it appended."""
    before = len(daily.PROGRESS_LEDGER)
    QUERIES[name].build(spark, sf_dir).collect()
    trail = daily.PROGRESS_LEDGER[before:]
    assert trail, f"{name}: no progress recorded — query bypassed the ledger"
    return [p for _, batches in trail for p in batches]


@pytest.mark.parametrize("name", _WATERMARKED_STATEFUL)
def test_watermarked_query_reports_advanced_watermark_and_state(
    spark, sf_dir, name
):
    progresses = _progress_for(spark, sf_dir, name)
    # (1) watermark present and advanced beyond the epoch by the end
    watermarks = [
        p.get("eventTime", {}).get("watermark")
        for p in progresses
        if p.get("eventTime", {}).get("watermark")
    ]
    assert watermarks, f"{name}: no watermark in any progress record"
    assert any(w != _EPOCH for w in watermarks), (
        f"{name}: watermark never advanced past the epoch — event-time "
        f"eviction is not engaged ({watermarks})"
    )
    # (2) stateful operators present, with state bounded by total input
    ops = [op for p in progresses for op in p.get("stateOperators", [])]
    assert ops, f"{name}: no stateOperators in progress — state audit moot"
    total_in = sum(p.get("numInputRows", 0) for p in progresses)
    max_state = max(op.get("numRowsTotal", 0) for op in ops)
    assert max_state <= max(total_in, 1) * 4, (
        f"{name}: state rows {max_state} exceed 4x input rows {total_in} "
        "— state is not being evicted"
    )


@pytest.mark.parametrize("name", _KEYED_STATEFUL)
def test_keyed_stateful_query_state_bounded_by_keys(spark, sf_dir, name):
    progresses = _progress_for(spark, sf_dir, name)
    ops = [op for p in progresses for op in p.get("stateOperators", [])]
    assert ops, f"{name}: no stateOperators in progress"
    total_in = sum(p.get("numInputRows", 0) for p in progresses)
    max_state = max(op.get("numRowsTotal", 0) for op in ops)
    # one state row per group key (possibly 0 once sealed sessions are
    # emitted and removed): state must never reach per-event scale
    assert max_state <= max(total_in, 1), (
        f"{name}: state rows {max_state} vs input rows {total_in} — "
        "state should be keyed, not per-event"
    )


@pytest.mark.parametrize("name", _LEDGERED_LIFECYCLE)
def test_lifecycle_query_state_stays_keyed(spark, sf_dir, name):
    """Lifecycle/keyed-agg streams may legitimately hold aggregation
    state (keyed by group/window), but never per-event state with no
    eviction path. If one of these gains an operator whose state scales
    past its input, it belongs on the watermarked list — this test is
    the tripwire."""
    progresses = _progress_for(spark, sf_dir, name)
    ops = [op for p in progresses for op in p.get("stateOperators", [])]
    if not ops:
        return  # genuinely stateless lifecycle — nothing to bound
    total_in = sum(p.get("numInputRows", 0) for p in progresses)
    max_state = max(op.get("numRowsTotal", 0) for op in ops)
    assert max_state <= max(total_in, 1), (
        f"{name}: state rows {max_state} vs input rows {total_in} — "
        "state grew past keyed scale; move this query to the "
        "watermarked-stateful audit list"
    )


def test_audit_lists_partition_every_stream_query():
    """Completeness (VERDICT r5 rec #6): every stream_* query appears in
    EXACTLY one audit list, so no streaming query — present or future —
    can exist outside the audit."""
    lists = (
        _WATERMARKED_STATEFUL,
        _KEYED_STATEFUL,
        _LEDGERED_LIFECYCLE,
        _CHECKPOINT_READERS,
    )
    union: set[str] = set().union(*map(set, lists))
    assert sum(map(len, lists)) == len(union), "a query is in two lists"
    streams = {n for n in QUERIES if n.startswith("stream_")}
    assert union == streams, (
        f"unaudited: {sorted(streams - union)}; "
        f"stale: {sorted(union - streams)}"
    )


def test_ledger_is_bounded(spark, sf_dir):
    """A long bench session running many streaming queries must not
    accumulate unbounded progress history."""
    _progress_for(spark, sf_dir, "stream_daily_rollup")
    assert len(daily.PROGRESS_LEDGER) <= daily._LEDGER_MAX
