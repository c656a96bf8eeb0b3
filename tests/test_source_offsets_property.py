"""Property suite for the custom streaming sources' offset/restart
planner (VERDICT r8 rec #8, completing the r7 rec #6 pair): the
planning logic — cold-start offset, day-cursor pacing,
``partitions(start, end)`` fan-out, full-range ``latestOffset`` — must
give exactly-once day coverage under ANY monotone commit chain and ANY
mid-drain restart point, for ANY day distribution. No Spark session:
the readers are driven directly over tiny synthetic parquet fixtures
(the same classes ``streaming/source.py`` ships to the engine), so
hypothesis can afford many examples."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from dc_moving_violations_cloud_etl_spark.streaming.source import (
    make_daily_ingest_source,
    make_daily_ingest_source_partitioned,
)

_SETTINGS = dict(max_examples=20, deadline=None)

_BASE = datetime.date(2024, 3, 1)

# events: (day_offset, value) rows — duplicate days, gaps, single-day
# and single-row corpora all arise
_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),
        st.floats(min_value=0, max_value=100, allow_nan=False),
    ),
    min_size=1,
    max_size=50,
)


def _stage(tmp_path, events) -> tuple[str, dict[str, set[int]]]:
    """Write an events-shaped parquet fixture; return (path, the
    expected day -> {event_id} index)."""
    rows_by_day: dict[str, set[int]] = {}
    ids, tss, users, types, vals = [], [], [], [], []
    for i, (off, v) in enumerate(events):
        day = _BASE + datetime.timedelta(days=off)
        rows_by_day.setdefault(str(day), set()).add(i)
        ids.append(i)
        # mid-day timestamp: day-boundary logic must not depend on time
        tss.append(
            datetime.datetime.combine(day, datetime.time(hour=i % 24))
        )
        users.append(i % 7)
        types.append("view")
        vals.append(v)
    t = pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array(tss, pa.timestamp("us")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(vals, pa.float64()),
        }
    )
    path = str(tmp_path / "events.parquet")
    pq.write_table(t, path)
    return path, rows_by_day


def _batch_ids(batches) -> set[int]:
    out: set[int] = set()
    for b in batches:
        out.update(b.column("event_id").to_pylist())
    return out


def _simple_reader(path):
    ds = make_daily_ingest_source()(options={"path": path})
    return ds.simpleStreamReader(ds.schema())


def _part_reader(path):
    ds = make_daily_ingest_source_partitioned()(options={"path": path})
    return ds.streamReader(ds.schema())


@settings(**_SETTINGS)
@given(_EVENTS)
def test_simple_reader_paced_drain_is_exactly_once(tmp_path_factory, events):
    path, by_day = _stage(tmp_path_factory.mktemp("src"), events)
    r = _simple_reader(path)
    assert r.days == sorted(by_day)

    off = r.initialOffset()
    assert off == {"day_idx": 0}
    seen: set[int] = set()
    n_batches = 0
    while off["day_idx"] < len(r.days):
        batches, nxt = r.read(off)
        # offsets strictly advance until the end — a stalled cursor
        # would spin the micro-batch loop forever
        assert nxt["day_idx"] > off["day_idx"]
        ids = _batch_ids(batches)
        # no batch may re-deliver a previously delivered row
        assert not (ids & seen)
        seen |= ids
        off = nxt
        n_batches += 1
    # pacing contract: ceil(n/3) days per batch -> at most 3 batches,
    # and the drain covers every row exactly once
    assert 1 <= n_batches <= 3
    assert seen == set(range(len(events)))
    # a drained cursor holds: read at the end returns no rows, same off
    batches, nxt = r.read(off)
    assert _batch_ids(batches) == set() and nxt == off


@settings(**_SETTINGS)
@given(_EVENTS, st.data())
def test_simple_reader_replay_matches_paced_reads(
    tmp_path_factory, events, data
):
    """readBetweenOffsets (the engine's checkpoint replay path) must
    return exactly the rows the original paced reads delivered for the
    same committed range — J5 idempotency under restart."""
    path, by_day = _stage(tmp_path_factory.mktemp("src"), events)
    r = _simple_reader(path)
    n = len(r.days)
    a = data.draw(st.integers(min_value=0, max_value=n), label="start")
    b = data.draw(st.integers(min_value=a, max_value=n), label="end")
    replay = _batch_ids(
        r.readBetweenOffsets({"day_idx": a}, {"day_idx": b})
    )
    want: set[int] = set()
    for d in r.days[a:b]:
        want |= by_day[d]
    assert replay == want
    # restart: a FRESH reader (new __init__ over the same fixture)
    # replays the identical range identically
    r2 = _simple_reader(path)
    assert r2.days == r.days
    assert (
        _batch_ids(r2.readBetweenOffsets({"day_idx": a}, {"day_idx": b}))
        == replay
    )


@settings(**_SETTINGS)
@given(_EVENTS, st.data())
def test_partitioned_planner_exactly_once_under_any_commit_chain(
    tmp_path_factory, events, data
):
    path, by_day = _stage(tmp_path_factory.mktemp("src"), events)
    r = _part_reader(path)
    n = len(r.days)
    assert r.days == sorted(by_day)
    assert r.initialOffset() == {"day_idx": 0}
    # restart-safe by construction: the latest offset is the full range
    # no matter how much has been committed (the factory docstring's
    # measured backward-offset hazard)
    assert r.latestOffset() == {"day_idx": n}

    # an arbitrary monotone commit chain 0 = o0 <= ... <= ok = n (the
    # engine's sequence of (start, end] planning calls, including empty
    # ranges from no-new-data micro-batches)
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=n), max_size=6
            ),
            label="cuts",
        )
    )
    chain = [0] + cuts + [n]
    covered: list[str] = []
    for a, b in zip(chain, chain[1:]):
        parts = r.partitions({"day_idx": a}, {"day_idx": b})
        assert [p.day for p in parts] == r.days[a:b]
        covered.extend(p.day for p in parts)
    # exactly-once: the chained plans cover each day once, in order
    assert covered == r.days


@settings(max_examples=8, deadline=None)
@given(_EVENTS)
def test_partitioned_read_returns_exactly_the_partition_day(
    tmp_path_factory, events
):
    """Executor-side read(partition) must return exactly that day's
    rows (the pushed-down day predicate), so replanning a committed
    range after restart replays identical data."""
    path, by_day = _stage(tmp_path_factory.mktemp("src"), events)
    r = _part_reader(path)
    parts = r.partitions(r.initialOffset(), r.latestOffset())
    seen: set[int] = set()
    for p in parts:
        ids = _batch_ids(r.read(p))
        assert ids == by_day[p.day]
        assert not (ids & seen)
        seen |= ids
    assert seen == set(range(len(events)))
