"""JSON source-boundary tests (SURVEY.md §2.A1–A4): page payloads →
from_json → explode → attribute projection → the C-transform
expressions, mirroring the reference's ArcGIS/VisualCrossing shredding
(reference violation_etl_daily.py:180-184,227-278;
weather_etl_history.py:73-86)."""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F

from dc_moving_violations_cloud_etl_spark.expressions import (
    is_rain_v2,
    month_bucket,
    ms_to_date,
    ms_to_timestamp,
    synthetic_violation_id,
)
from dc_moving_violations_cloud_etl_spark.sources.json_api import (
    arcgis_features,
    weather_days,
)

MS_2024_10_05_1430 = 1728138600000  # 2024-10-05T14:30:00Z


def _arcgis_page(object_ids):
    return json.dumps(
        {
            "features": [
                {
                    "attributes": {
                        "OBJECTID": oid,
                        "ISSUE_DATE": MS_2024_10_05_1430 + oid,
                        "ISSUING_AGENCY_NAME": "MPD",
                        "VIOLATION_CODE": "T121",
                        "VIOLATION_PROCESS_DESC": "SPEED 11-15 MPH OVER THE LIMIT",
                        "LOCATION": "600 BLK NEW YORK AVE NE",
                        "FINE_AMOUNT": 100.0,
                        "TOTAL_PAID": 0.0,
                        "LATITUDE": 38.9,
                        "LONGITUDE": -77.0,
                        "ACCIDENT_INDICATOR": "N",
                    }
                }
                for oid in object_ids
            ]
        }
    )


def test_arcgis_pages_to_violation_rows(spark):
    pages = spark.createDataFrame(
        [(_arcgis_page([1, 2]),), (_arcgis_page([3]),), ("{not json",)],
        "payload string",
    )
    feats = arcgis_features(pages)
    rows = (
        feats.select(
            ms_to_timestamp(F.col("ISSUE_DATE")).alias("issue_date"),
            ms_to_date(F.col("ISSUE_DATE")).alias("violation_date"),
            synthetic_violation_id(
                month_bucket(ms_to_timestamp(F.col("ISSUE_DATE"))),
                F.col("OBJECTID"),
            ).alias("violation_id"),
            "FINE_AMOUNT",
        )
        .orderBy("violation_id")
        .collect()
    )
    # malformed page quarantined (PERMISSIVE null → no exploded rows)
    assert len(rows) == 3
    assert rows[0]["violation_id"] == "2024-10_1"
    assert rows[0]["violation_date"] == dt.date(2024, 10, 5)
    # UTC epoch-ms conversion (G14): 14:30:00Z, not local time
    assert rows[0]["issue_date"].hour == 14 and rows[0]["issue_date"].minute == 30


def test_weather_timeline_to_daily_rows(spark):
    payload = json.dumps(
        {
            "days": [
                {
                    "datetime": "2024-12-01",
                    "tempmax": 10.0,
                    "tempmin": 2.0,
                    "temp": 6.0,
                    "precip": 0.0,
                    "humidity": 70.0,
                    "windspeed": 12.0,
                    "conditions": "Rain, Partially cloudy",
                },
                {
                    "datetime": "2024-12-02",
                    "tempmax": 8.0,
                    "tempmin": 1.0,
                    "temp": 4.0,
                    "precip": 3.2,
                    "humidity": 80.0,
                    "windspeed": 9.0,
                    "conditions": "Clear",
                },
            ]
        }
    )
    pages = spark.createDataFrame([(payload,)], "payload string")
    days = weather_days(pages).withColumn(
        "is_rain", is_rain_v2(F.col("precip"), F.col("conditions"))
    )
    got = {r["datetime"]: r["is_rain"] for r in days.collect()}
    # C8 rule: conditions-substring OR precip>0
    assert got == {"2024-12-01": 1, "2024-12-02": 1}


def test_count_then_page_plan_end_to_end(spark):
    """A1/I3: a server row count becomes a parallel page plan whose
    windows tile [0, total) exactly; fetching each planned page and
    shredding via arcgis_features recovers every row exactly once
    (reference violation_etl_history.py:90-103 count-then-page loop)."""
    from dc_moving_violations_cloud_etl_spark.sources.json_api import plan_pages

    total, page_size = 23, 10
    plan = plan_pages(spark, total, page_size).orderBy("page_index").collect()
    assert [r["result_offset"] for r in plan] == [0, 10, 20]
    assert [r["result_record_count"] for r in plan] == [10, 10, 3]
    assert sum(r["result_record_count"] for r in plan) == total

    # simulate the fetch layer: one payload per planned window
    pages = spark.createDataFrame(
        [
            (_arcgis_page(range(r["result_offset"], r["result_offset"] + r["result_record_count"])),)
            for r in plan
        ],
        "payload string",
    )
    feats = arcgis_features(pages)
    assert feats.count() == total
    assert feats.select("OBJECTID").distinct().count() == total

    # degenerate counts
    assert plan_pages(spark, 0, page_size).count() == 0
    assert plan_pages(spark, page_size, page_size).count() == 1


class TestDailyIngestStreamSource:
    """Offset protocol of the custom Python streaming source
    (streaming/source.py) — exercised directly, no streaming query."""

    def _reader(self, sf_dir):
        from dc_moving_violations_cloud_etl_spark.streaming.source import (
            make_daily_ingest_source,
        )

        cls = make_daily_ingest_source()
        ds = cls(options={"path": f"{sf_dir}/events.parquet"})
        return ds.simpleStreamReader("ignored")

    @staticmethod
    def _n_rows(batches) -> int:
        # read() yields pyarrow RecordBatches (arrow transfer), not rows
        return sum(b.num_rows for b in batches)

    def test_offsets_advance_to_exhaustion_in_multiple_batches(self, sf_dir):
        r = self._reader(sf_dir)
        off = r.initialOffset()
        assert off == {"day_idx": 0}
        batches = 0
        total = 0
        while True:
            rows, nxt = r.read(off)
            n = self._n_rows(rows)
            if nxt == off:
                assert n == 0
                break
            total += n
            batches += 1
            off = nxt
            assert batches < 100, "offsets must reach exhaustion"
        assert batches >= 2, "drain must span multiple micro-batches"
        assert total > 0

    def test_replay_committed_range_is_deterministic(self, sf_dir):
        import pyarrow as pa

        r = self._reader(sf_dir)
        start = r.initialOffset()
        first = pa.Table.from_batches(list(r.read(start)[0]))
        end = r.read(start)[1]
        replay = pa.Table.from_batches(
            list(r.readBetweenOffsets(start, end))
        )
        assert replay.equals(first), "readBetweenOffsets must replay exactly"


class TestPartitionedDailyIngestStreamSource:
    """The partition-based sibling of the simple daily-ingest reader
    (streaming/source.py::make_daily_ingest_source_partitioned — the
    100 TB upgrade path, SCALING.md): one InputPartition per day read
    on the EXECUTORS, data never crossing the driver."""

    def _reader(self, sf_dir):
        from dc_moving_violations_cloud_etl_spark.streaming.source import (
            make_daily_ingest_source_partitioned,
        )

        cls = make_daily_ingest_source_partitioned()
        ds = cls(options={"path": f"{sf_dir}/events.parquet"})
        return ds.streamReader("ignored")

    def test_one_partition_per_day_fans_out(self, sf_dir):
        r = self._reader(sf_dir)
        start = r.initialOffset()
        end = r.latestOffset()
        parts = r.partitions(start, end)
        # the fan-out the simple reader cannot express: every day in
        # the planned range is its own executor task
        assert len(parts) == end["day_idx"] - start["day_idx"] > 1
        assert [p.day for p in parts] == r.days
        # latestOffset is the FULL available range, never a paced
        # process-local cursor: a paced cursor regresses after a
        # checkpoint restart (offsets went backward in the log and the
        # stateful agg double-counted — see the factory docstring)
        assert r.latestOffset() == end

    def test_partition_read_matches_batch_slice(self, sf_dir):
        import datetime

        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        r = self._reader(sf_dir)
        parts = r.partitions(r.initialOffset(), r.latestOffset())
        got = pa.Table.from_batches(
            [b for p in parts for b in r.read(p)]
        )
        lo = datetime.datetime.combine(
            datetime.date.fromisoformat(parts[0].day), datetime.time.min
        )
        hi = datetime.datetime.combine(
            datetime.date.fromisoformat(parts[-1].day), datetime.time.min
        ) + datetime.timedelta(days=1)
        t = pq.read_table(f"{sf_dir}/events.parquet", columns=["ts"])
        n_want = pc.sum(
            pc.and_(
                pc.greater_equal(t["ts"], lo), pc.less(t["ts"], hi)
            ).cast("int64")
        ).as_py()
        assert got.num_rows == n_want
        assert got.schema.names == [
            "event_id", "ts_us", "user_id", "event_type", "value",
        ]

    def test_end_to_end_drain_equals_batch_aggregate(self, spark, sf_dir):
        import hashlib
        import shutil
        import tempfile

        from dc_moving_violations_cloud_etl_spark.streaming.source import (
            STREAM_SOURCE_PARTITIONED_NAME,
            make_daily_ingest_source_partitioned,
        )

        spark.dataSource.register(make_daily_ingest_source_partitioned())
        path = f"{sf_dir}/events.parquet"
        ckpt = tempfile.mkdtemp(prefix="part_ingest_ckpt_")
        name = (
            "part_ingest_"
            + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        )
        ev = (
            spark.readStream.format(STREAM_SOURCE_PARTITIONED_NAME)
            .option("path", path)
            .load()
            .withColumn("ts", F.timestamp_micros("ts_us"))
        )
        agg = ev.groupBy(
            F.date_format(F.date_trunc("month", "ts"), "yyyy-MM").alias(
                "event_month"
            )
        ).agg(F.count(F.lit(1)).alias("n_events"))
        try:
            q = (
                agg.writeStream.outputMode("complete")
                .format("memory")
                .queryName(name)
                .trigger(processingTime="0 seconds")
                .option("checkpointLocation", ckpt)
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
            got = {
                (r.event_month, r.n_events)
                for r in spark.table(name).collect()
            }
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)
            spark.catalog.dropTempView(name)
        want = {
            (r.event_month, r.n_events)
            for r in spark.read.parquet(path)
            .groupBy(
                F.date_format(F.date_trunc("month", "ts"), "yyyy-MM").alias(
                    "event_month"
                )
            )
            .agg(F.count(F.lit(1)).alias("n_events"))
            .collect()
        }
        assert got == want

    def test_restart_from_checkpoint_is_exactly_once(self, spark, sf_dir):
        """Stop the stream mid-drain, restart a FRESH reader against
        the SAME checkpoint, drain, and require the exact batch
        aggregate — the restart scenario that exposed the paced-cursor
        offset regression (offsets going backward re-planned an
        applied range and double-counted rows in the stateful agg)."""
        import hashlib
        import shutil
        import tempfile
        import time

        from dc_moving_violations_cloud_etl_spark.streaming.source import (
            STREAM_SOURCE_PARTITIONED_NAME,
            make_daily_ingest_source_partitioned,
        )

        spark.dataSource.register(make_daily_ingest_source_partitioned())
        path = f"{sf_dir}/events.parquet"
        ckpt = tempfile.mkdtemp(prefix="part_ingest_restart_")

        def start(name):
            ev = (
                spark.readStream.format(STREAM_SOURCE_PARTITIONED_NAME)
                .option("path", path)
                .load()
                .withColumn("ts", F.timestamp_micros("ts_us"))
            )
            agg = ev.groupBy(
                F.date_format(
                    F.date_trunc("month", "ts"), "yyyy-MM"
                ).alias("event_month")
            ).agg(F.count(F.lit(1)).alias("n_events"))
            return (
                agg.writeStream.outputMode("complete")
                .format("memory")
                .queryName(name)
                .trigger(processingTime="0 seconds")
                .option("checkpointLocation", ckpt)
                .start()
            )

        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        try:
            q1 = start(f"pir_a_{tag}")
            # stop as soon as the first trigger has made ANY progress:
            # the in-flight batch may be journalled but uncommitted
            deadline = time.time() + 60
            while not q1.recentProgress and time.time() < deadline:
                time.sleep(0.1)
            q1.stop()
            q2 = start(f"pir_b_{tag}")
            try:
                q2.processAllAvailable()
            finally:
                q2.stop()
            # complete-mode memory sinks are written once per COMMITTED
            # batch: if q1's only batch committed before the stop, q2
            # finds no new data and its sink stays empty (exactly-once,
            # nothing to replay); if the stop beat the commit, q2
            # replays the journalled batch and its sink holds the full
            # aggregate. Either way the LATEST non-empty sink must be
            # the exact batch aggregate — never a double-counted one.
            got = {
                (r.event_month, r.n_events)
                for r in spark.table(f"pir_b_{tag}").collect()
            } or {
                (r.event_month, r.n_events)
                for r in spark.table(f"pir_a_{tag}").collect()
            }
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)
            for v in (f"pir_a_{tag}", f"pir_b_{tag}"):
                try:
                    spark.catalog.dropTempView(v)
                except Exception:  # noqa: BLE001
                    pass
        want = {
            (r.event_month, r.n_events)
            for r in spark.read.parquet(path)
            .groupBy(
                F.date_format(F.date_trunc("month", "ts"), "yyyy-MM").alias(
                    "event_month"
                )
            )
            .agg(F.count(F.lit(1)).alias("n_events"))
            .collect()
        }
        assert got == want


class TestPagedApiPushdown:
    """pushFilters contract of the custom batch source
    (sources/paged_api.py): equality filters absorbed, others yielded
    back for Spark-side evaluation."""

    def _reader(self, sf_dir):
        from dc_moving_violations_cloud_etl_spark.sources.paged_api import (
            make_paged_events_source,
        )

        ds = make_paged_events_source()(
            options={"path": f"{sf_dir}/events.parquet"}
        )
        return ds.reader("ignored")

    def test_equality_absorbed_others_returned(self, sf_dir):
        from pyspark.sql.datasource import EqualTo, GreaterThan

        r = self._reader(sf_dir)
        eq = EqualTo(("event_type",), "error")
        gt = GreaterThan(("value",), 1.0)
        remaining = list(r.pushFilters([eq, gt]))
        assert remaining == [gt], "only the equality may be absorbed"
        assert r.pushed_eq == [("event_type", "error")]

    def test_pushed_filter_reduces_page_rows(self, sf_dir):
        from pyspark.sql.datasource import EqualTo

        r_all = self._reader(sf_dir)
        r_push = self._reader(sf_dir)
        list(r_push.pushFilters([EqualTo(("event_type",), "error")]))
        part = r_all.partitions()[0]
        n_all = sum(b.num_rows for b in r_all.read(part))
        n_err = sum(b.num_rows for b in r_push.read(part))
        assert 0 < n_err < n_all, "filter must act inside the page fetch"


class TestPagedApiSparseKeys:
    """r10: page planning follows the storage layout (row-group footer
    stats), so a sparse key domain — e.g. the scale harness's 2^33
    id-offset copies — plans pages that track the DATA. The pre-r10
    fixed-width key-range plan emitted one page per 2000 keys of
    [0, max_id] and OOM'd the JVM on the pickled partition list."""

    def _reader(self, path, page_size=2000):
        from dc_moving_violations_cloud_etl_spark.sources.paged_api import (
            make_paged_events_source,
        )

        ds = make_paged_events_source()(
            options={"path": str(path), "pageSize": str(page_size)}
        )
        return ds.reader("ignored")

    def _write(self, tmp_path, ids, row_group_size, sort=True):
        import pyarrow as pa
        import pyarrow.parquet as pq

        if sort:
            ids = sorted(ids)
        n = len(ids)
        t = pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts": pa.array([1_700_000_000_000_000 + i for i in range(n)], pa.timestamp("us")),
                "user_id": pa.array([i % 7 for i in range(n)], pa.int64()),
                "event_type": pa.array(["error" if i % 3 == 0 else "view" for i in range(n)]),
                "value": pa.array([float(i) for i in range(n)]),
            }
        )
        p = tmp_path / "events_sparse.parquet"
        pq.write_table(t, p, row_group_size=row_group_size)
        return p

    def test_sparse_sorted_pages_track_data_not_key_domain(self, tmp_path):
        # 5 "copies" of 1000 dense ids, each offset by 2^33: the old
        # plan would emit ~21M pages; the layout plan must emit ~5
        ids = [k * (1 << 33) + i for k in range(5) for i in range(1000)]
        p = self._write(tmp_path, ids, row_group_size=1000)
        r = self._reader(p, page_size=1000)
        pages = r.partitions()
        assert len(pages) <= 10, f"planned {len(pages)} pages for 5k rows"
        # every row is fetched exactly once across the page tiling
        got = sorted(
            x
            for part in pages
            for b in r.read(part)
            for x in b.column("event_id").to_pylist()
        )
        assert got == sorted(ids)

    def _read_pairs(self, r, pages):
        # (event_id, page_id) per row across the full page plan
        return sorted(
            (e, g)
            for part in pages
            for b in r.read(part)
            for e, g in zip(
                b.column("event_id").to_pylist(),
                b.column("page_id").to_pylist(),
            )
        )

    def test_dense_sorted_pages_match_key_range_identity(self, tmp_path):
        # a guaranteed MULTI-page dense fixture (the r10 review found
        # the staged-sf-fixture variant vacuous at sf0.001: one page,
        # so the non-final-page assertion checked an empty slice): 6000
        # dense ids in 2000-row groups at pageSize 2000 -> 3 pages,
        # lo-aligned, and every ROW carries page_id == event_id // 2000
        p = self._write(tmp_path, list(range(6000)), row_group_size=2000)
        r = self._reader(p, page_size=2000)
        pages = r.partitions()
        assert len(pages) == 3
        assert all(p_.lo % 2000 == 0 for p_ in pages)
        pairs = self._read_pairs(r, pages)
        assert pairs == [(e, e // 2000) for e in range(6000)]

    def test_gapped_keys_keep_oracle_page_identity(self, tmp_path):
        # r10 review repro: ids 0..999 and 3000..3999 (a key GAP) must
        # yield exactly the oracle's count(DISTINCT event_id // 2000)
        # = 2 logical pages, regardless of how fetches are planned —
        # the pre-fix planner labeled all rows with the fetch's
        # lo-derived page_id and read 1 distinct page
        ids = list(range(1000)) + list(range(3000, 4000))
        p = self._write(tmp_path, ids, row_group_size=2000)
        r = self._reader(p, page_size=2000)
        pages = r.partitions()
        pairs = self._read_pairs(r, pages)
        assert [e for e, _ in pairs] == ids
        assert sorted({g for _, g in pairs}) == [0, 1]
        assert all(g == e // 2000 for e, g in pairs)

    def test_coarse_row_group_splits_into_parallel_fetches(self, tmp_path):
        # r10 review repro: a single 10k-row row group (the raw-fixture
        # shape) must not collapse to ONE fetch task — the planner
        # splits a coarse group into ~rows/pageSize key slices
        p = self._write(tmp_path, list(range(10_000)), row_group_size=10_000)
        r = self._reader(p, page_size=2000)
        pages = r.partitions()
        assert len(pages) >= 5, f"coarse group planned {len(pages)} fetch(es)"
        pairs = self._read_pairs(r, pages)  # exactly-once + identity
        assert pairs == [(e, e // 2000) for e in range(10_000)]

    def test_duplicate_keys_read_exactly_once(self, tmp_path):
        # duplicate-heavy layout (row-group mins repeat): ranges still
        # tile disjointly, so every row is read exactly once and all
        # copies of a key share its key-derived page_id
        ids = sorted(list(range(1000)) * 4)
        p = self._write(tmp_path, ids, row_group_size=2000)
        r = self._reader(p, page_size=2000)
        pages = r.partitions()
        assert all(p_.lo < p_.hi for p_ in pages), "empty-range fetch planned"
        pairs = self._read_pairs(r, pages)
        assert [e for e, _ in pairs] == ids
        assert all(g == 0 for _, g in pairs)

    def test_unsorted_sparse_fails_with_diagnosis_not_oom(self, tmp_path):
        import pytest as _pytest

        ids = [((i * 2654435761) % (1 << 40)) for i in range(4000)]
        p = self._write(tmp_path, ids, row_group_size=500, sort=False)
        r = self._reader(p, page_size=2000)
        with _pytest.raises(ValueError, match="plans .* pages"):
            r.partitions()


class TestPushdownWhitelist:
    """Equality filters on COMPUTED columns (page_id, ts_us) must yield
    back to Spark: absorbing them hands pyarrow a FieldRef the backing
    file doesn't have and fails every task (r10 review finding)."""

    def test_computed_columns_yield_back_physical_absorb(self, sf_dir):
        from pyspark.sql.datasource import EqualTo

        from dc_moving_violations_cloud_etl_spark.sources.paged_api import (
            make_paged_events_source,
            paged_fixture_path,
        )

        ds = make_paged_events_source()(
            options={"path": paged_fixture_path(sf_dir)}
        )
        r = ds.reader("ignored")
        back = list(
            r.pushFilters(
                [
                    EqualTo(("page_id",), 3),
                    EqualTo(("ts_us",), 1),
                    EqualTo(("event_type",), "error"),
                ]
            )
        )
        assert [f.attribute[0] for f in back] == ["page_id", "ts_us"]
        assert r.pushed_eq == [("event_type", "error")]
        # and the fetch still executes with the absorbed filter
        part = r.partitions()[0]
        n = sum(b.num_rows for b in r.read(part))
        assert n >= 0
