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

    def test_offsets_advance_to_exhaustion_in_multiple_batches(self, sf_dir):
        r = self._reader(sf_dir)
        off = r.initialOffset()
        assert off == {"day_idx": 0}
        batches = 0
        total = 0
        while True:
            rows, nxt = r.read(off)
            n = sum(1 for _ in rows)
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
        r = self._reader(sf_dir)
        start = r.initialOffset()
        rows1, end = r.read(start)
        first = sorted(rows1)
        replay = sorted(r.readBetweenOffsets(start, end))
        assert replay == first, "readBetweenOffsets must replay exactly"


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
