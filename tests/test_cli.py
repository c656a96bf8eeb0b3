"""The application entry points (cli.py) — history load, idempotent
daily load, and query listing, against a temp warehouse."""

import pathlib

from dc_moving_violations_cloud_etl_spark.cli import main


def test_history_then_daily_load_is_idempotent(spark, sf_dir, tmp_path, capsys):
    wh = str(tmp_path / "wh")
    assert main(["history-load", "--sf-dir", sf_dir, "--warehouse", wh]) == 0
    out1 = capsys.readouterr().out
    assert "history-load complete" in out1
    assert (pathlib.Path(wh) / "violations").is_dir()

    # replay: the incremental load at the current watermark inserts 0
    assert main(["daily-load", "--sf-dir", sf_dir, "--warehouse", wh]) == 0
    out2 = capsys.readouterr().out
    assert "inserted=0" in out2


def test_list_names_every_registered_query(capsys):
    from dc_moving_violations_cloud_etl_spark.queries import get_queries

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    for name in get_queries():
        assert name in out
