"""S2 series source: wide archive -> long routed rows, round-up shift."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from logdag_spark.sources import read_series_csv


def test_read_series_csv(spark, tmp_path):
    p = tmp_path / "arch.csv"
    p.write_text(
        "ts,cpu,mem\n"
        "2024-01-01T00:01:00,1.5,\n"
        "2024-01-01T00:02:00,2.5,7.0\n"
        "2024-01-01T00:03:00,,8.0\n"
    )
    out = read_series_csv(
        spark, str(p), host="h1", correct_roundup=True,
        binsize=timedelta(minutes=1),
    )
    rows = {(r["key"], r["ts"].minute, r["val"]) for r in out.collect()}
    # round-up correction shifts every bin one minute earlier; NaN dropped
    assert rows == {("cpu", 0, 1.5), ("cpu", 1, 2.5), ("mem", 1, 7.0), ("mem", 2, 8.0)}
    assert out.columns == ["measure", "host", "key", "ts", "val"]
