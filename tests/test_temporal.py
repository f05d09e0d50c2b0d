"""Unit tests for the temporal operators (operators/temporal.py):
as-of join directions/tolerance and session_window sessionization.
DuckDB oracle parity (native ASOF JOIN / gaps-and-islands) runs in
test_entry.py."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from logdag_spark.operators.temporal import asof_join, sessionize


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 00:00:00"), 1.0),
            ("a", _ts("2024-01-01 00:10:00"), 2.0),
            ("b", _ts("2024-01-01 00:05:00"), 9.0),
        ],
        "key string, ts timestamp, px double",
    )


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01 00:04:00")),
            (2, "a", _ts("2024-01-01 00:10:00")),  # tie -> matches
            (3, "a", _ts("2024-01-01 00:30:00")),
            (4, "b", _ts("2024-01-01 00:01:00")),  # before any quote
            (5, "c", _ts("2024-01-01 00:01:00")),  # key with no quotes
        ],
        "tid long, key string, ts timestamp",
    )


def test_asof_backward(spark, trades, quotes):
    out = {
        r["tid"]: (r["ts_r"], r["px_r"])
        for r in asof_join(trades, quotes, on="key").collect()
    }
    assert out[1] == (_ts("2024-01-01 00:00:00"), 1.0)
    assert out[2] == (_ts("2024-01-01 00:10:00"), 2.0)  # <= includes ties
    assert out[3] == (_ts("2024-01-01 00:10:00"), 2.0)
    assert out[4] == (None, None)
    assert out[5] == (None, None)


def test_asof_forward_and_tolerance(spark, trades, quotes):
    fwd = {
        r["tid"]: r["px_r"]
        for r in asof_join(trades, quotes, on="key", direction="forward").collect()
    }
    assert fwd == {1: 2.0, 2: 2.0, 3: None, 4: 9.0, 5: None}
    tol = {
        r["tid"]: r["px_r"]
        for r in asof_join(trades, quotes, on="key", tolerance_s=300).collect()
    }
    # trade 3 is 20 min after the last quote -> voided by the 5-min tolerance
    assert tol == {1: 1.0, 2: 2.0, 3: None, 4: None, 5: None}


def test_asof_join_no_row_multiplication(spark, trades, quotes):
    assert asof_join(trades, quotes, on="key").count() == trades.count()


def test_sessionize_gap_semantics(spark):
    rows = [
        ("u1", _ts("2024-01-01 00:00:00"), 1.0),
        ("u1", _ts("2024-01-01 00:20:00"), 2.0),   # same session (<30m)
        ("u1", _ts("2024-01-01 01:10:00"), 4.0),   # 50m gap -> new session
        ("u2", _ts("2024-01-01 00:00:00"), 8.0),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, value double")
    out = sessionize(
        df, gap="30 minutes",
        aggs=[F.sum("value").alias("total_val")],
    )
    got = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"], r["total_val"])
        for r in out.collect()
    }
    assert got[("u1", _ts("2024-01-01 00:00:00"))] == (
        _ts("2024-01-01 00:50:00"), 2, 3.0
    )
    assert got[("u1", _ts("2024-01-01 01:10:00"))] == (
        _ts("2024-01-01 01:40:00"), 1, 4.0
    )
    assert got[("u2", _ts("2024-01-01 00:00:00"))] == (
        _ts("2024-01-01 00:30:00"), 1, 8.0
    )


def test_interval_join_binned_equals_theta(spark):
    from logdag_spark.operators.temporal import interval_join

    pts = spark.createDataFrame(
        [(i, "k", float(i)) for i in range(50)],
        "pid long, key string, ts double",
    )
    iv = spark.createDataFrame(
        [
            (100, "k", 3.0, 7.0),
            (101, "k", 6.5, 6.6),     # sub-bin interval
            (102, "k", 40.0, 49.0),
            (103, "k", 10.0, 9.0),    # end < start -> matches nothing
            (104, "z", 0.0, 100.0),   # other key
        ],
        "iid long, key string, start_ts double, end_ts double",
    )
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(pts, iv, on="key", point_ts="ts",
                               bin_width_s=5).collect()
    }
    want = {
        (p, i)
        for p in range(50)
        for (i, k, s, e) in [(100, "k", 3.0, 7.0), (101, "k", 6.5, 6.6),
                             (102, "k", 40.0, 49.0), (103, "k", 10.0, 9.0)]
        if s <= p <= e
    }
    assert got == want
    # inclusive bounds
    assert (3, 100) in got and (7, 100) in got


def test_interval_join_rejects_column_collision(spark):
    from logdag_spark.operators.temporal import interval_join

    pts = spark.createDataFrame([(1, "k", 1.0)], "x long, key string, ts double")
    iv = spark.createDataFrame(
        [(2, "k", 0.0, 2.0)], "x long, key string, start_ts double, end_ts double"
    )
    with pytest.raises(ValueError, match="collision"):
        interval_join(pts, iv, on="key")


def test_asof_tolerance_on_timestamp_ntz(spark, trades, quotes):
    """DuckDB-written parquet surfaces TIMESTAMP_NTZ, which cannot cast
    to double directly — the tolerance path must hop through TIMESTAMP."""
    tn = trades.withColumn(
        "ts", F.to_timestamp(F.col("ts")).cast("timestamp_ntz")
    )
    qn = quotes.withColumn(
        "ts", F.to_timestamp(F.col("ts")).cast("timestamp_ntz")
    )
    out = {
        r["tid"]: r["px_r"]
        for r in asof_join(tn, qn, on="key", tolerance_s=300).collect()
    }
    assert out == {1: 1.0, 2: 2.0, 3: None, 4: None, 5: None}


def test_asof_null_keys_never_match(spark):
    from logdag_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, None, 10.0), (2, "k", 10.0)], "tid long, key string, ts double"
    )
    right = spark.createDataFrame(
        [(None, 5.0, 99.0), ("k", 5.0, 7.0)], "key string, ts double, px double"
    )
    out = {r["tid"]: r["px_r"] for r in asof_join(left, right, on="key").collect()}
    # NULL keys never match (DuckDB ASOF / pandas merge_asof semantics);
    # the NULL-key left row survives unmatched
    assert out == {1: None, 2: 7.0}


def test_asof_empty_value_cols_means_timestamp_only(spark, trades, quotes):
    from logdag_spark.operators.temporal import asof_join

    out = asof_join(trades, quotes, on="key", value_cols=[])
    assert "px_r" not in out.columns and "ts_r" in out.columns
