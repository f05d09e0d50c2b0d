"""S2 — time-series file sources (RRD-archive replacement).

The reference fetches round-robin archives through the rrdtool client
(/root/reference/logdag/source/src_rrd.py:21-62): epoch-binned rows, one
float column per metric, with an optional round-up timestamp correction
that shifts bins one binsize earlier to align with syslog's rounded-down
timestamps.  On Spark the archive is a pre-exported wide CSV/parquet
(epoch + one column per metric); this module reads it and unpivots to the
engine's long routed-row shape
``(measure, host, key, ts, val)``.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _unpivot(
    df: DataFrame,
    host: str,
    measure: str,
    ts_col: str,
    correct_roundup: bool,
    binsize: timedelta,
    dt_range: tuple[datetime, datetime] | None,
) -> DataFrame:
    value_cols = [c for c in df.columns if c != ts_col]
    ts = F.col(ts_col).cast("timestamp")
    if correct_roundup:
        # src_rrd.py:33-37, :48-52 — shift the rounded-up archive bins
        # one binsize earlier to match rounded-down syslog time
        ts = ts - F.expr(f"INTERVAL {int(binsize.total_seconds())} seconds")
    long = (
        df.select(ts.alias("ts"), *value_cols)
        .unpivot("ts", value_cols, "key", "val")
        .select(
            F.lit(measure).alias("measure"),
            F.lit(host).alias("host"),
            "key",
            "ts",
            F.col("val").cast("double").alias("val"),
        )
        .where(F.col("val").isNotNull() & ~F.isnan("val"))
    )
    if dt_range:
        long = long.where(
            (F.col("ts") >= F.lit(dt_range[0])) & (F.col("ts") < F.lit(dt_range[1]))
        )
    return long


def read_series_csv(
    spark: SparkSession,
    path: str,
    host: str,
    measure: str = "snmp_feature",
    ts_col: str = "ts",
    correct_roundup: bool = False,
    binsize: timedelta = timedelta(minutes=1),
    dt_range: tuple[datetime, datetime] | None = None,
) -> DataFrame:
    df = spark.read.csv(path, header=True, inferSchema=True)
    return _unpivot(df, host, measure, ts_col, correct_roundup, binsize, dt_range)


def read_series_parquet(
    spark: SparkSession,
    path: str,
    host: str,
    measure: str = "snmp_feature",
    ts_col: str = "ts",
    correct_roundup: bool = False,
    binsize: timedelta = timedelta(minutes=1),
    dt_range: tuple[datetime, datetime] | None = None,
) -> DataFrame:
    df = spark.read.parquet(path)
    return _unpivot(df, host, measure, ts_col, correct_roundup, binsize, dt_range)
