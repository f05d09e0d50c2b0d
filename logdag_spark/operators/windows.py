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
    """W7 (evpost.py:59-63): 1 where value > median + th (additive
    threshold, matching the reference exactly)."""
    med = F.expr("percentile(val, 0.5)").over(series_frame(keys))
    return (F.col("val") > med + th).cast("double")


def outlier_mad(df: DataFrame, th: float = 2.0, keys=("measure", "host", "key")) -> DataFrame:
    """W7b (evpost.py:66-71): 1 where value > MAD + th, with
    MAD = median(|x - median(x)|).  The reference compares the RAW value
    (not the deviation) against an additive threshold — reproduced
    exactly.  Two window passes (median, then deviation median) as a
    DataFrame transform."""
    w = series_frame(keys)
    med = F.expr("percentile(val, 0.5)").over(w)
    step = df.withColumn("_med", med).withColumn("_dev", F.abs(F.col("val") - F.col("_med")))
    mad = F.expr("percentile(_dev, 0.5)").over(Window.partitionBy(*keys))
    return (
        step.withColumn("_mad", mad)
        .withColumn(
            "outlier",
            (F.col("val") > F.col("_mad") + th).cast("double"),
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


def _lof_flags(xy, k: int = 20, offset: float = 1.5):
    """Local Outlier Factor anomaly flags, numpy re-derivation of the
    standard LOF definition the reference gets from sklearn
    (evpost.py:74-86): k-distance -> reachability distance -> local
    reachability density -> LOF ratio; anomaly where LOF > 1.5
    (sklearn's contamination="auto" offset).  O(n^2) distance matrix per
    series — series are bin-length vectors, so a few MB at most."""
    import numpy as np

    n = len(xy)
    if n <= 1:
        return np.zeros(n)
    k = min(k, n - 1)
    d = np.sqrt(((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1))
    np.fill_diagonal(d, np.inf)
    nn_idx = np.argpartition(d, k - 1, axis=1)[:, :k]
    rows = np.arange(n)[:, None]
    k_dist = np.partition(d, k - 1, axis=1)[:, k - 1]
    reach = np.maximum(k_dist[nn_idx], d[rows, nn_idx])
    with np.errstate(divide="ignore", invalid="ignore"):
        lrd = 1.0 / reach.mean(axis=1)
        lof = (lrd[nn_idx].mean(axis=1)) / lrd
    # duplicate-heavy neighborhoods give inf/inf -> treat as inlier
    lof = np.nan_to_num(lof, nan=1.0, posinf=np.inf, neginf=1.0)
    return (lof > offset).astype(float)


def _iforest_flags(xy, seed: int, n_trees: int = 100, max_samples: int = 256):
    """Isolation-forest anomaly flags, numpy re-derivation of the
    reference's sklearn IsolationForest (evpost.py:89-104): mean
    isolation path length vs the BST average-path normalizer c(psi);
    anomaly where the normalized score 2^(-E[h]/c) > 0.5 — exactly
    sklearn's contamination="auto" threshold (offset_ = -0.5).
    Deterministic per series via the caller-supplied seed."""
    import numpy as np

    n = len(xy)
    if n == 0:
        return np.zeros(0)
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    psi = min(max_samples, n)

    def c(m):
        if m <= 1:
            return 0.0
        h = np.log(m - 1) + 0.5772156649
        return 2.0 * h - 2.0 * (m - 1) / m

    max_depth = int(np.ceil(np.log2(max(psi, 2))))
    depths = np.zeros(n)

    def grow(idx_tree, idx_all, depth):
        # idx_tree: sample indices defining splits; idx_all: every point
        # routed through this node (all points get a path length)
        if depth >= max_depth or len(idx_tree) <= 1:
            depths[idx_all] += depth + c(len(idx_tree))
            return
        f = rng.randint(xy.shape[1])
        lo, hi = xy[idx_tree, f].min(), xy[idx_tree, f].max()
        if lo == hi:
            depths[idx_all] += depth + c(len(idx_tree))
            return
        split = rng.uniform(lo, hi)
        lmask_t = xy[idx_tree, f] < split
        lmask_a = xy[idx_all, f] < split
        grow(idx_tree[lmask_t], idx_all[lmask_a], depth + 1)
        grow(idx_tree[~lmask_t], idx_all[~lmask_a], depth + 1)

    all_idx = np.arange(n)
    for _ in range(n_trees):
        sample = rng.choice(n, size=psi, replace=False) if n > psi else all_idx
        grow(sample, all_idx, 0)
    mean_depth = depths / n_trees
    scores = 2.0 ** (-mean_depth / c(psi))
    return (scores > 0.5).astype(float)


def anomaly_kernel(
    df: DataFrame, method: str = "lof", keys=("measure", "host", "key")
) -> DataFrame:
    """W8 (evpost.py:74-104): per-series anomaly flags via LOF or
    isolation forest over the (value, first-difference) plane — the
    reference's feature construction (evpost.py:76-79, 95-98) — as a
    grouped-map kernel.  ``val`` is replaced by the 0/1 anomaly flag.
    numpy re-derivations (sklearn is absent here); deterministic: the
    isolation forest seeds from the series key."""
    import pandas as pd
    import zlib

    if method not in ("lof", "iforest"):
        raise ValueError(f"unknown anomaly method {method!r}")
    schema = df.schema
    key_list = list(keys)

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("ts").reset_index(drop=True)
        x = pdf["val"].to_numpy(dtype=float)
        y = np.diff(x, prepend=x[0] if len(x) else 0.0)
        xy = np.column_stack([x, y])
        if method == "lof":
            flags = _lof_flags(xy)
        else:
            if not (x != 0).any():
                # all-zero series: IF would flag everything (evpost.py:90-94)
                flags = np.zeros(len(x))
            else:
                seed = zlib.crc32(
                    "|".join(str(pdf[k].iloc[0]) for k in key_list).encode()
                )
                flags = _iforest_flags(xy, seed)
        pdf["val"] = flags
        return pdf

    return df.groupBy(*key_list).applyInPandas(kern, schema)
