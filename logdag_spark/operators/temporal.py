"""Temporal join/window operators the reference lacks but a telemetry /
training-data pipeline needs: as-of joins (attach the most recent
dimension snapshot / sensor reading to each event) and sessionization
(gap-based event grouping, the unit of user-activity training examples).

Both are compositions of built-in DataFrame operators — no UDFs:

* ``asof_join`` — Spark has no ASOF JOIN; a naive implementation joins
  on key with ``r.ts <= l.ts`` and ranks (an O(|L|·|R|) explosion per
  key before the filter).  The scale-safe shape is union + sorted
  carry-forward: tag both sides, union, one window per key ordered by
  (ts, side) carrying the last right-side payload forward, keep left
  rows.  ONE shuffle on the key, rows never multiply, and Catalyst
  pipelines the window with the downstream projection.  DuckDB's native
  ASOF JOIN is the oracle.
* ``sessionize`` — ``F.session_window`` (the engine-native session
  operator, identical semantics in batch and Structured Streaming);
  the oracle replicates it as SQL gaps-and-islands (boundary where
  ``ts - lag(ts) > gap``, session end = last event + gap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _epoch_seconds(df: DataFrame, colname: str) -> Column:
    """Numeric seconds from a numeric or timestamp column.  TIMESTAMP_NTZ
    (what DuckDB-written parquet surfaces) cannot cast to double
    directly — route it through TIMESTAMP first (session TZ applies
    uniformly to every column involved, so relative arithmetic is
    unaffected)."""
    t = dict(df.dtypes)[colname]
    c = F.col(colname)
    if t.startswith("timestamp"):
        c = c.cast("timestamp")
    return c.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_s: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` on the same key(s) (``backward``; ties at
    equal timestamps match), or the least ``right_ts`` >= ``left_ts``
    (``forward``).  ``tolerance_s`` voids matches farther than that many
    seconds away (the matched columns become NULL, like pandas
    ``merge_asof``).

    Output: all left columns, plus ``<right_ts><suffix>`` (the matched
    timestamp) and each value column as ``<name><suffix>``.

    Rows with duplicate (key, right_ts) pairs on the RIGHT side make the
    match ambiguous — the carried payload is whichever sorts last within
    the equal-timestamp run, which Spark does not define; deduplicate the
    right side first (e.g. ``max_by`` per (key, ts)) if that can occur.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    reserved = {"_ts", "_side", "_pl", "_m"} & set(left.columns)
    if reserved:
        raise ValueError(f"left columns {sorted(reserved)} collide with internals")
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in keys and c != right_ts]
    overlap = [c for c in [*value_cols, right_ts] if c + suffix in left.columns]
    if overlap:
        raise ValueError(f"suffixed column(s) {overlap} already exist in left")

    # payload struct: carried as ONE last() over the window (ignorenulls
    # skips left rows), so every matched column stays from the SAME
    # right row — per-column last() could mix rows if nulls appeared in
    # right values
    payload = F.struct(
        F.col(right_ts).alias("_mts"), *[F.col(c) for c in value_cols]
    )
    # NULL join keys never match in ASOF/equi semantics (DuckDB, pandas
    # merge_asof) — but the carry-forward window PARTITIONS NULLs
    # together, which would fabricate NULL-to-NULL matches; dropping
    # NULL-key right rows leaves NULL-key left rows unmatched instead
    for k in keys:
        right = right.where(F.col(k).isNotNull())
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        payload.alias("_pl"),
    )
    l = left.select(
        "*", F.col(left_ts).alias("_ts"), F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_pl"].dataType).alias("_pl"),
    )
    # forward = backward on negated time: sort descending and carry the
    # NEXT right row; _side still orders right rows before left at ties
    order = [F.col("_ts").desc() if direction == "forward" else F.col("_ts").asc(),
             F.col("_side").asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        l.unionByName(r.select(*keys, "_ts", "_side", "_pl"), allowMissingColumns=True)
        .withColumn("_m", F.last("_pl", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    if tolerance_s is not None:
        # TIMESTAMP_NTZ needs the TIMESTAMP hop before a numeric cast
        def num(c: Column, dtype: str) -> Column:
            return (c.cast("timestamp") if dtype.startswith("timestamp") else c).cast(
                "double"
            )

        dist = F.abs(
            num(F.col("_m._mts"), dict(right.dtypes)[right_ts])
            - num(F.col("_ts"), dict(left.dtypes)[left_ts])
        )
        carried = carried.withColumn(
            "_m", F.when(dist <= tolerance_s, F.col("_m"))
        )
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col("_m._mts").alias(right_ts + suffix))
    out_cols.extend(F.col(f"_m.{c}").alias(c + suffix) for c in value_cols)
    return carried.select(*out_cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str] | None = None,
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bin_width_s: int = 3600,
) -> DataFrame:
    """Range (interval-containment) join: every (point, interval) pair
    on the same key(s) with ``start <= point <= end`` — inclusive both
    ends.  Output: all point columns + all interval columns (names must
    not collide apart from the keys).

    Spark plans a raw BETWEEN theta-join as a nested-loop / cartesian
    per key group — O(|P|·|I|) compares even when almost nothing
    overlaps.  The scale shape is binning: each interval is exploded to
    the time bins it covers (``length/bin_width + 1`` rows), each point
    belongs to exactly ONE bin, and the join becomes an equi-join on
    (keys, bin) followed by the exact BETWEEN filter.  No dedup is
    needed — a pair can only meet in the point's unique bin.  Pick
    ``bin_width_s`` near the median interval length: wider bins raise
    per-bin fan-in (more false candidates filtered after the join),
    narrower bins replicate each interval into more rows.
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    if "_bin" in points.columns or "_bin" in intervals.columns:
        raise ValueError("column '_bin' collides with an internal column")
    overlap_cols = (set(points.columns) & set(intervals.columns)) - set(keys)
    if overlap_cols:
        raise ValueError(
            f"point/interval column collision {sorted(overlap_cols)}: "
            "rename or drop before joining"
        )
    w = F.lit(int(bin_width_s))
    # end < start can't match anything, but sequence() would step
    # DOWNWARD through bins and replicate the row anyway — drop first
    intervals = intervals.where(F.col(end_col) >= F.col(start_col))
    ibin = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(_epoch_seconds(intervals, start_col) / w).cast("long"),
                F.floor(_epoch_seconds(intervals, end_col) / w).cast("long"),
            )
        ),
    )
    p = points.withColumn(
        "_bin", F.floor(_epoch_seconds(points, point_ts) / w).cast("long")
    )
    out = p.join(ibin, [*keys, "_bin"]).where(
        F.col(point_ts).between(F.col(start_col), F.col(end_col))
    )
    return out.drop("_bin")


def sessionize(
    df: DataFrame,
    gap: str = "30 minutes",
    key_cols: list[str] | tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Gap-based sessions per key via ``F.session_window`` — the
    engine-native operator (hash-aggregate with session merge; the SAME
    call sessionizes a watermarked stream).  A session extends while
    consecutive events arrive within ``gap``; its end is the last event
    + gap.

    Output: key cols, session_start, session_end, n_events, plus any
    extra aggregate columns supplied in ``aggs``.

    The session bounds are emitted through a predicate-pushdown FENCE:
    Catalyst treats ``session_window`` as an ordinary grouping
    expression and pushes a downstream ``session_end < X`` filter into
    the INPUT as ``ts + gap < X`` — sound for tumbling windows, UNSOUND
    for sessions, where it truncates every straddling session into a
    ghost that never exists in the unfiltered result (observed live: 7
    fabricated sessions from 7 real ones that all ended past the cut).
    The emitted bounds are therefore wrapped in an always-true branch on
    ``n_events`` — an AGGREGATE output, which no predicate can be pushed
    past — keeping values bit-identical while making them ineligible for
    pushdown.  (A ``rand()``-based fence does not survive: the optimizer
    folds always-true rand comparisons away.)
    """
    aggs = aggs or []
    grouped = df.groupBy(
        *key_cols, F.session_window(F.col(ts_col), gap).alias("_w")
    ).agg(F.count("*").alias("n_events"), *aggs)
    extra = [
        c for c in grouped.columns
        if c not in set(key_cols) | {"_w", "n_events"}
    ]

    def fence(c: Column) -> Column:
        return F.when(F.col("n_events") >= 0, c)

    return grouped.select(
        *key_cols,
        fence(F.col("_w.start")).alias("session_start"),
        fence(F.col("_w.end")).alias("session_end"),
        "n_events",
        *extra,
    )
