"""Distributed scan (prefix-sum) primitives.

A global running total by some order is the classic single-task trap: a
window partitioned by nothing (or by a low-cardinality column like
``source``) funnels every row through one task regardless of cluster
size.  The scale-safe shape is the textbook two-pass scan:

1. rows are sliced into ORDER-ALIGNED shards (``floor(order / width)``
   — deterministic, data-independent, unlike ``spark_partition_id()``
   which changes with the physical plan);
2. each shard computes its local prefix sums in parallel (window
   partitioned by shard);
3. shard TOTALS — one row per shard — get their own tiny cumulative
   window and are broadcast-joined back as offsets.

Pass 3's window is still one task per ``part_cols`` group, but over
|shards| rows, not |rows| — the caller sizes ``shard_width`` so shards
number in the thousands.  Results are exact and identical at any
parallelism.  Consumers here: ``token_budget_filter`` (stop ingesting a
source once its token budget is spent) and the strict-order mode of
``text.pack_sequences``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _check_reserved(df: DataFrame, out_cols: set[str]) -> None:
    """Raise on input columns that collide with scan internals (including
    the ``_o_``-prefixed offset-key aliases, which the final drop would
    otherwise silently remove from the user's frame)."""
    reserved = ({"_shard", "_offset", "_shard_agg"} | out_cols) & set(df.columns)
    reserved |= {c for c in df.columns if c.startswith("_o_")}
    if reserved:
        raise ValueError(f"columns {sorted(reserved)} collide with scan internals")


def _join_shard_offsets(
    sharded: DataFrame,
    part_cols: tuple[str, ...],
    per_shard_agg: F.Column,
    total_col: str | None = None,
) -> tuple[DataFrame, list[str]]:
    """Shared pass-2/3 of the two-pass scan: aggregate one row per
    ``(part_cols, _shard)`` via ``per_shard_agg``, give the shard totals
    a tiny exclusive cumulative window, and broadcast-join them back as
    ``_offset`` (null-safe on every key, so NULL groups/shards survive
    like the single-window equivalent would).  When ``total_col`` is
    set, the per-GROUP total — a full-partition sum over the same tiny
    frame, zero extra corpus scans — rides along under that name.
    Returns (joined frame, helper columns for the caller to drop).
    """
    totals = sharded.groupBy(*part_cols, "_shard").agg(
        per_shard_agg.alias("_shard_agg")
    )
    w_sh = (
        Window.partitionBy(*part_cols)
        .orderBy("_shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    keys = [*part_cols, "_shard"]
    extra = []
    if total_col is not None:
        w_all = Window.partitionBy(*part_cols)
        extra = [F.sum("_shard_agg").over(w_all).alias(total_col)]
    offsets = totals.select(
        *[F.col(c).alias(f"_o_{c}") for c in keys],
        F.coalesce(F.sum("_shard_agg").over(w_sh), F.lit(0)).alias("_offset"),
        *extra,
    )
    cond = None
    for k in keys:
        eq = sharded[k].eqNullSafe(offsets[f"_o_{k}"])
        cond = eq if cond is None else cond & eq
    joined = sharded.join(F.broadcast(offsets), cond)
    return joined, ["_shard", "_offset", *[f"_o_{k}" for k in keys]]


def partitioned_prefix_sum(
    df: DataFrame,
    val_col: str,
    order_col: str,
    part_cols: tuple[str, ...] = (),
    shard_width: int = 1_000_000,
    out_col: str = "prefix_sum",
    inclusive: bool = False,
) -> DataFrame:
    """Exact prefix sum of ``val_col`` by ``order_col`` order within each
    ``part_cols`` group (exclusive by default), without a global window.

    ``order_col`` must be numeric/integral (shards are
    ``floor(order / shard_width)``); ``order_col`` values must be unique
    per group for the sum to be well-defined.  Adds ``out_col`` (long).

    NULL keys survive: the offset join is null-safe (``eqNullSafe``), so
    rows with a NULL ``part_cols`` value (or a NULL order, which shards
    to NULL) keep flowing through exactly like the single-window
    equivalent, which groups NULLs together — a plain inner equi-join
    would silently DROP them.
    """
    _check_reserved(df, {out_col})
    bucket = F.floor(F.col(order_col) / F.lit(int(shard_width))).cast("long")
    sharded = df.withColumn("_shard", bucket)
    bound = 0 if inclusive else -1
    w_in = (
        Window.partitionBy(*part_cols, "_shard")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, bound)
    )
    within = F.coalesce(F.sum(F.col(val_col).cast("long")).over(w_in), F.lit(0))
    joined, helper = _join_shard_offsets(
        sharded, part_cols, F.sum(F.col(val_col).cast("long"))
    )
    return joined.withColumn(
        out_col, (F.col("_offset") + within).cast("long")
    ).drop(*helper)


def partitioned_rank(
    df: DataFrame,
    sort_col: str,
    id_col: str,
    part_cols: tuple[str, ...] = (),
    shard_width: int = 1 << 24,
    out_col: str = "rank",
    total_col: str | None = None,
) -> DataFrame:
    """Exact 1-based rank by ``(sort_col ASC, id_col ASC)`` within each
    ``part_cols`` group — ``row_number()`` semantics — without a
    group-wide window.

    The classic quota/top-k trap is ``row_number() OVER (PARTITION BY
    source ORDER BY ...)``: with a handful of sources every group's
    10^11+ rows funnel through ONE window task.  Same two-pass shape as
    :func:`partitioned_prefix_sum`, but counting rows instead of summing
    values: shards are ORDER-ALIGNED slices of the sort domain
    (``floor(sort / shard_width)`` — ties in ``sort_col`` always land in
    the same shard, so the ``id_col`` tie-break stays local), each shard
    ranks its own rows in parallel, and per-shard COUNTS — one row per
    shard — get a tiny cumulative window and broadcast back as offsets.

    When ``total_col`` is given, each row also carries its group's TOTAL
    row count under that name — derived from the same tiny per-shard
    counts frame, so quota/quantile consumers don't need a second full
    pass over the corpus to learn group sizes.

    ``sort_col`` must be numeric/integral and non-NULL (engines disagree
    on NULL sort order: Spark puts NULLS FIRST ascending, most SQL
    engines NULLS LAST — a NULL shard would silently diverge from a SQL
    oracle); ``(sort_col, id_col)`` must be unique per group for the
    rank to be well-defined.  Adds ``out_col`` (long).  Equal to
    ``row_number() OVER (PARTITION BY part_cols ORDER BY sort_col,
    id_col)`` at any parallelism.
    """
    _check_reserved(df, {out_col} | ({total_col} if total_col else set()))
    bucket = F.floor(F.col(sort_col) / F.lit(int(shard_width))).cast("long")
    sharded = df.withColumn("_shard", bucket)
    w_in = Window.partitionBy(*part_cols, "_shard").orderBy(sort_col, id_col)
    joined, helper = _join_shard_offsets(
        sharded, part_cols, F.count(F.lit(1)), total_col=total_col
    )
    return joined.withColumn(
        out_col, (F.col("_offset") + F.row_number().over(w_in)).cast("long")
    ).drop(*helper)


def group_quantiles(
    df: DataFrame,
    score_col: str,
    quantiles: list[tuple[int, int]],
    part_col: str = "source",
    id_col: str = "doc_id",
    shard_width: int = 1 << 24,
) -> DataFrame:
    """EXACT per-group quantiles of an integral score, at scale.

    The usual choices both fail at 100 TB: ``percentile``/``sort``
    inside ``groupBy(part_col)`` funnels each group through one task
    (and buffers the group), while ``approx_percentile`` is, well,
    approximate — useless for reproducible curation thresholds ("cut at
    the corpus median" must mean the same rows on every run and engine).

    Rational-quantile semantics, pure integer arithmetic: for each
    ``(q_num, q_den)`` with ``1 <= q_num <= q_den``, the group's
    quantile is the value whose 1-based rank by ``(score ASC, id ASC)``
    equals ``ceil(n * q_num / q_den)`` — the lower discrete quantile, no
    interpolation, so a SQL oracle reproduces every boundary decision
    bit-exactly (same reasoning as ``curation.top_fraction_by_score``).
    The ceil is integer ``div`` arithmetic end to end — a double
    quotient could round across an integer boundary once ``n * q_num``
    leaves the 2^53 exact range.

    Shape: ONE :func:`partitioned_rank` pass over the corpus (window
    parallelism scales with the score spread / ``shard_width``, never
    with the O(10) groups) with the group totals riding the rank's own
    tiny shard-counts frame; each row then explodes against the
    |quantiles|-element target list and keeps itself iff its rank IS
    that quantile's target rank — a narrow map-side filter, no second
    corpus scan, no extra shuffle.  ``score_col`` must be integral and
    non-NULL.

    Output: ``(part_col, q_num, q_den, n, q_rank, value)`` — one row per
    group per requested quantile.
    """
    for num, den in quantiles:
        if not (1 <= num <= den):
            raise ValueError(f"need 1 <= q_num <= q_den, got {num}/{den}")
    internals = {"n", "q_num", "q_den", "q_rank", "value", "_qrank", "_q"}
    clash = internals & {part_col, id_col, score_col}
    if clash:
        raise ValueError(
            f"columns {sorted(clash)} collide with group_quantiles internals"
        )
    ranked = partitioned_rank(
        df.select(part_col, id_col, score_col),
        score_col,
        id_col,
        part_cols=(part_col,),
        shard_width=shard_width,
        out_col="_qrank",
        total_col="n",
    )
    qs = F.array(
        *[
            F.struct(
                F.lit(int(num)).alias("q_num"), F.lit(int(den)).alias("q_den")
            )
            for num, den in quantiles
        ]
    )
    return (
        ranked.withColumn("_q", F.explode(qs))
        .select(
            part_col,
            F.col("_q.q_num").alias("q_num"),
            F.col("_q.q_den").alias("q_den"),
            "n",
            "_qrank",
            F.col(score_col).alias("value"),
        )
        # ceil(n * q_num / q_den) in pure long arithmetic
        .withColumn("q_rank", F.expr("(n * q_num + q_den - 1) div q_den"))
        .where(F.col("_qrank") == F.col("q_rank"))
        .select(part_col, "q_num", "q_den", "n", "q_rank", "value")
    )


def token_budget_filter(
    df: DataFrame,
    budget: int,
    part_col: str = "source",
    order_col: str = "doc_id",
    n_tok_col: str | None = None,
    col: str = "text",
    shard_width: int = 1_000_000,
) -> DataFrame:
    """Per-source token budgeting: walking each source in ``order_col``
    order, a document is kept only if it fits ENTIRELY within the
    remaining budget (documents after the boundary are marked, not
    silently dropped — the caller filters on ``keep``).

    Output: (order_col, part_col, n_tok, tokens_before, keep), where
    ``tokens_before`` is the exclusive running token total.  Built on
    :func:`partitioned_prefix_sum` — exact at any parallelism, no
    single-task window.
    """
    from logdag_spark.operators.text import token_count

    if n_tok_col is None:
        df = df.withColumn("n_tok", token_count(col))
        n_tok_col = "n_tok"
    pref = partitioned_prefix_sum(
        df, n_tok_col, order_col, part_cols=(part_col,),
        shard_width=shard_width, out_col="tokens_before",
    )
    return pref.select(
        order_col,
        part_col,
        F.col(n_tok_col).cast("int").alias("n_tok"),
        "tokens_before",
        ((F.col("tokens_before") + F.col(n_tok_col)) <= budget).alias("keep"),
    )
