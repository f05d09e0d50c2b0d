"""Deterministic sampling / splitting for the training-data surface.

A training pipeline needs reproducible, cluster-size-independent answers
to "which 5% of the corpus is validation?" and "sample source A at 3x
the rate of source B" — `df.sample()` is seed-per-partition and changes
with repartitioning, so these operators derive a stable pseudo-random
bucket from the row's own id with pure modular arithmetic:

    bucket(id) = ((id mod P) * K_salt) mod P      (P = 2^31 - 1 prime,
                 K_salt = K * (2*salt + 1) mod P)

JVM-side column math (no UDF, no shuffle — a narrow projection), the
same expression is writable in any SQL engine (the DuckDB oracles
replicate it verbatim), and products stay < 2^62 so ANSI-mode long
arithmetic never overflows even at 10^12-row ids.  Multiplicative
hashing mod a Mersenne prime disperses sequential ids uniformly enough
for rate-style sampling (tested: realized rates within 2% absolute at
rate 0.3 on 500 sequential ids).

The reference has no sampling surface (its corpora are bounded); this
is part of the LLM-pipeline extension alongside dedup/similarity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

P = (1 << 31) - 1  # Mersenne prime
K = 2654435761 % P  # Knuth multiplicative constant, reduced mod P


def bucket_multiplier(salt: int) -> int:
    """Salt-derived multiplicative constant.  The salt MUST change the
    multiplier, not add a constant: an additive salt merely rotates the
    bucket ordering, so one stage's threshold interval maps to a
    contiguous interval in the next stage's buckets — fully correlated
    decisions (a rate-0.2 sample fed into a ``+salt`` split still put
    every survivor in 'train'; regression-tested).  Multiplying by a
    different constant mod the prime scatters any interval into a
    full-period arithmetic progression, so composed stages decide
    independently.  salt=0 keeps the plain Knuth constant."""
    return (K * (2 * salt + 1)) % P


def hash_bucket(id_col: Column, salt: int = 0, *, integral: bool = True) -> Column:
    """Stable bucket in [0, P) from an id column.

    ``integral=True`` (default) is the modular-arithmetic path — exactly
    replicable in any SQL engine, which is what the DuckDB oracles do.
    ``integral=False`` hashes arbitrary ids (strings, structs) through
    ``xxhash64`` first; equally deterministic and parallelism-independent,
    but NOT SQL-portable (xxhash64 is Spark-specific).  Callers with a
    DataFrame in hand should use :func:`bucket_for`, which picks the path
    from the column's actual type — a silent ``cast('long')`` on string
    ids would crash ANSI mode or NULL out every bucket (dropping 100% of
    a sample, or funneling every row into the last split label).
    """
    base = id_col.cast("long") if integral else F.xxhash64(id_col)
    return F.pmod(
        F.pmod(base, F.lit(P)) * F.lit(bucket_multiplier(salt)),
        F.lit(P),
    )


_INTEGRAL_TYPES = ("byte", "tinyint", "short", "smallint", "int", "integer", "bigint", "long")


def bucket_for(df: DataFrame, id_col: str, salt: int = 0) -> Column:
    """Type-aware :func:`hash_bucket`: integral id columns take the
    SQL-portable modular path, everything else the xxhash64 path.
    Raises on columns that exist but can't deterministically bucket
    (float/double ids — equal values with different bit patterns)."""
    dtype = dict(df.dtypes).get(id_col)
    if dtype is None:
        raise ValueError(f"id column {id_col!r} not in {df.columns}")
    if dtype in _INTEGRAL_TYPES:
        return hash_bucket(F.col(id_col), salt)
    if dtype in ("float", "double"):
        raise ValueError(
            f"id column {id_col!r} is {dtype}: floating-point ids cannot "
            "bucket deterministically — cast to a string or integer key"
        )
    return hash_bucket(F.col(id_col), salt, integral=False)


# Distinct default salts per operator: the bucket is a pure function of
# (id, salt), so two operators sharing a salt make fully CORRELATED
# decisions — e.g. a rate-0.2 sample piped into a same-salt 90/5/5 split
# would label every survivor "train" (bucket < 0.2P < 0.9P) and leave
# val/test empty.  Different default salts decorrelate composed stages;
# callers needing correlation (e.g. a consistent holdout across tables)
# pass an explicit shared salt.
SALT_SAMPLE = 0
SALT_SPLIT = 0x5EED5
SALT_STRATA = 0xA17C3
SALT_PACK = 0xB1A5  # pack_sequences shard assignment (operators/text.py)


def hash_sample(
    df: DataFrame, rate: float, id_col: str = "doc_id", salt: int = SALT_SAMPLE
) -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows (same rows at any
    parallelism, any run)."""
    return df.where(bucket_for(df, id_col, salt) < int(rate * P))


def hash_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: int = SALT_SPLIT,
) -> DataFrame:
    """Label every row with a deterministic split name; weights must sum
    to <= 1 (any remainder falls into the last split).  Default
    90/5/5 train/val/test."""
    if weights is None:
        weights = {"train": 0.90, "val": 0.05, "test": 0.05}
    b = bucket_for(df, id_col, salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = b < int(acc * P)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    rates: DataFrame,
    key_col: str = "source",
    id_col: str = "doc_id",
    salt: int = SALT_STRATA,
) -> DataFrame:
    """Per-stratum deterministic sampling: ``rates(key, rate)`` is a tiny
    dim broadcast onto the corpus; a row survives iff its bucket falls
    under its stratum's rate.  This is the data-mixing primitive (e.g.
    upweight curated sources, downsample crawl) — one narrow broadcast
    join + filter, no shuffle of the corpus."""
    r = rates.select(
        F.col("key").alias(key_col), (F.col("rate") * P).cast("long").alias("_th")
    )
    return (
        df.join(F.broadcast(r), key_col, "left")
        .where(bucket_for(df, id_col, salt) < F.coalesce("_th", F.lit(0)))
        .drop("_th")
    )


SALT_MIX = 0xD1CE5


def mix_order(
    df: DataFrame,
    weights: DataFrame,
    key_col: str = "source",
    id_col: str = "doc_id",
    salt: int = SALT_MIX,
) -> DataFrame:
    """Deterministic weighted interleave for training order: sorting the
    output by ``mix_key`` ascending yields a stream where each source's
    rows appear at a frequency proportional to its weight — the
    exponential-race (Gumbel/A-Res) trick: every row draws a
    deterministic pseudo-uniform u in (0, 1) from its id bucket and gets

        mix_key = -ln(u) / weight

    Exponential spacing means a weight-3 source's keys land ~3x as dense
    on the key axis as a weight-1 source's, so any prefix of the sorted
    stream holds the sources in ~weight proportion — weighted sampling
    without replacement, reproducible at any parallelism, no shuffle
    here (the SORT is the consumer's — typically the training-shard
    writer's repartitionByRange).

    ``weights(key, weight)`` is a tiny broadcast dim; rows whose key has
    no weight (or weight <= 0) get mix_key NULL — filter or default
    upstream.  A duplicated key in ``weights`` would fan the corpus join
    out 1:many and silently duplicate output rows, so duplicates fail
    the job at execution time instead.  Output: input columns + mix_key
    (rounded to 6 decimals for cross-engine exactness).
    """
    reserved = {"_w", "mix_key"} & set(df.columns)
    if reserved:
        raise ValueError(f"columns {sorted(reserved)} collide with mix_order internals")
    w = (
        weights.groupBy(F.col("key").alias(key_col))
        .agg(
            F.max(F.col("weight").cast("double")).alias("_w"),
            F.count(F.lit(1)).alias("_nw"),
        )
        .select(
            key_col,
            F.when(
                F.col("_nw") > 1,
                F.raise_error(
                    F.concat(
                        F.lit("mix_order: duplicate weight rows for key "),
                        F.col(key_col),
                    )
                ),
            )
            .otherwise(F.col("_w"))
            .alias("_w"),
        )
    )
    # u in (0,1): (bucket + 1) / (P + 1) — never 0 (ln would blow up),
    # never 1; SQL-portable for integral ids via the same bucket algebra
    u = (bucket_for(df, id_col, salt) + F.lit(1.0)) / F.lit(float(P + 1))
    return (
        df.join(F.broadcast(w), key_col, "left")
        .withColumn(
            "mix_key",
            F.round(
                F.when(F.col("_w") > 0, -F.log(u) / F.col("_w")), 6
            ),
        )
        .drop("_w")
    )


SALT_SHUFFLE = 0x5A5A


def shuffle_order(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: int = SALT_SHUFFLE,
    shard_width: int = 1 << 48,
) -> DataFrame:
    """Deterministic global training-shuffle order: every row gets a
    1-based ``epoch_rank`` — a pseudo-random permutation of the corpus
    that is identical on every run, engine, and parallelism (different
    ``salt`` = different epoch).  The missing leg of the sampling
    surface: sample → mix → SHUFFLE → pack.

    The shuffle key is the first 15 hex digits of
    ``md5(salt || ':' || id)`` parsed as a long — md5 is
    engine-identical, so a SQL oracle reproduces the exact permutation
    (the xxhash64 samplers are faster but Spark-only).  The global
    ordinal comes from :func:`~logdag_spark.operators.scan.
    partitioned_rank` over the hash domain — NEVER ``row_number()``
    over an unpartitioned window, which would funnel the corpus through
    one task; shards slice [0, 16^15) into ``2^60 / shard_width``
    order-aligned pieces (default 4096).

    Output: input columns + ``shuffle_key`` (long) + ``epoch_rank``
    (long).  Equal to ``row_number() OVER (ORDER BY shuffle_key, id)``.
    """
    from logdag_spark.operators.scan import partitioned_rank

    reserved = {"shuffle_key", "epoch_rank"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"columns {sorted(reserved)} collide with shuffle_order internals"
        )
    key = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(int(salt)), F.col(id_col))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return partitioned_rank(
        df.withColumn("shuffle_key", key),
        "shuffle_key",
        id_col,
        shard_width=shard_width,
        out_col="epoch_rank",
    )


SALT_CAP = 0xC0FFEE


def cap_per_group(
    df: DataFrame,
    cap: int,
    part_col: str = "source",
    id_col: str = "doc_id",
    salt: int = SALT_CAP,
    n_shards: int = 64,
) -> DataFrame:
    """Per-group document quota (CommonCrawl-style "at most ``cap`` docs
    per domain/source"): rows get a deterministic pseudo-random priority
    (the same multiplicative bucket as the samplers, so the quota keeps
    a UNIFORM subset, not the first ``cap`` ids), are ranked within
    their group by ``(bucket, id)``, and marked ``keep = rank <= cap``.

    The rank comes from :func:`~logdag_spark.operators.scan.
    partitioned_rank`, NOT a per-group window — a corpus has O(10)
    sources, and ``row_number() OVER (PARTITION BY source)`` would
    funnel each source's 10^11 rows through one task.  Shards slice the
    bucket domain [0, P) into ``n_shards`` order-aligned pieces, so
    window parallelism scales with ``n_shards``.

    Output: input columns + ``cap_rank`` (long, 1-based) + ``keep``
    (boolean) — callers filter on ``keep``; losers stay visible for
    lineage/audit.  Exactly ``row_number() OVER (PARTITION BY part_col
    ORDER BY bucket, id)`` — SQL-replicable for integral ids (the DuckDB
    oracle spells the bucket algebra verbatim; string ids take the
    xxhash64 path, deterministic but engine-specific).
    """
    from logdag_spark.operators.scan import partitioned_rank

    reserved = {"_cap_bucket", "cap_rank", "keep"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"columns {sorted(reserved)} collide with cap_per_group internals"
        )
    shard_width = P // int(n_shards) + 1
    ranked = partitioned_rank(
        df.withColumn("_cap_bucket", bucket_for(df, id_col, salt)),
        "_cap_bucket",
        id_col,
        part_cols=(part_col,),
        shard_width=shard_width,
        out_col="cap_rank",
    )
    return ranked.withColumn("keep", F.col("cap_rank") <= int(cap)).drop(
        "_cap_bucket"
    )


def budget_mix(
    df: DataFrame,
    total_budget: int,
    weights: dict[str, float],
    n_tok_col: str | None = None,
    col: str = "text",
    part_col: str = "source",
    id_col: str = "doc_id",
    salt: int = SALT_SHUFFLE,
) -> DataFrame:
    """Token-budgeted training-mix assembly: "``total_budget`` tokens at
    these source weights" — the dataset-composition step that sits
    between curation and packing.  Each source gets a budget of
    ``floor(total_budget * w / sum(weights))`` tokens and is walked in
    the deterministic epoch-shuffle order (:func:`shuffle_order`, so the
    kept subset is an unbiased sample of the source, not its first
    ids); a document is kept iff it fits ENTIRELY within its source's
    remaining budget.  Sources absent from ``weights`` get budget 0 —
    visible with ``keep = false``, nothing silently dropped.

    Scale shape: budget normalization is driver arithmetic on the tiny
    weights dict; the shuffle rank and the per-source running token
    total are both two-pass shard machinery
    (:func:`~logdag_spark.operators.scan.partitioned_prefix_sum` over
    ``epoch_rank`` — unique per row, so the prefix sum is well-defined
    even on md5-key ties), never a corpus-wide window; budgets join
    broadcast.

    Output: input columns + ``n_tok`` (when derived) + ``shuffle_key``
    + ``epoch_rank`` + ``tokens_before`` (exclusive per-source running
    total in shuffle order) + ``budget`` + ``keep``.
    """
    from logdag_spark.operators.scan import partitioned_prefix_sum
    from logdag_spark.operators.text import token_count

    if total_budget < 0:
        raise ValueError(f"total_budget must be >= 0, got {total_budget}")
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be a non-empty {source: w >= 0} dict")
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum > 0")
    budgets = [
        (s, int(total_budget * w / wsum)) for s, w in sorted(weights.items())
    ]
    if n_tok_col is None:
        df = df.withColumn("n_tok", token_count(col))
        n_tok_col = "n_tok"
    ordered = shuffle_order(df, id_col=id_col, salt=salt)
    pref = partitioned_prefix_sum(
        ordered,
        n_tok_col,
        "epoch_rank",
        part_cols=(part_col,),
        out_col="tokens_before",
    )
    spark = df.sparkSession
    bdf = spark.createDataFrame(budgets, f"{part_col} string, budget long")
    return (
        pref.join(F.broadcast(bdf), part_col, "left")
        .withColumn("budget", F.coalesce("budget", F.lit(0)))
        .withColumn(
            "keep",
            (F.col("tokens_before") + F.col(n_tok_col)) <= F.col("budget"),
        )
    )
