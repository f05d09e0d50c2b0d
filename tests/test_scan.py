"""Unit tests for the distributed scan primitives (operators/scan.py):
two-pass prefix-sum parity against a single global window, budget
filtering semantics, and pack_sequences' strict-order mode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from logdag_spark.operators.scan import partitioned_prefix_sum, token_budget_filter


@pytest.fixture()
def vals(spark):
    rows = [
        (i, "s%d" % (i % 3), (i * 7919) % 13 + 1)  # deterministic pseudo-random
        for i in range(200)
    ]
    return spark.createDataFrame(rows, "id long, src string, v long")


def _reference_prefix(df, inclusive):
    bound = 0 if inclusive else -1
    w = (
        Window.partitionBy("src").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, bound)
    )
    return df.withColumn("want", F.coalesce(F.sum("v").over(w), F.lit(0)))


@pytest.mark.parametrize("inclusive", [False, True])
@pytest.mark.parametrize("shard_width", [1, 7, 50, 10_000])
def test_prefix_sum_matches_global_window(spark, vals, shard_width, inclusive):
    got = partitioned_prefix_sum(
        vals, "v", "id", part_cols=("src",),
        shard_width=shard_width, inclusive=inclusive,
    )
    joined = _reference_prefix(vals, inclusive).join(got, ["id", "src", "v"])
    assert joined.count() == 200
    assert joined.where(F.col("want") != F.col("prefix_sum")).count() == 0


def test_prefix_sum_no_part_cols(spark, vals):
    got = partitioned_prefix_sum(vals, "v", "id", shard_width=16)
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    want = vals.withColumn("want", F.coalesce(F.sum("v").over(w), F.lit(0)))
    bad = want.join(got, ["id", "src", "v"]).where(
        F.col("want") != F.col("prefix_sum")
    )
    assert bad.count() == 0


def test_token_budget_filter_boundary(spark):
    docs = spark.createDataFrame(
        [
            (1, "a", "x " * 10),   # 10 toks, before=0  -> keep
            (2, "a", "x " * 10),   # before=10 -> 20 <= 25 keep
            (3, "a", "x " * 10),   # before=20 -> 30 > 25 drop (straddles)
            (4, "a", "x " * 2),    # before=30 -> over, drop
            (5, "b", "x " * 30),   # other source, over alone
        ],
        "doc_id long, source string, text string",
    )
    out = {
        r["doc_id"]: (r["tokens_before"], r["keep"])
        for r in token_budget_filter(docs, budget=25, shard_width=2).collect()
    }
    assert out == {
        1: (0, True), 2: (10, True), 3: (20, False), 4: (30, False),
        5: (0, False),
    }


def test_pack_sequences_exact_equals_single_shard(spark, sf001_dir):
    from logdag_spark.operators.text import pack_sequences

    d = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    cols = ["doc_id", "source", "n_tok", "pack_bin", "bin_offset"]
    exact = pack_sequences(
        d, capacity=128, order_exact=True, shard_width=7
    ).select(cols)
    single = pack_sequences(d, capacity=128, num_shards=1).select(cols)
    assert exact.exceptAll(single).count() == 0
    assert single.exceptAll(exact).count() == 0


def test_mix_order_respects_weights(spark):
    from logdag_spark.operators.sampling import mix_order

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    w = spark.createDataFrame([("a", 3.0), ("b", 1.0)], "key string, weight double")
    out = mix_order(df, w, key_col="source")
    head = out.orderBy("mix_key").limit(400).groupBy("source").count().collect()
    got = {r["source"]: r["count"] for r in head}
    # 3:1 weights -> ~300/100 in any prefix; allow generous slack
    assert 250 <= got["a"] <= 350 and 50 <= got["b"] <= 150
    # deterministic across repartitioning
    a = sorted((r["doc_id"], r["mix_key"]) for r in out.collect())
    b = sorted(
        (r["doc_id"], r["mix_key"])
        for r in mix_order(df.repartition(7), w, key_col="source").collect()
    )
    assert a == b
    # unweighted source -> NULL key
    w2 = spark.createDataFrame([("a", 3.0)], "key string, weight double")
    nulls = mix_order(df, w2, key_col="source").where("mix_key IS NULL").count()
    assert nulls == 1000


@pytest.mark.parametrize("shard_width", [1, 7, 50, 10_000])
def test_partitioned_rank_matches_row_number(spark, vals, shard_width):
    from logdag_spark.operators.scan import partitioned_rank

    got = partitioned_rank(
        vals, "v", "id", part_cols=("src",), shard_width=shard_width
    )
    w = Window.partitionBy("src").orderBy("v", "id")
    want = vals.withColumn("want", F.row_number().over(w).cast("long"))
    joined = want.join(got, ["id", "src", "v"])
    assert joined.count() == 200
    assert joined.where(F.col("want") != F.col("rank")).count() == 0


def test_partitioned_rank_parallelism_independent(spark, vals):
    from logdag_spark.operators.scan import partitioned_rank

    a = sorted(
        (r["id"], r["rank"])
        for r in partitioned_rank(
            vals, "v", "id", part_cols=("src",), shard_width=5
        ).collect()
    )
    b = sorted(
        (r["id"], r["rank"])
        for r in partitioned_rank(
            vals.repartition(13), "v", "id", part_cols=("src",), shard_width=5
        ).collect()
    )
    assert a == b


def test_cap_per_group_quota_and_uniformity(spark):
    from logdag_spark.operators.sampling import cap_per_group

    rows = [(i, "s%d" % (i % 4)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = cap_per_group(df, cap=25, n_shards=8)
    kept = out.where("keep").groupBy("source").count().collect()
    assert {r["count"] for r in kept} == {25}
    # rank is a permutation of 1..group_size within each group
    per = out.groupBy("source").agg(
        F.count("*").alias("n"),
        F.min("cap_rank").alias("lo"),
        F.max("cap_rank").alias("hi"),
        F.countDistinct("cap_rank").alias("d"),
    )
    for r in per.collect():
        assert (r["lo"], r["hi"], r["d"]) == (1, r["n"], r["n"])
    # a quota smaller than the group keeps a pseudo-random subset, not a
    # doc_id prefix: the kept ids should straddle the id range
    kept_ids = [
        r["doc_id"] for r in out.where("keep AND source = 's0'").collect()
    ]
    assert min(kept_ids) < 100 < max(kept_ids)
    # groups smaller than the cap keep everything
    tiny = cap_per_group(df.where("doc_id < 8"), cap=25)
    assert tiny.where("NOT keep").count() == 0


def test_prefix_sum_keeps_null_keys(spark):
    """NULL part/order keys must survive the offset join (null-safe),
    matching the single-window equivalent which groups NULLs."""
    rows = [(1, "a", 5), (2, "a", 5), (3, None, 7), (None, "a", 9)]
    df = spark.createDataFrame(rows, "id long, src string, v long")
    out = partitioned_prefix_sum(df, "v", "id", part_cols=("src",), shard_width=1)
    assert out.count() == 4  # a plain inner equi-join would drop 2 rows
    got = {r["id"]: r["prefix_sum"] for r in out.where(F.col("src") == "a").collect()}
    # NULL id sorts first within its shard group; ids 1,2 follow in order
    assert got[1] >= 0 and got[2] == got[1] + 5


@pytest.mark.parametrize("shard_width", [1, 5, 10_000])
def test_group_quantiles_matches_sorted_reference(spark, vals, shard_width):
    from logdag_spark.operators.scan import group_quantiles

    qs = [(1, 4), (1, 2), (3, 4), (1, 1)]
    got = {
        (r["src"], r["q_num"], r["q_den"]): (r["n"], r["q_rank"], r["value"])
        for r in group_quantiles(
            vals, "v", qs, part_col="src", id_col="id", shard_width=shard_width
        ).collect()
    }
    rows = vals.collect()
    srcs = {r["src"] for r in rows}
    assert len(got) == len(srcs) * len(qs)
    for src in srcs:
        ordered = sorted(
            (r["v"] for r in rows if r["src"] == src),
        )
        n = len(ordered)
        for num, den in qs:
            rank = -(-n * num // den)  # ceil
            assert got[(src, num, den)] == (n, rank, ordered[rank - 1])


def test_group_quantiles_rejects_bad_fraction(spark, vals):
    from logdag_spark.operators.scan import group_quantiles

    with pytest.raises(ValueError):
        group_quantiles(vals, "v", [(0, 4)], part_col="src", id_col="id")
    with pytest.raises(ValueError):
        group_quantiles(vals, "v", [(5, 4)], part_col="src", id_col="id")


def test_mix_order_duplicate_weight_key_raises(spark):
    from logdag_spark.operators.sampling import mix_order

    df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, source string")
    w = spark.createDataFrame(
        [("a", 3.0), ("a", 1.0), ("b", 2.0)], "key string, weight double"
    )
    with pytest.raises(Exception, match="duplicate weight rows"):
        mix_order(df, w, key_col="source").collect()
    # unique keys still fine
    assert mix_order(
        df, spark.createDataFrame([("a", 1.0), ("b", 2.0)], "key string, weight double"),
        key_col="source",
    ).count() == 2
