"""Generator determinism + contract-shape tests (FIXTURES.md §1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from logdag_spark import fixtures as fx


def test_contract_schema(spark):
    df = fx.contract(fx.gen_tokens(spark, scale=0.02))
    assert [f.name for f in df.schema.fields] == ["doc_id", "tokens", "n_tok", "source"]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types == {
        "doc_id": "string",
        "tokens": "array<int>",
        "n_tok": "int",
        "source": "string",
    }


def test_n_tok_invariant(spark):
    df = fx.gen_tokens(spark, scale=0.02)
    assert df.where(F.size("tokens") != F.col("n_tok")).count() == 0


def test_deterministic_across_parallelism(spark):
    """Same content at different partitionings — required for the
    N-vs-4N-executor parity claim."""
    a = fx.gen_tokens(spark, scale=0.02).repartition(2)
    b = fx.gen_tokens(spark, scale=0.02).repartition(16)
    assert a.count() == b.count()
    sym_diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    assert sym_diff == 0


def test_zipf_skew(spark):
    counts = (
        fx.gen_tokens(spark, scale=0.1)
        .groupBy("true_gid")
        .count()
        .toPandas()
        .set_index("true_gid")["count"]
    )
    assert counts[0] > 3 * counts[7]  # heavy hitter present


def test_ground_truth_edges(spark):
    gt = fx.ground_truth_edges(spark, 0.1).toPandas()
    assert set(zip(gt.gid_cause, gt.gid_effect)) == {(20, 21), (22, 23)}
    assert len(gt) > 0
