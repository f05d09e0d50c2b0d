"""Parse-stage tests: exact gid recovery + token-array pass-through
(per-row token-array equality is a BASELINE.json parity requirement)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logdag_spark import fixtures as fx
from logdag_spark.pipeline import parse_tokens, parse_tokens_pandas


@pytest.fixture(scope="module")
def labeled(spark):
    return fx.gen_tokens(spark, scale=0.05).cache()


@pytest.mark.parametrize("impl", [parse_tokens, parse_tokens_pandas])
def test_parse_exact(spark, labeled, impl):
    tdim = fx.template_dim(spark)
    parsed = impl(fx.contract(labeled), tdim)
    j = parsed.join(labeled.select("doc_id", "true_gid", F.col("tokens").alias("orig")), "doc_id")
    assert j.where(F.col("gid").isNull()).count() == 0
    assert j.where(F.col("gid") != F.col("true_gid")).count() == 0
    # token arrays pass through bit-identical
    assert j.where(F.col("tokens") != F.col("orig")).count() == 0
    assert j.count() == labeled.count()  # no dup matches, no drops


def test_unmatched_rows_keep_null_gid(spark):
    tdim = fx.template_dim(spark)
    junk = spark.createDataFrame(
        [("x-hostXX-0", [1, 2, 3], 3, "log")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    out = parse_tokens(junk, tdim)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["gid"] is None


def test_impls_agree(spark, labeled):
    tdim = fx.template_dim(spark)
    a = parse_tokens(fx.contract(labeled), tdim).select("doc_id", "gid")
    b = parse_tokens_pandas(fx.contract(labeled), tdim).select("doc_id", "gid")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
