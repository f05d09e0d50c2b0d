"""Prior-knowledge noedge rules (G7) as DataFrame ops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logdag_spark.pipeline.pknowledge import (
    candidate_pairs,
    combine_noedge,
    noedge_independent_groups,
    noedge_topology,
)


@pytest.fixture(scope="module")
def evdim(spark):
    rows = [
        ("u", 0, "h1:0", "h1", "0", "system"),
        ("u", 1, "h1:1", "h1", "1", "auth"),
        ("u", 2, "h2:0", "h2", "0", "system"),
        ("u", 3, "h3:0", "h3", "0", "network"),
    ]
    return spark.createDataFrame(
        rows, "unit string, eid long, identifier string, host string, key string, group string"
    ).cache()


def test_candidate_pairs(spark, evdim):
    pairs = candidate_pairs(evdim)
    assert pairs.count() == 6  # C(4,2)
    assert pairs.where(F.col("eid1") >= F.col("eid2")).count() == 0


def test_noedge_topology(spark, evdim):
    topo = spark.createDataFrame([("h1", "h2")], "host1 string, host2 string")
    pairs = candidate_pairs(evdim)
    ne = noedge_topology(pairs, topo)
    got = {(r["eid1"], r["eid2"]) for r in ne.collect()}
    # forbidden: anything touching h3 (not connected): (0,3), (1,3), (2,3)
    assert got == {(0, 3), (1, 3), (2, 3)}


def test_noedge_independent_groups(spark, evdim):
    pairs = candidate_pairs(evdim)
    ne = noedge_independent_groups(pairs, ["auth"])
    got = {(r["eid1"], r["eid2"]) for r in ne.collect()}
    # auth events (eid 1) may not pair across hosts: (1,2), (1,3)
    assert got == {(1, 2), (1, 3)}


def test_combine_and_pc_integration(spark, evdim):
    import numpy as np

    from logdag_spark.pipeline.pknowledge import noedge_topology

    topo = spark.createDataFrame([("h1", "h2")], "host1 string, host2 string")
    pairs = candidate_pairs(evdim)
    ne = combine_noedge(
        noedge_topology(pairs, topo), noedge_independent_groups(pairs, ["auth"])
    )
    got = {(r["eid1"], r["eid2"]) for r in ne.collect()}
    assert got == {(0, 3), (1, 3), (2, 3), (1, 2)}
