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


@pytest.fixture(scope="module")
def evdim_full(spark):
    """Dim with identifier/source/group — exercises every rule input."""
    rows = [
        ("u", 0, "h1:0", "h1", "0", "system", "log"),
        ("u", 1, "h1:1", "h1", "1", "auth|network", "snmp"),
        ("u", 2, "h2:0", "h2", "0", "system", "log"),
        ("u", 3, "h3:0", "h3", "0", "unmapped", "snmp"),
    ]
    return spark.createDataFrame(
        rows,
        "unit string, eid long, identifier string, host string, key string,"
        " group string, source string",
    ).cache()


def test_noedge_host_independent(spark, evdim_full):
    from logdag_spark.pipeline.pknowledge import noedge_host_independent

    got = {
        (r["eid1"], r["eid2"])
        for r in noedge_host_independent(candidate_pairs(evdim_full)).collect()
    }
    # every cross-host pair forbidden (HostIndependent, pknowledge.py:309-313)
    assert got == {(0, 2), (0, 3), (1, 2), (1, 3), (2, 3)}


def test_noedge_additional_source(spark, evdim_full):
    from logdag_spark.pipeline.pknowledge import noedge_additional_source

    got = {
        (r["eid1"], r["eid2"])
        for r in noedge_additional_source(candidate_pairs(evdim_full)).collect()
    }
    # both-snmp pairs only (AdditionalSource, pknowledge.py:316-326)
    assert got == {(1, 3)}


def test_noedge_layered_topology(spark, evdim_full):
    from logdag_spark.pipeline.pknowledge import noedge_layered_topology

    topo = spark.createDataFrame(
        [("l_sys", "h1", "h2"), ("l_net", "h2", "h3")],
        "layer string, host1 string, host2 string",
    )
    ne = noedge_layered_topology(
        candidate_pairs(evdim_full), topo,
        {"system": "l_sys", "network": "l_net"},
    )
    got = {(r["eid1"], r["eid2"]) for r in ne.collect()}
    # (0,2): l_sys edge h1-h2 -> allowed; (1,2): same... 1 is h1, 2 is h2:
    #   layers(1)={l_net} (auth unmapped), layers(2)={l_sys}; union has
    #   l_sys edge h1-h2 -> allowed; (0,1): same host -> allowed;
    # (2,3): layers {l_sys, other}; l_sys has no h2-h3 edge BUT union
    #   includes layers(3)={other} -> no edge -> wait: 3's group unmapped
    #   -> layer "other", not in topo; l_sys has (h1,h2) only -> forbidden?
    #   NO: (2,3) union = {l_sys, other}; l_net not included; h2-h3 only in
    #   l_net -> forbidden.
    # (0,3): {l_sys, other}, no h1-h3 edge anywhere -> forbidden.
    # (1,3): layers(1)={l_net}, layers(3)={other}; l_net has h1-h3? no
    #   (l_net edge is h2-h3) -> forbidden.
    assert got == {(0, 3), (1, 3), (2, 3)}


def test_import_dag_rules(spark, evdim_full):
    from logdag_spark.pipeline.pknowledge import (
        import_dag_force,
        import_dag_noedge,
    )

    pairs = candidate_pairs(evdim_full)
    imported = spark.createDataFrame(
        [("h1:0", "h1:1"), ("h2:0", "h1:0")], "src_id string, dst_id string"
    )
    ne = import_dag_noedge(pairs, imported, rule="prune", allow_reverse=True)
    got = {(r["eid1"], r["eid2"]) for r in ne.collect()}
    # kept: (0,1) direct edge, (0,2) reversed edge; everything else pruned
    assert got == {(0, 3), (1, 2), (1, 3), (2, 3)}

    forced = import_dag_force(pairs, imported)
    got_f = {(r["eid1"], r["eid2"]) for r in forced.collect()}
    assert got_f == {(0, 1), (0, 2)}

    comp = spark.createDataFrame(
        [("h1:0", 0), ("h1:1", 0), ("h2:0", 1)],
        "identifier string, component long",
    )
    ne2 = import_dag_noedge(pairs, comp, rule="prune-unconnected")
    got2 = {(r["eid1"], r["eid2"]) for r in ne2.collect()}
    # same component only for (0,1); unknown identifiers (h3:0) pruned
    assert got2 == {(0, 2), (0, 3), (1, 2), (1, 3), (2, 3)}


def test_build_noedge_dispatch(spark, evdim_full):
    from logdag_spark.pipeline.pknowledge import build_noedge

    pairs = candidate_pairs(evdim_full)
    ne = build_noedge(pairs, ("independent", "additional-source"), {})
    got = {(r["eid1"], r["eid2"]) for r in ne.collect()}
    assert got == {(0, 2), (0, 3), (1, 2), (1, 3), (2, 3)}
    with pytest.raises(ValueError, match="unknown prior-knowledge rule"):
        build_noedge(pairs, ("no-such-rule",), {})
    assert build_noedge(pairs, (), {}) is None
