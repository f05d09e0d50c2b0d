"""Prior-knowledge pruning (G7) — noedge pair rules as DataFrames.

The reference prunes the PC initial graph with topology-derived rules
(/root/reference/logdag/pknowledge.py:229-306, driver :329-365): an event
pair is a candidate only if its hosts are identical or adjacent in a
network-topology graph; "independent" rules forbid specific groups from
cross-host edges.  This is the reference's analogue of predicate pushdown
— it shrinks the CI-test search space before the expensive kernel
(SURVEY.md §4).

Spark shape: candidate pairs = per-unit self cross-join of the (small)
event dim (J7); allowed-pair tests are broadcast joins against the
topology edge list; the complement (noedge) feeds ``pc_edges`` which
drops them from the initial adjacency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def candidate_pairs(evdim: DataFrame) -> DataFrame:
    """All eid pairs per unit with host columns:
    (unit, eid1, eid2, host1, host2), eid1 < eid2."""
    a = evdim.select(
        "unit", F.col("eid").alias("eid1"), F.col("host").alias("host1"),
        F.col("group").alias("group1") if "group" in evdim.columns else F.lit(None).alias("group1"),
    )
    b = evdim.select(
        "unit", F.col("eid").alias("eid2"), F.col("host").alias("host2"),
        F.col("group").alias("group2") if "group" in evdim.columns else F.lit(None).alias("group2"),
    )
    return a.join(b, "unit").where(F.col("eid1") < F.col("eid2"))


def noedge_topology(pairs: DataFrame, topology: DataFrame) -> DataFrame:
    """Forbid pairs whose hosts are neither equal nor topology-adjacent
    (pknowledge.py:229-241).  ``topology(host1, host2)`` is undirected."""
    sym = topology.select("host1", "host2").union(
        topology.select(F.col("host2").alias("host1"), F.col("host1").alias("host2"))
    ).distinct()
    allowed = pairs.where(F.col("host1") == F.col("host2")).select(
        "unit", "eid1", "eid2"
    )
    topo_ok = pairs.join(
        F.broadcast(sym), ["host1", "host2"], "left_semi"
    ).select("unit", "eid1", "eid2")
    return (
        pairs.select("unit", "eid1", "eid2")
        .exceptAll(allowed.unionByName(topo_ok).distinct())
    )


def noedge_independent_groups(pairs: DataFrame, groups: list[str]) -> DataFrame:
    """Forbid cross-host pairs touching a host-independent group
    (pknowledge.py:309-313)."""
    flag = F.col("group1").isin(groups) | F.col("group2").isin(groups)
    return (
        pairs.where((F.col("host1") != F.col("host2")) & flag)
        .select("unit", "eid1", "eid2")
    )


def combine_noedge(*rules: DataFrame) -> DataFrame:
    out = None
    for r in rules:
        out = r if out is None else out.unionByName(r)
    return out.distinct() if out is not None else None
