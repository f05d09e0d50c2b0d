"""S7/S10/J3/U5 + A9/O4/W16 surface tests."""

from __future__ import annotations

import json
from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F

from logdag_spark.operators import dagio, graphops


@pytest.fixture(scope="module")
def small_dag(spark):
    edges = spark.createDataFrame(
        [
            ("u1", 0, 1, True, 0.9),
            ("u1", 1, 2, False, 0.5),
            ("u2", 0, 1, True, 0.8),
        ],
        "unit string, src_eid long, dst_eid long, directed boolean, weight double",
    )
    evdim = spark.createDataFrame(
        [(u, e, f"h{e}:{e}", f"h{e}", str(e)) for u in ("u1", "u2") for e in range(3)],
        "unit string, eid long, identifier string, host string, key string",
    )
    return edges.cache(), evdim.cache()


def test_node_link_roundtrip(spark, small_dag, tmp_path):
    edges, evdim = small_dag
    paths = dagio.export_node_link(edges, evdim, str(tmp_path / "dags"))
    assert len(paths) == 2
    d = json.load(open(paths[0]))
    # undirected edge expands to a bidirectional pair
    assert len(d["links"]) == 3 and len(d["nodes"]) == 3
    back = dagio.import_node_link(spark, paths)
    got = {
        (r["unit"], r["src_eid"], r["dst_eid"], r["directed"])
        for r in back.collect()
    }
    want = {
        (r["unit"], r["src_eid"], r["dst_eid"], r["directed"])
        for r in edges.collect()
    }
    assert got == want


def test_node_link_stream_path_identical(spark, small_dag, tmp_path):
    """toLocalIterator drain (stream_threshold=0) writes byte-identical
    files to the collect path."""
    edges, evdim = small_dag
    p1 = dagio.export_node_link(edges, evdim, str(tmp_path / "a"))
    p2 = dagio.export_node_link(edges, evdim, str(tmp_path / "b"), stream_threshold=0)
    assert [x.rsplit("/", 1)[1] for x in p1] == [x.rsplit("/", 1)[1] for x in p2]
    for a, b in zip(p1, p2):
        assert open(a).read() == open(b).read()


def test_trouble_store(spark, tmp_path):
    tdir = tmp_path / "tickets"
    tdir.mkdir()
    (tdir / "t1.json").write_text(json.dumps({"tid": 7, "identifiers": ["h0:0", "h1:1"]}))
    (tdir / "t2.json").write_text(json.dumps({"tid": 42, "identifiers": ["h2:2"]}))
    t = dagio.load_trouble_tickets(spark, str(tdir))
    rows = {(r["tid"], r["identifier"]) for r in t.collect()}
    assert rows == {("0007", "h0:0"), ("0007", "h1:1"), ("0042", "h2:2")}


def test_anonymize_restore(spark):
    df = spark.createDataFrame([("web01", 1), ("db02", 2)], "host string, x int")
    mapping = spark.createDataFrame(
        [("web01", "hostA"), ("db02", "hostB")], "original string, anon string"
    )
    anon = dagio.anonymize(df, mapping)
    assert {r["host"] for r in anon.collect()} == {"hostA", "hostB"}
    back = dagio.restore(anon, mapping)
    assert {r["host"] for r in back.collect()} == {"web01", "db02"}


def test_member_set_ops(spark):
    df = spark.createDataFrame([("a|b|c", "b|c|d")], "i1 string, i2 string")
    row = df.select(
        F.array_sort(dagio.attr_and("i1", "i2")).alias("land"),
        F.array_sort(dagio.attr_or("i1", "i2")).alias("lor"),
    ).collect()[0]
    assert row["land"] == ["b", "c"]
    assert row["lor"] == ["a", "b", "c", "d"]


def test_dag_stats_by_cube(spark, small_dag):
    edges, evdim = small_dag
    unit_dim = spark.createDataFrame(
        [("u1", "d1", "areaA"), ("u2", "d1", "areaB")], "unit string, day string, area string"
    )
    cube = graphops.dag_stats_by(edges, evdim, unit_dim)
    total = cube.where(F.col("day").isNull() & F.col("area").isNull()).collect()[0]
    assert total["n_edges"] == 3 and total["n_units"] == 2
    per_day = cube.where((F.col("day") == "d1") & F.col("area").isNull()).collect()[0]
    assert per_day["n_edges"] == 3


def test_similar_dags_topn(spark, small_dag):
    edges, evdim = small_dag
    top = graphops.similar_dags_topn(edges, evdim, "u1", n=3).collect()
    assert top and top[0]["unit"] == "u2" and top[0]["cosine"] > 0


def test_temporal_edge_sort(spark, small_dag):
    edges, evdim = small_dag
    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = []
    # eid0/1 events near t0+1h; eid2 events near t0+10h
    for eid, hours in [(0, 1), (1, 1), (2, 10)]:
        for u in ("u1", "u2"):
            rows.append((u, eid, t0 + timedelta(hours=hours), 2.0))
    mat = spark.createDataFrame(rows, "unit string, eid long, bin timestamp, cnt double")
    ranked = graphops.temporal_edge_sort(
        edges, evdim, mat, t0 + timedelta(hours=1)
    ).collect()
    # the (0,1) edge is closest to the query time, (1,2) furthest
    assert ranked[0]["src_eid"] == 0 and ranked[0]["dst_eid"] == 1
    assert ranked[-1]["dst_eid"] == 2
