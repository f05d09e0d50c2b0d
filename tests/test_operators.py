"""Operator-library correctness beyond the oracle harness: LSH recall vs
brute force, dedup behavior on planted duplicates, graph-surface ops on a
hand-built DAG, multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from logdag_spark.operators import dedup, graphops, similarity
from logdag_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    synthetic_media,
)


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    base = [
        "the quick brown fox jumps over the lazy dog and runs far away today",
        "a completely different sentence about spark and distributed query engines",
        "rain in spain falls mainly on the plain while the band plays on stage",
        "numbers one two three four five six seven eight nine ten eleven twelve",
    ]
    rows = []
    did = 0
    for b in base:
        rows.append((did, b)); did += 1
        rows.append((did, b)); did += 1  # exact dup
        near = b.replace("the", "a", 1) if "the" in b else b + " extra"
        rows.append((did, near)); did += 1  # near dup
    for i in range(30):
        rows.append((did, f"unique filler document number {i} with tokens alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}"))
        did += 1
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup(spark, docs_with_dups):
    out = dedup.exact_dedup(docs_with_dups)
    assert out.count() == docs_with_dups.count() - 4
    groups = dedup.exact_dup_groups(docs_with_dups)
    assert groups.count() == 4
    assert all(r["n_dups"] == 2 for r in groups.collect())


def test_minhash_lsh_recall(spark, docs_with_dups):
    """Every exact-dup pair must collide in LSH; verified near-dups found."""
    cand = dedup.minhash_lsh_candidates(docs_with_dups, num_hashes=32, bands=16)
    got = {(r["id1"], r["id2"]) for r in cand.collect()}
    for a in (0, 3, 6, 9):
        assert (a, a + 1) in got, f"exact dup pair ({a},{a+1}) missed by LSH"
    deduped = dedup.minhash_dedup(
        docs_with_dups, num_hashes=32, bands=16, jaccard_th=0.9
    )
    kept = {r["doc_id"] for r in deduped.select("doc_id").collect()}
    for a in (0, 3, 6, 9):
        assert a in kept and (a + 1) not in kept


def test_ngram_jaccard_sanity(spark, docs_with_dups):
    pairs = dedup.all_pairs_jaccard(docs_with_dups, th=0.99)
    got = {(r["id1"], r["id2"]) for r in pairs.collect()}
    assert {(0, 1), (3, 4), (6, 7), (9, 10)} <= got


def test_simhash_exact_dups_zero_distance(spark, docs_with_dups):
    out = dedup.simhash_near_dups(docs_with_dups, max_hamming=0)
    got = {(r["id1"], r["id2"]) for r in out.collect()}
    assert {(0, 1), (3, 4), (6, 7), (9, 10)} <= got


@pytest.fixture(scope="module")
def clustered_vecs(spark):
    """50 clusters x 3 near-identical members (cosine ~0.995) — the
    high-similarity regime hyperplane LSH is built for."""
    rng = np.random.default_rng(11)
    rows = []
    vid = 0
    for c in range(50):
        base = rng.normal(size=32)
        base /= np.linalg.norm(base)
        for m in range(3):
            v = base + 0.05 * rng.normal(size=32)
            rows.append((vid, c, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, cluster long, embedding array<float>"
    ).cache()


def test_lsh_topk_recall_on_planted_clusters(spark, clustered_vecs):
    q = clustered_vecs.where(F.col("vec_id") % 3 == 0)  # one query per cluster
    ann = similarity.lsh_topk(
        clustered_vecs, q, dim=32, k=2, n_planes=8, n_tables=8
    )
    by_q = {}
    for r in ann.collect():
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(
        1
        for qid, nbrs in by_q.items()
        if {qid + 1, qid + 2} & nbrs
    )
    assert hits >= 45, f"LSH found cluster siblings for only {hits}/50 queries"


def test_embedding_near_dups_lsh(spark, clustered_vecs):
    out = similarity.embedding_near_dups(
        clustered_vecs, dim=32, th=0.9, n_planes=8, n_tables=8
    )
    pairs = {(r["id1"], r["id2"]) for r in out.collect()}
    planted = {(3 * c, 3 * c + 1) for c in range(50)}
    found = len(planted & pairs)
    assert found >= 45, f"only {found}/50 planted near-dup pairs found"
    # no false positives across clusters at th=0.9
    cross = [
        (a, b) for a, b in pairs if a // 3 != b // 3
    ]
    assert len(cross) <= 2


def test_lsh_topk_runs_on_real_embeddings(spark, sf01_dir):
    e = spark.read.parquet(f"{sf01_dir}/embeddings.parquet")
    q = e.where(F.col("vec_id") < 10)
    ann = similarity.lsh_topk(e, q, dim=64, k=5, n_planes=6, n_tables=8)
    assert ann.count() >= 0  # weakly-similar corpus: plumbing check only


def test_cosine_matches_numpy(spark, sf01_dir):
    e = spark.read.parquet(f"{sf01_dir}/embeddings.parquet").limit(20).toPandas()
    sdf = spark.createDataFrame(e)
    a = sdf.select(F.col("vec_id").alias("id1"), F.col("embedding").alias("v1"))
    b = sdf.select(F.col("vec_id").alias("id2"), F.col("embedding").alias("v2"))
    got = {
        (r["id1"], r["id2"]): r["c"]
        for r in a.crossJoin(b)
        .where(F.col("id1") < F.col("id2"))
        .select("id1", "id2", similarity.cosine(F.col("v1"), F.col("v2")).alias("c"))
        .collect()
    }
    vecs = {r.vec_id: np.array(r.embedding, dtype=float) for r in e.itertuples()}
    for (i, j), c in got.items():
        want = vecs[i] @ vecs[j] / (np.linalg.norm(vecs[i]) * np.linalg.norm(vecs[j]))
        assert abs(c - want) < 1e-9


# ------------------------------------------------------------- graph ops


@pytest.fixture(scope="module")
def small_dag(spark):
    edges = spark.createDataFrame(
        [
            ("u1", 0, 1, True, 0.9),
            ("u1", 1, 2, False, 0.5),
            ("u1", 3, 4, True, 0.2),
            ("u2", 0, 1, True, 0.8),
            ("u2", 2, 3, True, 0.7),
        ],
        "unit string, src_eid long, dst_eid long, directed boolean, weight double",
    )
    evdim = spark.createDataFrame(
        [
            (u, e, f"h{e % 3}:{e}", f"h{e % 3}", str(e))
            for u in ("u1", "u2")
            for e in range(6)
        ],
        "unit string, eid long, identifier string, host string, key string",
    )
    return edges.cache(), evdim.cache()


def test_graph_filters(spark, small_dag):
    edges, evdim = small_dag
    e = graphops.edges_with_nodes(edges, evdim)
    assert graphops.f_directed(e).count() == 4
    assert graphops.f_undirected(e).count() == 1
    assert graphops.f_across_host(e).count() + graphops.f_within_host(e).count() == 5
    assert graphops.f_ate_prune(e, 0.6).count() == 3
    assert graphops.f_edge_search(e, gid="1").count() == 3
    active = graphops.f_no_isolated_nodes(edges, evdim)
    assert active.where(F.col("unit") == "u1").count() == 5  # eid 5 isolated


def test_set_ops(spark, small_dag):
    edges, evdim = small_dag
    e = graphops.edges_with_nodes(edges, evdim)
    e1, e2 = e.where(F.col("unit") == "u1"), e.where(F.col("unit") == "u2")
    e2u = e2.withColumn("unit", F.lit("u1"))  # align unit for comparison
    assert graphops.edges_common(e1, e2u).count() == 1  # 0->1
    assert graphops.edges_lor(e1, e2u).count() == 4
    assert graphops.edges_diff(e1, e2u).count() == 2


def test_dag_stats_and_tfidf(spark, small_dag):
    edges, evdim = small_dag
    stats = {r["unit"]: r for r in graphops.dag_stats(edges, evdim).collect()}
    assert stats["u1"]["n_edges"] == 3 and stats["u1"]["n_directed"] == 2
    tfidf = graphops.edge_tfidf(edges, evdim)
    rows = {(r["unit"], r["pair_key"]): r for r in tfidf.collect()}
    # edge 0->1 appears in both units -> df=2, idf = log(3/3)+1 = 1
    shared = [v for k, v in rows.items() if v["df"] == 2]
    assert shared and all(abs(v["idf"] - 1.0) < 1e-9 for v in shared)
    score = {r["unit"]: r["score"] for r in graphops.anomaly_score(tfidf).collect()}
    assert score["u1"] > 0


def test_connected_components(spark, small_dag):
    edges, evdim = small_dag
    comp = graphops.connected_components(edges, evdim)
    u1 = {r["eid"]: r["component"] for r in comp.where(F.col("unit") == "u1").collect()}
    assert u1[0] == u1[1] == u1[2] == 0
    assert u1[3] == u1[4] == 3
    assert u1[5] == 5
    dist = {
        r["size"]: r["n_components"]
        for r in graphops.netsize_distribution(comp).collect()
    }
    assert dist[3] >= 1 and dist[1] >= 1


def test_dag_similarity_and_trouble(spark, small_dag):
    edges, evdim = small_dag
    sim = graphops.dag_similarity(edges, evdim).collect()
    assert len(sim) == 1 and sim[0]["dot"] == 1
    trouble = spark.createDataFrame(
        [(1, "h0:0"), (1, "h1:1")], "tid int, identifier string"
    )
    m = graphops.match_trouble_edges(edges, evdim, trouble, rule="both")
    assert m.count() == 2  # 0->1 in both units
    m2 = graphops.match_trouble_edges(edges, evdim, trouble, rule="either")
    assert m2.count() >= 3


# ------------------------------------------------------------ multimodal


def test_multimodal_plumbing(spark):
    media = synthetic_media(spark, 32)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 32
    assert all(len(r["feature"]) == 32 for r in rows)
    # deterministic: same payload -> same sha/feature at any partitioning
    again = {r["media_id"]: r["sha256"] for r in extract_features(media.repartition(8)).collect()}
    first = {r["media_id"]: r["sha256"] for r in rows}
    assert first == again
    plan = frame_sample_plan(media, every_ms=1000)
    vid = media.where(F.col("kind") == "video").collect()
    want = sum(max((r["duration_ms"] - 1) // 1000, 0) + 1 for r in vid)
    assert plan.count() == want
