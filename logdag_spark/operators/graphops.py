"""DAG query surface — everything downstream of ``dag_edges`` +
``event_dim`` is plain DataFrame/SQL (SURVEY.md §3.3).

Covers: composable graph filters (P8, /root/reference/logdag/
showdag_filter.py:3-122), edge search predicates (P7, showdag.py:664-683),
edge dedup (G9, showdag.py:479-488), DAG/run set comparisons (U1-U4,
/root/reference/logdag/visual/comparison.py:44-204), node/edge stats
(A9-A10, showdag.py:551-600), TF-IDF edge ranking (A11,
/root/reference/logdag/visual/edge_search.py:207-532), connected
components + netsize distribution (G8/A12, showdag.py:716-760), DAG
similarity (G10, edge_search.py:18-160), anomaly score (G11,
edge_search.py:605-620), and trouble-ticket matching (J8,
/root/reference/logdag/eval/match_edge.py:30-94).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


# --------------------------------------------------------------- enriching


def edges_with_nodes(edges: DataFrame, evdim: DataFrame) -> DataFrame:
    """Join both endpoints' event definitions onto the edge rows."""
    src = evdim.select(
        "unit",
        F.col("eid").alias("src_eid"),
        F.col("identifier").alias("src_id"),
        F.col("host").alias("src_host"),
        F.col("key").alias("src_key"),
    )
    dst = evdim.select(
        "unit",
        F.col("eid").alias("dst_eid"),
        F.col("identifier").alias("dst_id"),
        F.col("host").alias("dst_host"),
        F.col("key").alias("dst_key"),
    )
    return edges.join(src, ["unit", "src_eid"]).join(dst, ["unit", "dst_eid"])


def edge_pair_key(edges: DataFrame) -> DataFrame:
    """Normalized undirected pair key (least, greatest) — G9 dedup."""
    return edges.withColumn(
        "pair_key",
        F.concat_ws(
            "->",
            F.least("src_id", "dst_id"),
            F.greatest("src_id", "dst_id"),
        ),
    )


# ------------------------------------------------------------- P8 filters


def f_directed(edges: DataFrame) -> DataFrame:
    return edges.where(F.col("directed"))


def f_undirected(edges: DataFrame) -> DataFrame:
    return edges.where(~F.col("directed"))


def f_across_host(e: DataFrame) -> DataFrame:
    """across_host (showdag_filter.py): endpoints on different hosts."""
    return e.where(F.col("src_host") != F.col("dst_host"))


def f_within_host(e: DataFrame) -> DataFrame:
    return e.where(F.col("src_host") == F.col("dst_host"))


def f_no_isolated_nodes(edges: DataFrame, evdim: DataFrame) -> DataFrame:
    """Nodes that touch at least one edge (inverse of no_isolated)."""
    touched = (
        edges.select("unit", F.col("src_eid").alias("eid"))
        .unionByName(edges.select("unit", F.col("dst_eid").alias("eid")))
        .distinct()
    )
    return evdim.join(touched, ["unit", "eid"], "left_semi")


def f_ate_prune(edges: DataFrame, th: float) -> DataFrame:
    """ate_prune: drop edges with |weight| below threshold."""
    return edges.where(F.abs(F.col("weight")) >= th)


def f_edge_search(
    e: DataFrame,
    gid: str | None = None,
    host_substr: str | None = None,
) -> DataFrame:
    """P7 edge search conditions (showdag.py:664-683)."""
    out = e
    if gid is not None:
        out = out.where((F.col("src_key") == gid) | (F.col("dst_key") == gid))
    if host_substr is not None:
        out = out.where(
            F.col("src_host").contains(host_substr)
            | F.col("dst_host").contains(host_substr)
        )
    return out


# ---------------------------------------------------------- U1-U4 set ops


def edges_common(e1: DataFrame, e2: DataFrame) -> DataFrame:
    """U1: edges present in both runs (undirected identifier-pair key)."""
    k1 = edge_pair_key(e1).select("unit", "pair_key")
    k2 = edge_pair_key(e2).select("unit", "pair_key")
    return k1.intersect(k2)


def edges_lor(e1: DataFrame, e2: DataFrame) -> DataFrame:
    """U2: edges in either run."""
    k1 = edge_pair_key(e1).select("unit", "pair_key")
    k2 = edge_pair_key(e2).select("unit", "pair_key")
    return k1.union(k2).distinct()


def edges_diff(e1: DataFrame, e2: DataFrame) -> DataFrame:
    """U3: in e1 but not e2."""
    k1 = edge_pair_key(e1).select("unit", "pair_key").distinct()
    k2 = edge_pair_key(e2).select("unit", "pair_key")
    return k1.join(k2, ["unit", "pair_key"], "left_anti")


def direction_diff(e1: DataFrame, e2: DataFrame) -> DataFrame:
    """U4: common pairs whose orientation differs across runs
    (comparison.py:164-204)."""
    def keyed(e, tag):
        return edge_pair_key(e).select(
            "unit",
            "pair_key",
            F.col("directed").alias(f"directed_{tag}"),
            F.col("src_id").alias(f"src_{tag}"),
        )
    j = keyed(e1, "1").join(keyed(e2, "2"), ["unit", "pair_key"])
    return j.where(
        (F.col("directed_1") != F.col("directed_2"))
        | (F.col("directed_1") & F.col("directed_2") & (F.col("src_1") != F.col("src_2")))
    )


# ------------------------------------------------------------- A9-A12 stat


def dag_stats(edges: DataFrame, evdim: DataFrame) -> DataFrame:
    """Per-unit node/edge counts with directed/undirected splits and
    across-host counts (show-stats, /root/reference/logdag/__main__.py:253-286)."""
    e = edges_with_nodes(edges, evdim)
    per_edge = e.groupBy("unit").agg(
        F.count("*").alias("n_edges"),
        F.sum(F.col("directed").cast("long")).alias("n_directed"),
        F.sum((~F.col("directed")).cast("long")).alias("n_undirected"),
        F.sum((F.col("src_host") != F.col("dst_host")).cast("long")).alias(
            "n_across_host"
        ),
    )
    nodes = evdim.groupBy("unit").agg(F.count("*").alias("n_nodes"))
    return nodes.join(per_edge, "unit", "left").na.fill(0)


def group_stats(edges: DataFrame, evdim: DataFrame, group_col: str = "group") -> DataFrame:
    """A10: edge counts per template group (__main__.py:300-323)."""
    if group_col not in evdim.columns:
        raise ValueError(f"evdim lacks {group_col}")
    src = evdim.select("unit", F.col("eid").alias("src_eid"), F.col(group_col).alias("g"))
    return (
        edges.join(src, ["unit", "src_eid"])
        .groupBy("g")
        .agg(F.count("*").alias("n_edges"))
        .withColumnRenamed("g", group_col)
    )


def edge_tfidf(edges: DataFrame, evdim: DataFrame) -> DataFrame:
    """A11 TF-IDF over edge pair keys across units
    (edge_search.py:207-532; smoothed idf :513-521):
    tf = count(pair in unit)/n_edges(unit), df = #units containing pair,
    idf = log((N+1)/(df+1)) + 1."""
    keyed = edge_pair_key(edges_with_nodes(edges, evdim))
    n_units = keyed.select("unit").distinct().count()
    per_unit = keyed.groupBy("unit").agg(F.count("*").alias("unit_edges"))
    tf = (
        keyed.groupBy("unit", "pair_key")
        .agg(F.count("*").alias("cnt"))
        .join(per_unit, "unit")
        .withColumn("tf", F.col("cnt") / F.col("unit_edges"))
    )
    df_ = keyed.groupBy("pair_key").agg(
        F.countDistinct("unit").alias("df")
    )
    return (
        tf.join(df_, "pair_key")
        .withColumn("idf", F.log((n_units + 1) / (F.col("df") + 1)) + 1)
        .withColumn("tfidf", F.col("tf") * F.col("idf"))
        .select("unit", "pair_key", "cnt", "tf", "df", "idf", "tfidf")
    )


def anomaly_score(tfidf: DataFrame) -> DataFrame:
    """G11: per-unit sum of edge scores (edge_search.py:605-620)."""
    return tfidf.groupBy("unit").agg(F.sum("tfidf").alias("score"))


# ----------------------------------------------------- G8/A12 components


def connected_components(edges: DataFrame, evdim: DataFrame, max_iter: int = 20) -> DataFrame:
    """Per-unit connected components by iterative label propagation
    (small-diameter DAGs converge in a few rounds; at true graph scale
    swap in a GraphFrames-style alternating algorithm).
    Output: (unit, eid, component) where component = min eid reachable."""
    sym = (
        edges.select("unit", F.col("src_eid").alias("a"), F.col("dst_eid").alias("b"))
        .unionByName(
            edges.select("unit", F.col("dst_eid").alias("a"), F.col("src_eid").alias("b"))
        )
        .distinct()
    )
    labels = evdim.select("unit", F.col("eid"), F.col("eid").alias("component"))
    for _ in range(max_iter):
        prop = (
            sym.join(
                labels.select("unit", F.col("eid").alias("b"), F.col("component").alias("nc")),
                ["unit", "b"],
            )
            .groupBy("unit", F.col("a").alias("eid"))
            .agg(F.min("nc").alias("min_nbr"))
        )
        new_labels = (
            labels.join(prop, ["unit", "eid"], "left")
            .withColumn("new_c", F.least("component", F.coalesce("min_nbr", "component")))
            .select("unit", "eid", F.col("new_c").alias("component"))
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("component", "old"), ["unit", "eid"])
            .where(F.col("component") != F.col("old"))
            .count()
        )
        labels = new_labels.localCheckpoint(eager=True) if changed else new_labels
        if changed == 0:
            break
    return labels


def netsize_distribution(components: DataFrame) -> DataFrame:
    """A12: histogram of component sizes (showdag.py:738-760)."""
    sizes = components.groupBy("unit", "component").agg(F.count("*").alias("size"))
    return sizes.groupBy("size").agg(F.count("*").alias("n_components")).orderBy("size")


# ------------------------------------------------------------ G10 cosine


def dag_similarity(edges: DataFrame, evdim: DataFrame) -> DataFrame:
    """Pairwise cosine similarity between units' binary edge vectors
    (edge_search.py:64-80): sparse dot product via self-join on pair_key."""
    vec = edge_pair_key(edges_with_nodes(edges, evdim)).select(
        "unit", "pair_key"
    ).distinct()
    norm = vec.groupBy("unit").agg(F.count("*").alias("n"))
    a = vec.withColumnRenamed("unit", "unit1")
    b = vec.withColumnRenamed("unit", "unit2")
    dots = (
        a.join(b, "pair_key")
        .where(F.col("unit1") < F.col("unit2"))
        .groupBy("unit1", "unit2")
        .agg(F.count("*").alias("dot"))
    )
    n1 = norm.select(F.col("unit").alias("unit1"), F.col("n").alias("n1"))
    n2 = norm.select(F.col("unit").alias("unit2"), F.col("n").alias("n2"))
    return (
        dots.join(n1, "unit1")
        .join(n2, "unit2")
        .withColumn("cosine", F.col("dot") / F.sqrt(F.col("n1") * F.col("n2")))
        .select("unit1", "unit2", "dot", "cosine")
    )


# ------------------------------------------------- A9 cube / O4 / W16


def dag_stats_by(edges: DataFrame, evdim: DataFrame, unit_dim: DataFrame) -> DataFrame:
    """A9: node/edge counts rolled up by day AND area in one pass via
    cube() (the reference computes the day and area groupings in separate
    driver loops, /root/reference/logdag/showdag.py:551-600;
    /root/reference/logdag/__main__.py:230-297).

    ``unit_dim(unit, day, area)`` is the small unit dimension.
    """
    per_unit = dag_stats(edges, evdim).join(F.broadcast(unit_dim), "unit")
    return (
        per_unit.cube("day", "area")
        .agg(
            F.sum("n_nodes").alias("n_nodes"),
            F.sum("n_edges").alias("n_edges"),
            F.count("*").alias("n_units"),
        )
    )


def similar_dags_topn(edges: DataFrame, evdim: DataFrame, unit: str, n: int = 5) -> DataFrame:
    """O4: top-n units most similar to ``unit`` by edge-set cosine
    (edge_search.py:708-731)."""
    sim = dag_similarity(edges, evdim)
    mine = sim.where((F.col("unit1") == unit) | (F.col("unit2") == unit))
    other = F.when(F.col("unit1") == unit, F.col("unit2")).otherwise(F.col("unit1"))
    return (
        mine.select(other.alias("unit"), "cosine")
        .orderBy(F.desc("cosine"), F.asc("unit"))
        .limit(n)
    )


def temporal_edge_sort(
    edges: DataFrame,
    evdim: DataFrame,
    matrix: DataFrame,
    query_ts,
) -> DataFrame:
    """W16: rank edges by the count-weighted mean distance of their
    endpoints' events from a query time — ascending, closest first
    (/root/reference/logdag/visual/edge_search.py:650-705).

    ``matrix`` is the long-form (unit, eid, bin, cnt).
    """
    dist = F.abs(F.unix_millis(F.col("bin")) - F.lit(int(query_ts.timestamp() * 1000)))
    node_score = (
        matrix.groupBy("unit", "eid")
        .agg((F.sum(dist * F.col("cnt")) / F.sum("cnt")).alias("node_dist"))
    )
    s = node_score.select("unit", F.col("eid").alias("src_eid"), F.col("node_dist").alias("sd"))
    d = node_score.select("unit", F.col("eid").alias("dst_eid"), F.col("node_dist").alias("dd"))
    return (
        edges.join(s, ["unit", "src_eid"])
        .join(d, ["unit", "dst_eid"])
        .withColumn("score", (F.col("sd") + F.col("dd")) / 2 / 1000.0)
        .drop("sd", "dd")
        .orderBy("score")
    )


# --------------------------------------------------------------- J8 match


def match_trouble_edges(
    edges: DataFrame, evdim: DataFrame, trouble: DataFrame, rule: str = "both"
) -> DataFrame:
    """Match ground-truth event identifiers against edge endpoints
    (match_edge.py:30-94).  ``trouble(tid, identifier)``; rules:
    ``both`` = both endpoints in the ticket's set, ``either`` = at least
    one."""
    e = edges_with_nodes(edges, evdim)
    t = F.broadcast(trouble)
    src_hit = e.join(
        t.withColumnRenamed("identifier", "src_id"), "src_id", "left_semi"
    ).select("unit", "src_eid", "dst_eid")
    dst_hit = e.join(
        t.withColumnRenamed("identifier", "dst_id"), "dst_id", "left_semi"
    ).select("unit", "src_eid", "dst_eid")
    if rule == "both":
        return src_hit.intersect(dst_hit)
    if rule == "either":
        return src_hit.union(dst_hit).distinct()
    raise ValueError(f"unknown match rule {rule!r}")
