"""DAG import/export + misc reference-surface utilities.

S7  — node-link JSON export/import per unit
      (/root/reference/logdag/showdag.py:93-119): undirected edges are
      stored as bidirectional pairs in the reference's pickle; the JSON
      here keeps the engine's (directed flag) form and expands to
      bidirectional on request for byte-parity with reference consumers.
S10 — trouble-ticket store: one JSON object per ticket with an event
      identifier list (/root/reference/logdag/eval/trouble.py:13-145),
      plus the CRUD surface (add-trouble / add-lids / label-trouble /
      list-trouble, eval/__main__.py:20-60) and a render-free DOT export
      for plot-dag (__main__.py:364-378).
J3  — anonymize / restore: remap host names and gids through a stored
      mapping (/root/reference/logdag/source/src_amulog.py:32-42,
      /root/reference/logdag/showdag.py:145-159) — broadcast-join remaps.
U5  — identifier-set ops over merged-event member lists
      (/root/reference/logdag/log2event.py:55-72).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# ------------------------------------------------------------------ S7


def dag_to_node_link(edges_unit: list[dict], nodes: list[int]) -> dict:
    """Driver-side node-link dict for ONE unit (reference JSON shape:
    showdag.py:105-117), bidirectional expansion for undirected edges."""
    links = []
    for e in edges_unit:
        links.append({"source": e["src_eid"], "target": e["dst_eid"],
                      "weight": e.get("weight")})
        if not e["directed"]:
            links.append({"source": e["dst_eid"], "target": e["src_eid"],
                          "weight": e.get("weight")})
    return {
        "directed": True,
        "multigraph": False,
        "graph": {},
        "nodes": [{"id": n} for n in sorted(nodes)],
        "links": links,
    }


def export_node_link(
    edges: DataFrame, evdim: DataFrame, out_dir: str,
    stream_threshold: int = 10_000,
) -> list[str]:
    """Write one node-link JSON per unit.

    ONE Spark job: per-unit edge and node lists are assembled with
    ``groupBy(unit).agg(collect_list(...))`` and full-outer joined, so the
    driver sees exactly one small row per unit (per-unit DAGs are small by
    construction) — not one filter+collect job per unit (round-1 perf-weak
    item: O(units) jobs at 365 days x areas).  Beyond ``stream_threshold``
    units the rows are drained with ``toLocalIterator`` (one job per
    partition, prefetched) instead of one ``collect`` so driver memory is
    bounded by a partition, not the whole export — at 365 days x many
    areas x anonymized tenants the unit count is open-ended."""
    os.makedirs(out_dir, exist_ok=True)
    e = edges.groupBy("unit").agg(
        F.collect_list(
            F.struct("src_eid", "dst_eid", "directed", "weight")
        ).alias("es")
    )
    n = evdim.groupBy("unit").agg(F.collect_list("eid").alias("ns"))
    both = n.join(e, "unit", "full_outer").orderBy("unit")
    paths = []
    both = both.persist()
    try:
        if both.count() > stream_threshold:
            rows = both.toLocalIterator(prefetchPartitions=True)
        else:
            rows = both.collect()
        _write_node_link_rows(rows, out_dir, paths)
    finally:
        both.unpersist()
    return paths


def _write_node_link_rows(rows, out_dir: str, paths: list[str]) -> None:
    for row in rows:
        unit = row["unit"]
        es = [x.asDict() for x in (row["es"] or [])]
        ns = list(row["ns"] or [])
        p = os.path.join(out_dir, f"{unit}.json")
        with open(p, "w") as f:
            json.dump(dag_to_node_link(es, ns), f, sort_keys=True)
        paths.append(p)


def import_node_link(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Read node-link JSONs back into the edges-DataFrame shape, deduping
    the bidirectional pairs to directed=False rows
    (reference read path showdag.py:479-488)."""
    rows = []
    for p in paths:
        unit = os.path.splitext(os.path.basename(p))[0]
        with open(p) as f:
            d = json.load(f)
        seen = {(l["source"], l["target"]) for l in d["links"]}
        emitted = set()
        for l in d["links"]:
            a, b = l["source"], l["target"]
            key = (min(a, b), max(a, b))
            if (b, a) in seen:
                if key in emitted:
                    continue
                emitted.add(key)
                rows.append((unit, key[0], key[1], False, l.get("weight")))
            else:
                rows.append((unit, a, b, True, l.get("weight")))
    return spark.createDataFrame(
        rows,
        "unit string, src_eid long, dst_eid long, directed boolean, weight double",
    )


# ----------------------------------------------------------------- S10


def load_trouble_tickets(spark: SparkSession, path: str) -> DataFrame:
    """Trouble store: directory of JSON tickets
    ``{"tid": int, "identifiers": [..]}`` -> (tid, identifier) rows with
    the reference's zero-padded tid format (eval/trouble.py:55-57)."""
    rows = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(path, name)) as f:
            t = json.load(f)
        for ident in t.get("identifiers", []):
            rows.append((str(t["tid"]).zfill(4), ident))
    return spark.createDataFrame(rows, "tid string, identifier string")


def next_tid(path: str) -> int:
    """Smallest unused ticket id (reference eval/trouble.py:110-117
    scans the store directory the same way)."""
    used = set()
    if os.path.isdir(path):
        for name in os.listdir(path):
            if name.endswith(".json"):
                try:
                    used.add(int(os.path.splitext(name)[0]))
                except ValueError:
                    continue
    tid = 0
    while tid in used:
        tid += 1
    return tid


def _trouble_path(path: str, tid: int) -> str:
    return os.path.join(path, f"{int(tid):04d}.json")


def add_trouble(path: str, date: str, group: str, title: str) -> int:
    """add-trouble (reference eval/__main__.py:20-27, trouble.py:118-128):
    create a ticket with the next free tid and empty identifier list;
    returns the tid.  Driver-side file op by design — the store is a
    handful of human-authored tickets, not data."""
    os.makedirs(path, exist_ok=True)
    tid = next_tid(path)
    with open(_trouble_path(path, tid), "w") as f:
        json.dump(
            {"tid": tid, "date": date, "group": group, "title": title,
             "identifiers": []},
            f, sort_keys=True,
        )
    return tid


def add_trouble_identifiers(path: str, tid: int, identifiers: list[str]) -> None:
    """add-lids (reference eval/__main__.py:30-36, trouble.py:130-134):
    append event identifiers to an existing ticket; raises
    FileNotFoundError naming the missing ticket (not its internal
    zero-padded path)."""
    p = _trouble_path(path, tid)
    if not os.path.exists(p):
        raise FileNotFoundError(f"no trouble ticket {tid} in {path}")
    with open(p) as f:
        t = json.load(f)
    t["identifiers"] = list(t.get("identifiers", [])) + [str(i) for i in identifiers]
    with open(p, "w") as f:
        json.dump(t, f, sort_keys=True)


def update_trouble(path: str, tid: int, **fields) -> None:
    """label-trouble etc. (trouble.py:136-140): update ticket metadata."""
    p = _trouble_path(path, tid)
    if not os.path.exists(p):
        raise FileNotFoundError(f"no trouble ticket {tid} in {path}")
    with open(p) as f:
        t = json.load(f)
    t.update(fields)
    with open(p, "w") as f:
        json.dump(t, f, sort_keys=True)


def list_troubles(spark: SparkSession, path: str) -> DataFrame:
    """list-trouble: one row per ticket with its identifier count."""
    rows = []
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(path, name)) as f:
                t = json.load(f)
            rows.append((
                str(t["tid"]).zfill(4), t.get("date"), t.get("group"),
                t.get("title"), len(t.get("identifiers", [])),
            ))
    return spark.createDataFrame(
        rows, "tid string, date string, group string, title string, n_identifiers int"
    )


# ------------------------------------------------- plot-dag (DOT source)


def dag_to_dot(unit: str, edges_unit: list[dict], labels: dict | None = None) -> str:
    """Graphviz DOT source for one unit's DAG — the render-free core of
    the reference's plot-dag (/root/reference/logdag/__main__.py:364-378
    -> showdag.graph_nx, which relabels nodes and hands the graph to a
    renderer; emitting the DOT text keeps the command usable without
    graphviz/matplotlib in the runtime).  Undirected edges use dir=none
    on a single edge statement.  The node set is labels ∪ edge endpoints:
    the reference renders every event in the evmap, so isolated events
    (and edge-less units) must still appear as nodes."""
    labels = labels or {}

    def q(s) -> str:
        return '"' + str(s).replace('"', r"\"") + '"'

    lines = [f"digraph {q(unit)} {{"]
    nodes = sorted(
        set(labels)
        | {e["src_eid"] for e in edges_unit}
        | {e["dst_eid"] for e in edges_unit}
    )
    for n in nodes:
        lab = labels.get(n)
        lines.append(f"  {n} [label={q(lab)}];" if lab is not None else f"  {n};")
    for e in sorted(
        edges_unit, key=lambda e: (e["src_eid"], e["dst_eid"], bool(e["directed"]))
    ):
        attrs = []
        if e.get("weight") is not None:
            attrs.append(f"label={q(round(e['weight'], 3))}")
        if not e["directed"]:
            attrs.append("dir=none")
        a = f" [{', '.join(attrs)}]" if attrs else ""
        lines.append(f"  {e['src_eid']} -> {e['dst_eid']}{a};")
    lines.append("}")
    return "\n".join(lines) + "\n"


def export_dot(
    edges: DataFrame, evdim: DataFrame, out_dir: str,
    stream_threshold: int = 10_000,
) -> list[str]:
    """Write one ``<unit>.dot`` per unit, labeled ``host:key`` from the
    event dim.  Same one-job / bounded-driver shape as
    :func:`export_node_link` (groupBy-collect per unit, toLocalIterator
    past the threshold) — never one filter+collect job per unit."""
    os.makedirs(out_dir, exist_ok=True)
    e = edges.groupBy("unit").agg(
        F.collect_list(
            F.struct("src_eid", "dst_eid", "directed", "weight")
        ).alias("es")
    )
    n = evdim.groupBy("unit").agg(
        F.collect_list(
            F.struct("eid", F.concat_ws(":", "host", "key").alias("label"))
        ).alias("ls")
    )
    both = n.join(e, "unit", "full_outer").orderBy("unit").persist()
    paths: list[str] = []
    try:
        if both.count() > stream_threshold:
            rows = both.toLocalIterator(prefetchPartitions=True)
        else:
            rows = both.collect()
        for row in rows:
            labels = {x["eid"]: x["label"] for x in (row["ls"] or [])}
            es = [x.asDict() for x in (row["es"] or [])]
            p = os.path.join(out_dir, f"{row['unit']}.dot")
            with open(p, "w") as f:
                f.write(dag_to_dot(row["unit"], es, labels))
            paths.append(p)
    finally:
        both.unpersist()
    return paths


# ------------------------------------------------------------------ J3


def anonymize(df: DataFrame, mapping: DataFrame, col: str = "host") -> DataFrame:
    """Replace values through a broadcast (original -> anon) mapping."""
    m = mapping.select(F.col("original").alias(col), "anon")
    return (
        df.join(F.broadcast(m), col, "left")
        .withColumn(col, F.coalesce("anon", F.col(col)))
        .drop("anon")
    )


def restore(df: DataFrame, mapping: DataFrame, col: str = "host") -> DataFrame:
    """Inverse remap (showdag.py:145-159)."""
    inv = mapping.select(
        F.col("anon").alias(col), F.col("original")
    )
    return (
        df.join(F.broadcast(inv), col, "left")
        .withColumn(col, F.coalesce("original", F.col(col)))
        .drop("original")
    )


# ------------------------------------------------------------------ U5


def members_of(identifier: F.Column | str) -> F.Column:
    """Split a (possibly merged) identifier into its member list
    (log2event.py:114-119 '|' join convention)."""
    c = F.col(identifier) if isinstance(identifier, str) else identifier
    return F.split(c, r"\|")


def attr_and(a, b) -> F.Column:
    return F.array_intersect(members_of(a), members_of(b))


def attr_or(a, b) -> F.Column:
    return F.array_union(members_of(a), members_of(b))
