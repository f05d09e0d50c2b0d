#!/usr/bin/env python
"""Round-6 measurement harness (bench.py is FROZEN — extra numbers live
here, cited from OPTIMIZATION_r06.md).

Times individual headline queries (or named stages of them) with the
same session config as bench.py (local[$SPARK_GRAFT_CPUS], shuffle
partitions = cores, 8 MB input splits), min-of-N trials with
clearCache() between trials, using the same terminal action as the
frozen bench (`.count()`) by default or a noop sink (guide §1.4) with
``--noop``.  Optionally dumps `.explain("formatted")` per query to
plans/r06/<name>_<tag>.txt.

Usage:
  python bench_extra.py --queries simhash_near_dups minhash_lsh_candidates
  python bench_extra.py --queries all --plans before
  python bench_extra.py --stages            # operator-internal stage probes
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TRIALS = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))

HEADLINE = [
    "tumbling_count_1m",
    "sliding_count_10m_5m",
    "pairwise_corr_1h",
    "daily_edges",
    "pricing_summary",
    "revenue_by_nation",
    "topk_customers",
    "token_stats",
    "minhash_lsh_candidates",
    "simhash_near_dups",
    "cosine_topk",
    "ivf_topk",
    "gsq_edges_1h",
]


def get_session():
    from logdag_spark.session import get_spark

    return get_spark(
        app_name="bench_extra", cores=CPUS, shuffle_partitions=CPUS,
        extra_conf={"spark.sql.files.maxPartitionBytes": "8388608"},
    )


def time_df(spark, build, name, noop=False, trials=TRIALS):
    times = []
    for _ in range(trials):
        spark.sparkContext.setJobDescription(name)
        t0 = time.monotonic()
        df = build(spark, SF_DIR)
        if noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        times.append(round(time.monotonic() - t0, 3))
        spark.catalog.clearCache()
    return times


def dump_plan(spark, build, name, tag):
    os.makedirs("plans/r06", exist_ok=True)
    df = build(spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = f"plans/r06/{name}_{tag}.txt"
    with open(path, "w") as f:
        f.write(plan)
    spark.catalog.clearCache()
    return path


def stage_probes(spark):
    """Operator-internal stage timings for the expensive queries."""
    from pyspark.sql import functions as F

    from logdag_spark.entry_queries import _load
    from logdag_spark.operators import dedup, similarity

    out = {}

    def probe(name, build, noop=True):
        out[name] = time_df(spark, lambda s, d: build(), name, noop=noop)
        print(name, out[name], flush=True)

    d = lambda: _load(spark, SF_DIR, "documents")  # noqa: E731
    e = lambda: _load(spark, SF_DIR, "embeddings")  # noqa: E731

    # --- simhash decomposition
    probe("simhash_tokenize_explode", lambda: d().select(
        F.col("doc_id").alias("_id"),
        F.explode(__import__("logdag_spark.operators.text", fromlist=["tokenize"]).tokenize("text")).alias("_t"),
    ))
    probe("simhash_signatures", lambda: dedup.simhash_signatures(d(), "text", "doc_id"))
    probe("simhash_full", lambda: dedup.simhash_near_dups(d(), "text", "doc_id", max_hamming=8), noop=False)

    # --- minhash decomposition
    probe("minhash_shingle_explode", lambda: d().select(
        F.col("doc_id").alias("_id"), F.explode(dedup.shingles("text", 3)).alias("_sh")))
    probe("minhash_signatures", lambda: dedup.minhash_signatures(d(), "text", "doc_id", 3, 16))
    probe("minhash_full", lambda: dedup.minhash_lsh_candidates(d(), "text", "doc_id", num_hashes=16, bands=8), noop=False)

    # --- cosine
    probe("cosine_full", lambda: similarity.brute_force_topk(e(), e().where(F.col("vec_id") < 20), k=5), noop=False)

    # --- ivf: centroids alone (driver loop), then full
    def ivf_centroids():
        similarity.kmeans_centroids(e(), 64, 16, 5)
        return spark.range(1)
    probe("ivf_kmeans_centroids", ivf_centroids, noop=False)
    probe("ivf_full", lambda: similarity.ivf_topk(e(), e().where(F.col("vec_id") < 20), dim=64, k=5, n_clusters=16, n_probe=4), noop=False)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="*", default=[])
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--plans", default=None, help="tag for plan dump (e.g. before/after)")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--trials", type=int, default=TRIALS)
    args = ap.parse_args()

    from logdag_spark.entry_queries import QUERIES

    spark = get_session()
    results = {}
    names = HEADLINE if args.queries == ["all"] else args.queries
    for name in names:
        fn, _ = QUERIES[name]
        if args.plans:
            dump_plan(spark, fn, name, args.plans)
        results[name] = time_df(spark, fn, name, noop=args.noop, trials=args.trials)
        print(name, results[name], flush=True)
    if args.stages:
        results.update(stage_probes(spark))
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "results": {
        k: {"trials": v, "min": min(v)} for k, v in results.items()
    }}))
    spark.stop()


if __name__ == "__main__":
    main()
