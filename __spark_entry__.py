"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are defined in
``logdag_spark/entry_queries.py`` — one entry per implemented operator
from SURVEY.md §2, each oracle-checked against DuckDB at sf=0.01
(Spark-only kernels record rows-only checks).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from logdag_spark.entry_queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tokens -> parse -> enrich -> route -> aggregate ->
    Fisher-z DAG edges on the deterministic synthetic corpus (smoke scale),
    returned with event identifiers."""
    from datetime import timedelta

    from pyspark.sql import functions as F

    from logdag_spark import fixtures as fx
    from logdag_spark.config import PipelineConfig
    from logdag_spark.fixtures.generator import DEFAULT_T0
    from logdag_spark.operators.graphops import edges_with_nodes
    from logdag_spark.pipeline.runner import run_pipeline

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    cfg = PipelineConfig(cause_algorithm="pc-corr", ci_bin_size="5m")
    labeled = fx.gen_tokens(spark, scale=0.1)
    res = run_pipeline(
        spark,
        fx.contract(labeled),
        fx.host_meta(spark),
        fx.template_dim(spark),
        (DEFAULT_T0, DEFAULT_T0 + timedelta(hours=24)),
        cfg,
        apply_filters=False,
    )
    return edges_with_nodes(res.edges, res.evdim).select(
        "unit", "src_id", "dst_id", "directed", F.round("weight", 6).alias("weight")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Several operators persist() an internal frame they cannot unpersist
    # (the result DataFrame is lazy; the caller runs the terminal action).
    # In a long-lived correctness harness those MEMORY_AND_DISK blocks
    # would otherwise pin until process exit — release the PREVIOUS
    # query's caches when the next one is built.  Correctness-neutral:
    # persists are performance-only (eager state uses localCheckpoint,
    # which clearCache does not touch).
    def _scoped(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.catalog.clearCache()
            return fn(spark, sf_dir)

        return run

    return {name: _scoped(fn) for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}
