"""Stage 3 — route enriched rows into per-sink event streams.

The reference writes each event's series to a tagged time-series store
keyed by (measure, host, key) — measure ``log_feature`` for log events
(/root/reference/logdag/source/evgen_log.py:16,48-53), per-feature
measures for SNMP (/root/reference/logdag/source/evgen_snmp.py:22-66).
Routing here is a column mapping + partitioned sink write: the "sink" is
the measure value, physically a partition of the ``events_ts`` table —
fan-out without data movement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SOURCE_TO_MEASURE = {"log": "log_feature", "snmp": "snmp_feature"}


def route(enriched: DataFrame, source_to_measure: dict[str, str] | None = None) -> DataFrame:
    """Project the routed row shape ``(measure, host, key, area, group, ts, val)``.

    ``key`` is the template id as string (the reference's tag ``key``,
    /root/reference/logdag/source/sqlts.py:91-134); ``val`` is 1.0 per raw
    event — the aggregate stage sums it into per-bin counts.  Unparsed rows
    (gid NULL) are routed to measure ``unparsed`` so nothing is silently
    dropped and the per-sink counts reconcile with the input row count.
    """
    mapping = source_to_measure or SOURCE_TO_MEASURE
    measure = F.coalesce(
        F.when(F.col("gid").isNull(), F.lit("unparsed")),
        *[
            F.when(F.col("source") == s, F.lit(m))
            for s, m in mapping.items()
        ],
        F.lit("other"),
    )
    return enriched.select(
        measure.alias("measure"),
        "host",
        F.col("gid").cast("string").alias("key"),
        "area",
        "group",
        "ts",
        F.lit(1.0).alias("val"),
    )
