"""Stage 2 — broadcast lookup enrichment.

Recovers (ts, host) from the doc_id encoding (FIXTURES.md §1) with pure
column expressions, then broadcast-joins the dimension tables:

* host -> area  (reference area membership, /root/reference/logdag/log2event.py:226-252,
  file format /root/reference/logdag/data/area_def.txt.sample)
* gid -> group  (template tag lookup, /root/reference/logdag/source/src_amulog.py:115-120)

Both joins are ``F.broadcast`` — dimension tables are tiny; at 10^12 fact
rows these stay map-side (no shuffle).  Host-alias resolution
(/root/reference/logdag/source/evgen_snmp.py:121) is the same shape and
uses ``resolve_alias`` when an alias dim is supplied.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich(parsed: DataFrame, host_meta: DataFrame, template_dim: DataFrame) -> DataFrame:
    """Add ``ts, host, area, group`` columns to the parsed token table.

    doc_id layout is fixed-width at both ends ("{epoch_ms:013d}-{host}-
    {seq:08d}"), so extraction is pure ``substring`` arithmetic — no
    regex/split in the 10^12-row map stage (string split expressions
    compile a regex and allocate an array per row)."""
    with_keys = parsed.withColumn(
        "ts", F.timestamp_millis(F.substring("doc_id", 1, 13).cast("long"))
    ).withColumn(
        "host", F.expr("substring(doc_id, 15, length(doc_id) - 23)")
    )
    out = with_keys.join(F.broadcast(host_meta.select("host", "area")), "host", "left")
    out = out.join(
        F.broadcast(template_dim.select("gid", "group")), "gid", "left"
    )
    # canonical event identifier "{host}:{gid}"
    # (/root/reference/logdag/source/evgen_log.py:40-43)
    return out.withColumn("identifier", F.concat_ws(":", "host", "gid"))


def resolve_alias(df: DataFrame, alias_dim: DataFrame, col: str = "host") -> DataFrame:
    """Map raw hostname -> canonical via broadcast join
    (/root/reference/logdag/source/evgen_snmp.py:121, :193-198)."""
    a = alias_dim.select(F.col("raw").alias(col), F.col("canonical"))
    return (
        df.join(F.broadcast(a), col, "left")
        .withColumn(col, F.coalesce("canonical", col))
        .drop("canonical")
    )


def area_filter(df: DataFrame, area: str, host_meta: DataFrame | None = None) -> DataFrame:
    """AreaTest rules (/root/reference/logdag/log2event.py:226-252):
    ``all`` keeps everything; ``each`` treats every host as its own area
    (handled by grouping on host upstream); a named area keeps member hosts
    via the broadcast dim."""
    if area == "all" or area == "each":
        return df
    assert host_meta is not None
    members = host_meta.where(F.col("area") == area).select("host")
    return df.join(F.broadcast(members), "host", "left_semi")
