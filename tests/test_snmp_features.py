"""J5 hostsum + evpost feature chain (SNMP branch,
/root/reference/logdag/source/evgen_snmp.py:222-247,421-472)."""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pytest
from pyspark.sql import functions as F

from logdag_spark.config import PipelineConfig
from logdag_spark.pipeline.snmp_features import (
    apply_feature,
    hostsum,
    snmp_feature_stage,
)

T0 = datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def snmp_rows(spark):
    rows = []
    for h in ("h1", "h2"):
        for k in ("cpu@0", "mem@0"):
            for i in range(60):
                # h2 mem has a spike at minute 30
                v = 1.0
                if h == "h2" and k == "mem@0" and i == 30:
                    v = 50.0
                rows.append(("snmp_src", h, k, "all", "snmp",
                             T0 + timedelta(minutes=i), v))
    return spark.createDataFrame(
        rows,
        "measure string, host string, key string, area string,"
        " group string, ts timestamp, val double",
    ).cache()


def test_hostsum(spark, snmp_rows):
    hs = hostsum(snmp_rows, "vsum")
    got = {
        (r["host"], r["key"], r["val"])
        for r in hs.where(
            F.col("ts") == T0 + timedelta(minutes=30)
        ).collect()
    }
    # h1: 1+1; h2: 1+50; key is the VSOURCE_KEY "all"
    assert got == {("h1", "all", 2.0), ("h2", "all", 51.0)}
    assert hs.select("measure").distinct().collect()[0][0] == "vsum"


def test_apply_feature_chain(spark, snmp_rows):
    dt_range = (T0, T0 + timedelta(hours=1))
    fdef = {"name": "spike", "source": "snmp_src",
            "func_list": ["fillzero", "diff_abs", "outlier"],
            "outlier_threshold": 2.0}
    out = apply_feature(snmp_rows, fdef, dt_range, timedelta(minutes=1))
    rows = out.collect()
    assert all(r["measure"] == "spike" and r["val"] > 0 for r in rows)
    # the h2 mem spike: |diff| = 49 at min 30 and 49 at min 31, both
    # > median(|diff|)=0 + 2.0 -> exactly these two outlier bins
    got = {(r["host"], r["key"], r["ts"].minute) for r in rows}
    assert got == {("h2", "mem@0", 30), ("h2", "mem@0", 31)}


def test_stage_replaces_sources(spark, snmp_rows):
    dt_range = (T0, T0 + timedelta(hours=1))
    other = spark.createDataFrame(
        [("log_feature", "h1", "k", "all", "g", T0, 1.0)],
        snmp_rows.schema,
    )
    routed = snmp_rows.unionByName(other)
    cfg = PipelineConfig(
        snmp_vsources=(("vsum", "snmp_src"),),
        snmp_features=(
            {"name": "host_activity", "source": "vsum",
             "func_list": ["fillzero"]},
        ),
        snmp_bin_size="1m",
    )
    out = snmp_feature_stage(routed, dt_range, cfg)
    measures = {r["measure"] for r in out.select("measure").distinct().collect()}
    # raw snmp source replaced by the feature; log rows untouched
    assert measures == {"log_feature", "host_activity"}
    n = out.where(
        (F.col("measure") == "host_activity") & (F.col("host") == "h2")
    ).count()
    assert n == 60  # every bin has positive hostsum

    # identity without config
    assert snmp_feature_stage(routed, dt_range, PipelineConfig()) is routed
