"""DirectLiNGAM kernel on known non-Gaussian SEMs."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import numpy as np
import pytest

from logdag_spark.pipeline.lingam import (
    causal_order,
    fit_coefficients,
    lingam_edges,
)


def _sem(n=3000, seed=0):
    """x0 -> x1 -> x2 with uniform (non-Gaussian) noise."""
    rng = np.random.default_rng(seed)
    x0 = rng.uniform(-1, 1, n)
    x1 = 0.8 * x0 + 0.3 * rng.uniform(-1, 1, n)
    x2 = 0.7 * x1 + 0.3 * rng.uniform(-1, 1, n)
    return np.column_stack([x0, x1, x2])


def test_causal_order_chain():
    X = _sem()
    assert causal_order(X) == [0, 1, 2]


def test_coefficients_recovered():
    X = _sem()
    B = fit_coefficients(X, [0, 1, 2], th=0.05)
    assert abs(B[1, 0] - 0.8) < 0.1
    assert abs(B[2, 1] - 0.7) < 0.1
    assert B[0, 1] == 0 and B[0, 2] == 0  # no back edges


def test_order_invariant_to_permutation():
    X = _sem()
    perm = [2, 0, 1]  # columns now: x2, x0, x1
    Xp = X[:, perm]
    order = causal_order(Xp)
    # column 1 holds x0 (root), column 2 holds x1, column 0 holds x2
    assert order == [1, 2, 0]


def test_lingam_edges_distributed(spark):
    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    X = _sem(n=1440, seed=3) + 2.0  # shift positive, count-like
    rows = []
    for eid in range(3):
        for b in range(1440):
            v = float(X[b, eid])
            if v != 0:
                rows.append(("u1", eid, t0 + timedelta(minutes=b), v))
    mdf = spark.createDataFrame(rows, "unit string, eid long, bin timestamp, cnt double")
    edges = lingam_edges(mdf, {"u1": (t0, 1440)}, timedelta(minutes=1))
    got = {(r["src_eid"], r["dst_eid"]) for r in edges.collect()}
    assert (0, 1) in got and (1, 2) in got
    assert (1, 0) not in got and (2, 1) not in got
