"""G5 — DirectLiNGAM causal-direction estimation per analysis unit.

The reference delegates to the external ``lingam`` package
(/root/reference/logdag/lingam_input.py:25-95, selected by
``cause_algorithm=lingam``; MixedLiNGAM at mixedlingam_input.py:17-79 has
no public source and is out of scope).  This is a fresh implementation of
DirectLiNGAM (Shimizu et al., JMLR 2011): repeatedly identify the most
exogenous variable via the pairwise entropy-based mutual-information
difference (Hyvarinen's log-cosh / Gaussian-moment entropy
approximation), regress it out, recurse; then fit the strictly-triangular
coefficient matrix over the discovered causal order by least squares.

Spark shape: same per-unit grouped-map parallelism as the PC kernel —
units are small dense matrices, the fleet of units is the parallelism.
Edge convention: coefficient B[i, j] != 0 means x_j -> x_i with weight
B[i, j] (the reference stores it as the edge ``weight``,
/root/reference/logdag/showdag.py:17-119).
"""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from logdag_spark.pipeline.pc import EDGE_SCHEMA

_K1, _K2, _GAMMA = 79.047, 7.4129, 0.37457


def _entropy(u: np.ndarray) -> float:
    """Maximum-entropy approximation of differential entropy
    (Hyvarinen 1998), for a standardized vector."""
    return (
        (1 + math.log(2 * math.pi)) / 2
        - _K1 * (np.mean(np.log(np.cosh(u))) - _GAMMA) ** 2
        - _K2 * np.mean(u * np.exp(-(u**2) / 2)) ** 2
    )


def _std(x: np.ndarray) -> np.ndarray:
    s = x.std()
    return (x - x.mean()) / s if s > 0 else x - x.mean()


def _residual(xi: np.ndarray, xj: np.ndarray) -> np.ndarray:
    """Residual of xi regressed on xj."""
    vj = np.var(xj)
    if vj == 0:
        return xi - xi.mean()
    b = np.cov(xi, xj, bias=True)[0, 1] / vj
    return xi - b * xj


def _diff_mutual_info(xi: np.ndarray, xj: np.ndarray) -> float:
    """J(i->j) - J(j->i): non-negative when x_i is exogenous to x_j.

    diff = (H(x_j) + H(res(x_i | x_j))) - (H(x_i) + H(res(x_j | x_i)))
    on standardized inputs (Shimizu et al. 2011, eq. for the pairwise
    measure with the maximum-entropy approximation).
    """
    si, sj = _std(xi), _std(xj)
    ri_j = _residual(si, sj)  # residual of xi given xj
    rj_i = _residual(sj, si)  # residual of xj given xi
    return (_entropy(sj) + _entropy(_std(ri_j))) - (
        _entropy(si) + _entropy(_std(rj_i))
    )


def causal_order(X: np.ndarray) -> list[int]:
    """DirectLiNGAM ordering: repeatedly extract the variable that looks
    most exogenous against every remaining variable."""
    n, p = X.shape
    U = list(range(p))
    Xw = X.astype(float).copy()
    order: list[int] = []
    while len(U) > 1:
        scores = {}
        for i in U:
            total = 0.0
            for j in U:
                if i == j:
                    continue
                m = _diff_mutual_info(Xw[:, i], Xw[:, j])
                total += min(0.0, m) ** 2
            scores[i] = total
        k = min(sorted(U), key=lambda i: scores[i])
        order.append(k)
        U.remove(k)
        for j in U:
            Xw[:, j] = _residual(Xw[:, j], Xw[:, k])
    order.extend(U)
    return order


def fit_coefficients(X: np.ndarray, order: list[int], th: float = 0.05) -> np.ndarray:
    """Least-squares fit of the strictly-lower-triangular (in causal
    order) adjacency B; coefficients with |b| < th are pruned
    (the reference's lowest-weight pruning knob, lingam_input.py:60-73)."""
    p = X.shape[1]
    B = np.zeros((p, p))
    for pos, i in enumerate(order):
        parents = order[:pos]
        if not parents:
            continue
        A = X[:, parents]
        A = np.column_stack([A, np.ones(len(A))])
        coef, *_ = np.linalg.lstsq(A, X[:, i], rcond=None)
        for c, j in zip(coef[:-1], parents):
            if abs(c) >= th:
                B[i, j] = c
    return B


def lingam_matrix_to_edges(unit: str, B: np.ndarray, eids: np.ndarray) -> pd.DataFrame:
    rows = [
        (unit, int(eids[j]), int(eids[i]), True, float(B[i, j]))
        for i in range(B.shape[0])
        for j in range(B.shape[1])
        if B[i, j] != 0
    ]
    return pd.DataFrame(
        rows, columns=["unit", "src_eid", "dst_eid", "directed", "weight"]
    )


def lingam_edges(
    matrix: DataFrame,
    unit_meta: dict[str, tuple[datetime, int]],
    bin_size: timedelta,
    th: float = 0.05,
    noedge: DataFrame | None = None,
    method: str = "sequential",
    bin_diff: timedelta | None = None,
) -> DataFrame:
    """Distributed DirectLiNGAM over all units (grouped-map kernel).

    ``noedge`` (unit, eid1, eid2) zeroes the corresponding coefficients —
    the prior-knowledge no-path constraint (reference passes
    ``lingam_prior_knowledge`` into the estimator,
    /root/reference/logdag/pknowledge.py:93-112; here the constraint is
    applied to the fitted triangular B, equivalent for no-EDGE rules).
    ``method``/``bin_diff`` must match the discretize stage (bin labels
    step by bin_diff for slide/radius).
    """
    from logdag_spark.pipeline.pc import (
        _to_utc_ms,
        assemble_unit_matrix,
        label_step_ms,
    )

    spark = matrix.sparkSession
    step_ms, offset_ms = label_step_ms(bin_size, method, bin_diff)
    meta = {u: (_to_utc_ms(t0), nb) for u, (t0, nb) in unit_meta.items()}

    def kernel(mdf: pd.DataFrame, ndf: pd.DataFrame) -> pd.DataFrame:
        if len(mdf) == 0:
            return pd.DataFrame(
                columns=["unit", "src_eid", "dst_eid", "directed", "weight"]
            )
        unit = mdf["unit"].iloc[0]
        t0_ms, nb = meta[unit]
        mat, eids = assemble_unit_matrix(mdf, t0_ms, nb, step_ms, offset_ms)
        order = causal_order(mat)
        B = fit_coefficients(mat, order, th)
        if len(ndf):
            pos = {e: k for k, e in enumerate(eids)}
            for _, r in ndf.iterrows():
                a, b = pos.get(r["eid1"]), pos.get(r["eid2"])
                if a is not None and b is not None:
                    B[a, b] = B[b, a] = 0.0
        return lingam_matrix_to_edges(unit, B, eids)

    if noedge is None:
        noedge = spark.createDataFrame([], "unit string, eid1 long, eid2 long")
    else:
        # fresh attribute ids (see pc_edges: cogroup self-join ambiguity)
        noedge = noedge.select("unit", "eid1", "eid2").toDF("unit", "eid1", "eid2")
    return (
        matrix.groupBy("unit")
        .cogroup(noedge.groupBy("unit"))
        .applyInPandas(kernel, EDGE_SCHEMA)
    )
