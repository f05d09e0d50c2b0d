"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline, and two scale
paths: LSH-bucketed (random-hyperplane signs) and IVF (spherical
k-means cells) — both join only colliding/probed candidates, never the
full cross product.  Scalar vector math (dot, norm) is built-in array
expressions (``aggregate``/``zip_with``, JVM-side); the batch-level
kernels (hyperplane signatures, centroid assignment/probing) are
Arrow-batched ``pandas_udf`` matmuls — per-row expression trees at
``n_planes x dim`` scale cost more to codegen-compile than to run.
Functions that build those kernels need an active SparkSession (the
plane/centroid matrices derive from tiny Spark jobs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel


def dot(a: Column, b: Column) -> Column:
    # cast BEFORE multiplying: float32*float32 then widening loses bits vs
    # the double-precision oracle
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    d = l2norm(a) * l2norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def normalize(a: Column) -> Column:
    # let-bind the norm in a struct element: referencing the l2norm
    # expression inside the per-element lambda would re-run the aggregate
    # per coordinate — O(dim²) per vector
    return F.transform(
        F.array(F.struct(a.alias("v"), l2norm(a).alias("n"))),
        lambda s: F.transform(
            s["v"], lambda x: F.when(s["n"] > 0, x / s["n"]).otherwise(F.lit(0.0))
        ),
    )[0]


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors per query.

    ``broadcast(queries) x corpus`` -> per-query row_number over score: the
    corpus is scanned once, the only shuffle is the per-query top-k (a
    partial top-k per partition under AQE).  ``exclude_self`` drops the
    id-equal pair — correct when the queries ARE corpus rows; it MUST be
    False for an external query set, whose ids are unrelated to corpus
    ids (an id collision would silently drop a legitimate neighbor).
    Norms are materialized once per side BEFORE the join — computing
    ``cosine(q, c)`` per pair would redo each corpus norm |Q| times and
    each query norm |C| times (3 array aggregates per pair instead of 1).
    Output: (query_id, neighbor_id, score, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"),
        l2norm(F.col(vec_col)).alias("_qn"),
    )
    c = df.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"),
        l2norm(F.col(vec_col)).alias("_cn"),
    )
    denom = F.col("_qn") * F.col("_cn")
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(
            F.lit(not exclude_self)
            | (F.col("query_id") != F.col("neighbor_id"))
        )
        .select(
            "query_id",
            "neighbor_id",
            F.when(denom > 0, dot(F.col("_qv"), F.col("_cv")) / denom)
            .otherwise(F.lit(0.0))
            .alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


_PLANE_CACHE: dict = {}


def _plane_matrix(dim: int, n_planes: int, seed: int) -> "np.ndarray":
    """(n_planes, dim) hyperplane coefficients, derived once per process
    from ``xxhash64(seed, plane, coord)`` with one tiny Spark job — the
    same deterministic-hash idiom as the data generator, so signatures
    are reproducible with no stored model."""
    key = (dim, n_planes, seed)
    if key not in _PLANE_CACHE:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                "hyperplane_signature needs an active SparkSession to "
                "derive its plane matrix (one tiny job, cached per process)"
            )
        # collect (id, c) and sort by id on the driver: collect() row
        # order is an implementation detail of range partitioning, and a
        # repartition/AQE change permuting it would silently permute every
        # plane coefficient (changing all LSH signatures)
        rows = (
            spark.range(n_planes * dim)
            .select(
                "id",
                (
                    F.pmod(
                        F.xxhash64(
                            F.lit(seed),
                            (F.col("id") / dim).cast("int"),
                            (F.col("id") % dim).cast("int"),
                        ),
                        F.lit(2001),
                    )
                    - 1000
                ).cast("double").alias("c"),
            )
            .collect()
        )
        _PLANE_CACHE[key] = np.array(
            [c for _, c in sorted((r["id"], r["c"]) for r in rows)],
            dtype=np.float64,
        ).reshape(n_planes, dim)
    return _PLANE_CACHE[key]


def hyperplane_signature(
    vec: Column, dim: int, n_planes: int = 16, seed: int = 7
) -> Column:
    """Sign pattern against ``n_planes`` pseudo-random hyperplanes,
    returned as a long bitmask.

    One Arrow-batched matmul per batch against the driver-derived plane
    matrix (same shape as the IVF assignment kernel).  The previous
    all-Catalyst form inlined ``n_planes x dim`` hash+multiply
    subexpressions per table — the generated class took longer to
    codegen-compile than the data took to scan (measured 1.8 s compile
    vs 0.2 s execution on a 100-row side), and recompiled per plan.
    """
    P = _plane_matrix(dim, n_planes, seed)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def sig(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)
        bits = m @ P.T > 0
        out = np.zeros(len(m), dtype=np.int64)
        for p in range(P.shape[0]):
            out |= bits[:, p].astype(np.int64) << p
        return pd.Series(out)

    return sig(vec)


def lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 3,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates = signature-bucket collisions in any
    of ``n_tables`` independent hyperplane tables, then exact cosine rank.

    At corpus scale the bucket join replaces the O(N·Q) scan with
    O(collisions); recall is tunable via planes/tables.  ``exclude_self``
    as in :func:`brute_force_topk` — False for external query sets.
    """
    def with_sig(d: DataFrame, idn: str) -> DataFrame:
        # norm computed BEFORE the n_tables explode — after it, the
        # O(dim) aggregate would re-run once per table row
        return d.select(
            F.col(id_col).alias(idn),
            F.col(vec_col).alias(f"_{idn}_v"),
            l2norm(F.col(vec_col)).alias(f"_{idn}_n"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("table"),
                            hyperplane_signature(
                                F.col(vec_col), dim, n_planes, seed=31 + t
                            ).alias("sig"),
                        )
                        for t in range(n_tables)
                    ]
                )
            ).alias("s"),
        ).select(idn, f"_{idn}_v", f"_{idn}_n", "s.table", "s.sig")

    qs = with_sig(queries, "query_id")
    cs = with_sig(df, "neighbor_id")
    # norms ride each side's projection (once per signature row), not the
    # per-candidate score — same precompute rationale as brute_force_topk
    denom = F.col("_query_id_n") * F.col("_neighbor_id_n")
    cand = (
        qs.join(cs, ["table", "sig"])
        .where(
            F.lit(not exclude_self)
            | (F.col("query_id") != F.col("neighbor_id"))
        )
        .select(
            "query_id",
            "neighbor_id",
            F.when(
                denom > 0,
                dot(F.col("_query_id_v"), F.col("_neighbor_id_v")) / denom,
            ).otherwise(F.lit(0.0)).alias("score"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def kmeans_centroids(
    df: DataFrame,
    dim: int,
    n_clusters: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
    tol: float = 1e-4,
):
    """Spherical k-means centroids for IVF indexing (numpy (k, dim) array,
    L2-normalized rows).

    Distributed Lloyd's, one single-stage job per iteration: a
    ``mapInPandas`` kernel assigns each Arrow batch against the broadcast
    centroid matrix (one numpy matmul; k·dim floats in the closure, never
    a k×N row explosion) and emits its per-cluster partial sums — <= k
    rows per partition, collected directly with NO shuffle (the earlier
    posexplode + hash-agg recompute paid a dim×N-row exchange and a
    second stage per iteration just to produce the same k×dim cells).
    The driver combines partials (bounded: k·dim·partitions) and stops
    early once the max centroid shift drops below ``tol`` — on clustered
    data Lloyd's converges in 2-3 rounds, and each saved round is a saved
    corpus pass.  Init is deterministic: the k corpus rows with the
    smallest ``xxhash64(id, seed)``.
    """

    def _normalize_rows(m: "np.ndarray") -> "np.ndarray":
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    seeds = (
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .withColumn("_h", F.xxhash64(F.col("_id"), F.lit(seed)))
        .orderBy("_h", "_id")
        .limit(n_clusters)
        .collect()
    )
    if not seeds:
        raise ValueError("kmeans_centroids: empty corpus")
    # a corpus smaller than n_clusters clamps k to the corpus size
    n_clusters = min(n_clusters, len(seeds))
    cent = _normalize_rows(
        np.array([r["_v"] for r in seeds], dtype=np.float64)
    )
    # cached across Lloyd iterations: every iteration must re-ASSIGN
    # against the updated centroids, but without the cache it also
    # re-scans and re-decodes the corpus parquet n_iter times (the
    # standard iterative-ML pattern; MEMORY_AND_DISK spills at corpus
    # scale)
    vecs = df.select(F.col(vec_col).alias("_v")).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    def _partial_sums(centroids: "np.ndarray"):
        C = np.asarray(centroids, dtype=np.float64)

        def fn(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                m = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
                n = np.linalg.norm(m, axis=1, keepdims=True)
                n[n == 0] = 1.0
                a = (m / n @ C.T).argmax(axis=1)
                rows = [
                    (int(cl), int((a == cl).sum()), m[a == cl].sum(axis=0).tolist())
                    for cl in np.unique(a)
                ]
                yield pd.DataFrame(rows, columns=["cluster", "c", "s"])

        return fn

    try:
        for _ in range(n_iter):
            parts = vecs.mapInPandas(
                _partial_sums(cent), "cluster int, c long, s array<double>"
            ).collect()
            new = cent.copy()  # empty clusters keep their previous centroid
            acc = np.zeros((n_clusters, dim))
            cnt = np.zeros(n_clusters)
            for r in parts:
                acc[r["cluster"]] += np.asarray(r["s"])
                cnt[r["cluster"]] += r["c"]
            nonempty = cnt > 0
            new[nonempty] = acc[nonempty] / cnt[nonempty, None]
            new = _normalize_rows(new)
            shift = float(np.abs(new - cent).max())
            cent = new
            if shift < tol:
                break
    finally:
        vecs.unpersist()
    return cent


def assign_cluster(centroids):
    """Arrow-batched nearest-centroid (max cosine) assignment UDF."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)

    @pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return pd.Series((m / n @ C.T).argmax(axis=1).astype(np.int32))

    return assign


def probe_clusters(centroids, n_probe: int):
    """Arrow-batched top-``n_probe`` nearest centroids per query vector."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)

    @pandas_udf("array<int>")
    def probe(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        sims = m / n @ C.T
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(order.astype(np.int32)))

    return probe


def ivf_topk(
    df: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF approximate top-k (``exclude_self`` as in
    :func:`brute_force_topk` — False for external query sets):
    spherical-kmeans partition of the corpus,
    queries probe their ``n_probe`` nearest cells, exact cosine rank on
    the probed candidates only.

    The scale shape: the corpus is scanned once to index (cluster id is a
    plain int column — at rest this would be the partition key), and each
    query joins ~``n_probe/n_clusters`` of the corpus instead of all of
    it.  Complements ``lsh_topk``: IVF recall degrades gracefully with
    n_probe and supports billion-row corpora with k ~ sqrt(N) cells.
    """
    cent = kmeans_centroids(
        df, dim, n_clusters, n_iter, id_col=id_col, vec_col=vec_col, seed=seed
    )
    corpus = df.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"),
        l2norm(F.col(vec_col)).alias("_cn"),
    ).withColumn("cluster", assign_cluster(cent)(F.col("_cv")))
    qs = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"),
        l2norm(F.col(vec_col)).alias("_qn"),
    ).withColumn("cluster", F.explode(probe_clusters(cent, n_probe)(F.col("_qv"))))
    denom = F.col("_qn") * F.col("_cn")
    cand = (
        qs.join(corpus, "cluster")
        .where(
            F.lit(not exclude_self)
            | (F.col("query_id") != F.col("neighbor_id"))
        )
        .select(
            "query_id",
            "neighbor_id",
            F.when(denom > 0, dot(F.col("_qv"), F.col("_cv")) / denom)
            .otherwise(F.lit(0.0))
            .alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_near_dups(
    df: DataFrame,
    dim: int,
    th: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 10,
    n_tables: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (score >= th) via the LSH
    candidate path; exact verification on candidates."""
    sigs = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        # norm before the explode: once per vector, not once per table
        l2norm(F.col(vec_col)).alias("_n"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table"),
                        hyperplane_signature(F.col(vec_col), dim, n_planes, 91 + t).alias("sig"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("s"),
    ).select("_id", "_v", "_n", "s.table", "s.sig")
    a, b = sigs.alias("a"), sigs.alias("b")
    denom = F.col("a._n") * F.col("b._n")
    return (
        a.join(b, ["table", "sig"])
        .where(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id1"),
            F.col("b._id").alias("id2"),
            F.when(denom > 0, dot(F.col("a._v"), F.col("b._v")) / denom)
            .otherwise(F.lit(0.0))
            .alias("score"),
        )
        .where(F.col("score") >= th)
        .distinct()
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = 127 / max|x|,
    q_i = round(x_i * scale) in [-127, 127] — the storage/transfer
    shape ANN serving quantizes to (reconstruction x ~= q / scale).

    Pure column expressions, no shuffle, no UDF: inside the code array
    the max-abs is let-bound in a struct so the per-coordinate lambda
    reads it rather than re-aggregating (O(dim), not O(dim²)); the
    scalar ``scale`` column re-evaluates the max-abs aggregate — once
    per OUTPUT column, which is the floor without a materialization
    barrier (project collapsing re-inlines shared subexpressions).
    All-zero vectors get scale 0.0 and an all-zero code (the
    reconstruction is exact).

    Output: (id_col, scale, qvec array<int>).
    """
    v = F.col(vec_col)
    maxabs = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    pair = F.struct(v.alias("v"), maxabs.alias("m"))
    return df.select(
        F.col(id_col),
        F.round(
            F.when(maxabs > 0, F.lit(127.0) / maxabs).otherwise(F.lit(0.0)), 6
        ).alias("scale"),
        F.transform(
            F.array(pair),
            lambda s: F.transform(
                s["v"],
                lambda x: F.when(
                    s["m"] > 0,
                    F.round(x.cast("double") * (F.lit(127.0) / s["m"]), 0),
                )
                .otherwise(F.lit(0.0))
                .cast("int"),
            ),
        )[0].alias("qvec"),
    )


# --------------------------------------------------------------------- PCA


def embedding_moments(
    df: DataFrame, vec_col: str = "embedding", quantize: int | None = None,
    dim: int | None = None,
):
    """First and second raw moments of an embedding column in ONE
    shuffle-free job: a ``mapInPandas`` kernel accumulates per-PARTITION
    partials (count, sum vector, flattened X^T X) and emits one row per
    partition — the driver combines ~|partitions| x (d + d^2) numbers,
    the same bounded-collect convention as :func:`kmeans_centroids`'s
    k x dim partials.  Returns ``(n, s, ss)``: row count, d-vector of
    sums, d x d raw second-moment matrix.

    ``quantize=q`` first maps every value to ``floor(x*q + 0.5)``
    (round-half-up, reproducible in any SQL engine) and sums in EXACT
    integer arithmetic (python ints driver-side) — the small-scale
    verification harness for the covariance oracle.  ``None`` (default,
    the production path) sums in float64.

    ``dim`` skips the width-sniffing ``first()`` — that probe is a whole
    extra Spark job per call when the caller already knows the embedding
    width (every CLI/oracle entry does).
    """
    if dim is None:
        dim = len(
            df.select(F.col(vec_col).alias("_v")).first()["_v"]
        )

    def fn(batches):
        n = 0
        s = np.zeros(dim, dtype=np.float64 if quantize is None else np.int64)
        ss = np.zeros((dim, dim), dtype=s.dtype)
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            if quantize is not None:
                m = np.floor(m * quantize + 0.5).astype(np.int64)
            n += m.shape[0]
            s += m.sum(axis=0)
            ss += m.T @ m
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.ravel().tolist()]}
            )

    kind = "double" if quantize is None else "long"
    parts = df.select(F.col(vec_col).alias("_v")).mapInPandas(
        fn, f"n long, s array<{kind}>, ss array<{kind}>"
    ).collect()
    if not parts:
        raise ValueError(f"embedding_moments: no rows in {vec_col!r}")
    if quantize is None:
        n = sum(r["n"] for r in parts)
        s = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
        ss = np.sum([np.asarray(r["ss"]) for r in parts], axis=0).reshape(dim, dim)
        return n, s, ss
    # exact integer combine: python ints never overflow (int64 partials
    # are exact per partition — |x|<=1-ish embeddings at q=1000 keep
    # per-partition sums far inside 2^63; the DRIVER totals may not fit,
    # hence python-int accumulation here)
    n = sum(int(r["n"]) for r in parts)
    s = [sum(int(r["s"][i]) for r in parts) for i in range(dim)]
    ss = [
        [sum(int(r["ss"][i * dim + j]) for r in parts) for j in range(dim)]
        for i in range(dim)
    ]
    return n, s, ss


def embedding_covariance_frame(
    df: DataFrame,
    vec_col: str = "embedding",
    quantize: int = 1000,
    dim: int | None = None,
) -> DataFrame:
    """EXACT integer covariance numerators of the quantized embedding
    coordinates: one row per (i, j), i <= j, with
    ``cov_num = n * S_ij - S_i * S_j`` over ``floor(x*quantize + 0.5)``
    values — pure integer algebra, so a SQL oracle reproduces it
    bit-for-bit (the house convention for float-hostile oracles, same
    as source_token_kl's integer counts).  The d x d frame is driver
    materialized (d^2 rows — bounded like kmeans' k x dim partials).

    This is the VERIFICATION surface for :func:`pca_project`'s moments;
    production PCA uses the float64 path directly.  Raises if a
    numerator exceeds int64 (can only happen at corpus scales where the
    float path is the right tool anyway).
    """
    n, s, ss = embedding_moments(df, vec_col, quantize=quantize, dim=dim)
    dim = len(s)
    rows = []
    for i in range(dim):
        for j in range(i, dim):
            v = n * ss[i][j] - s[i] * s[j]
            if not (-(1 << 63) <= v < (1 << 63)):
                raise ValueError(
                    "covariance numerator exceeds int64 — use the float64 "
                    "moments path at this scale"
                )
            rows.append((i, j, v))
    spark = df.sparkSession
    return spark.createDataFrame(rows, "i int, j int, cov_num long")


def pca_project(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    center: bool = True,
    dim: int | None = None,
):
    """Project embeddings onto their top-``k`` principal components —
    the dimension-reduction step before ANN indexing / semantic dedup.

    Plan shape: one shuffle-free moments job (:func:`embedding_moments`),
    a d x d eigendecomposition on the DRIVER (d is the embedding width —
    64..4096 — never corpus-sized), then one narrow Arrow-batched
    projection pass ``(x - mean) @ W`` — no shuffle anywhere.
    Components are deterministic: eigenvalues descending, each
    eigenvector's largest-|coordinate| made positive (eigh's sign is
    otherwise arbitrary).

    Returns ``(projected_df, components, eigenvalues)`` where
    ``projected_df`` is (id_col, proj array<float>), ``components`` is
    the d x k float64 matrix, ``eigenvalues`` the top-k variances.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql import types as T

    n, s, ss = embedding_moments(df, vec_col, dim=dim)
    dim = len(s)
    if not 1 <= k <= dim:
        raise ValueError(f"k must be in [1, {dim}], got {k}")
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    W = evecs[:, order]
    # deterministic sign: largest-|coord| of each component positive
    flips = np.sign(W[np.abs(W).argmax(axis=0), np.arange(k)])
    flips[flips == 0] = 1.0
    W = W * flips
    top = evals[order]
    mu = mean if center else np.zeros_like(mean)

    @pandas_udf(T.ArrayType(T.FloatType()))
    def _proj(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)
        p = (m - mu) @ W
        return pd.Series(list(p.astype(np.float32)))

    out = df.select(F.col(id_col), _proj(F.col(vec_col)).alias("proj"))
    return out, W, top
