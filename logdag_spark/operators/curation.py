"""Corpus-curation operators for the LLM training-data surface.

The reference bounds its corpora to syslog archives; a 100 TB training
pipeline additionally needs the curation passes that decide *which*
documents enter training at all: benchmark decontamination (drop
training docs that leak evaluation n-grams), repetition-based quality
filtering (Gopher-style duplicate-token / dominant-n-gram rules),
PII-style redaction, and semantic (embedding-space) deduplication
(SemDeDup-style: within-cluster cosine pruning).  All four are
DataFrame-native: column expressions and hash-aggregate / broadcast
shapes, no Python in the hot path, exact DuckDB oracles in
entry_queries.py.

Scale shapes (the design decisions that survive 1000 executors):

* decontaminate — the benchmark side is SMALL by construction (an eval
  suite is 1e4-1e6 docs), so its distinct n-gram set is broadcast and
  the corpus side never shuffles by gram; the only shuffle is the
  per-doc hit count, which partial (map-side) aggregation collapses to
  <= 1 row per document BEFORE the exchange because a document's
  exploded grams stay inside its map partition.
* repetition_stats — per-document aggregates only: the (id, gram)
  shuffle is bounded by corpus token count and partial-aggregates the
  heavy duplicate grams map-side; no global state.
* pii_redact — a narrow projection (regexp_replace / regexp_extract_all
  chains, whole-stage codegen); zero shuffles.
* semantic_dedup — the pair join is confined WITHIN a cluster column
  the caller supplies (an IVF cell / kmeans cluster at scale, so the
  quadratic term is bounded by max cluster size, the SemDeDup recipe);
  the L2-normalized compact frame is persisted because a self-join
  re-executes the whole upstream plan per alias (Catalyst does not
  reuse the exchange).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from logdag_spark.operators.similarity import dot, normalize
from logdag_spark.operators.text import tokenize

# ------------------------------------------------------------ decontaminate


def token_ngrams(col: str = "text", n: int = 3) -> Column:
    """NON-distinct token n-gram strings; empty array when the document
    has fewer than ``n`` tokens (no partial grams — a 2-token doc has no
    3-gram, unlike :func:`~logdag_spark.operators.dedup.shingles`, whose
    clamped slice emits short tail grams for MinHash stability).

    Let-bound token array (single-element transform) like ``shingles``:
    inlining the tokenize expression into the per-index lambda re-runs
    the regex split once per gram — O(tokens²) per row.
    """

    def per_doc(toks: Column) -> Column:
        idx = F.sequence(F.lit(0), F.size(toks) - n)
        return F.when(
            F.size(toks) >= n,
            F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")),
        ).otherwise(F.array().cast("array<string>"))

    return F.flatten(F.transform(F.array(tokenize(col)), per_doc))


def benchmark_ngrams(
    benchmark: DataFrame, n: int = 3, col: str = "text"
) -> DataFrame:
    """Distinct n-grams of the benchmark/eval suite — the contamination
    dictionary.  Output: one ``gram`` column."""
    return (
        benchmark.select(F.explode(token_ngrams(col, n)).alias("gram")).distinct()
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    col: str = "text",
    id_col: str = "doc_id",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: per corpus document, how many of its
    n-gram *positions* hit an n-gram that appears anywhere in the
    benchmark set, and the boolean contamination verdict.

    Output: (id_col, n_hits, contaminated).  ``n_hits`` counts gram
    positions (not distinct grams) so a doc that repeats a leaked gram
    scores higher — the signal downstream thresholds actually want.

    The benchmark gram dictionary is broadcast (eval suites are small);
    the corpus side's only exchange is the per-document count, already
    collapsed map-side because one document's exploded grams never leave
    its partition.  For a benchmark too large to broadcast (cross-corpus
    decontamination), pass ``broadcast_benchmark=False`` — the gram join
    becomes a shuffle join and AQE handles the gram-frequency skew.
    """
    grams = benchmark_ngrams(benchmark, n, col)
    if broadcast_benchmark:
        grams = F.broadcast(grams)
    hits = (
        corpus.select(F.col(id_col).alias("_id"), F.explode(token_ngrams(col, n)).alias("gram"))
        .join(grams, "gram")
        .groupBy("_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        corpus.select(id_col)
        .join(hits.withColumnRenamed("_id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def source_ngram_overlap(
    df: DataFrame,
    n: int = 4,
    col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Cross-source contamination matrix: for every unordered source
    pair, how many distinct token n-grams they share — the corpus-level
    view of leakage between slices (e.g. a benchmark slice vs crawl
    slices), where :func:`decontaminate` is the per-document view.

    Shape: one distinct (source, gram) frame — persisted, because the
    pair join is a self-join and Catalyst would otherwise re-run the
    tokenize/explode/distinct pipeline once per alias — then an
    equi-join on gram with ``src1 < src2`` and a pair-count aggregate.
    The per-gram fan-out is bounded by |sources|² (sources are O(10²)),
    never by corpus rows.

    Output: (src1, src2, shared_grams), only pairs sharing >= 1 gram.
    """
    g = (
        df.select(F.col(source_col).alias("_s"), F.explode(token_ngrams(col, n)).alias("gram"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a, b = g.alias("a"), g.alias("b")
    return (
        a.join(b, "gram")
        .where(F.col("a._s") < F.col("b._s"))
        .groupBy(F.col("a._s").alias("src1"), F.col("b._s").alias("src2"))
        .agg(F.count("*").alias("shared_grams"))
    )


# --------------------------------------------------------- repetition filter


def repetition_stats(
    df: DataFrame, col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition diagnostics per document:

    * ``n_tok`` — token count;
    * ``dup_token_frac`` — 1 - distinct/total tokens (0 when empty);
    * ``top_bigram_frac`` — occurrences of the single most frequent
      bigram / total bigram positions (0 when < 2 tokens), ties by count
      only (the max is over counts, no tie-break needed).

    Fractions are rounded to 6 decimals so the double-precision division
    matches the SQL oracle bit-for-bit after rounding.
    """
    toks = tokenize(col)
    base = df.select(
        F.col(id_col),
        F.size(toks).alias("n_tok"),
        F.round(
            F.when(
                F.size(toks) > 0,
                1.0 - F.size(F.array_distinct(toks)) / F.size(toks),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_token_frac"),
    )
    bi = (
        df.select(F.col(id_col).alias("_id"), F.explode(token_ngrams(col, 2)).alias("g"))
        .groupBy("_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("total_c"))
        .select(
            F.col("_id").alias(id_col),
            F.round((F.col("top_c") / F.col("total_c")).cast("double"), 6).alias(
                "top_bigram_frac"
            ),
        )
    )
    return base.join(bi, id_col, "left").withColumn(
        "top_bigram_frac", F.coalesce("top_bigram_frac", F.lit(0.0))
    )


def repetition_filter(
    df: DataFrame,
    max_dup_token_frac: float = 0.3,
    max_top_bigram_frac: float = 0.1,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Repetition-based quality gate: stats plus the keep verdict.
    Thresholds compare the ROUNDED fractions so Spark and the SQL oracle
    decide borderline docs identically."""
    s = repetition_stats(df, col, id_col)
    return s.withColumn(
        "keep",
        (F.col("dup_token_frac") <= max_dup_token_frac)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac),
    )


# the word-presence subset of Gopher's stop list (Rae et al. 2021,
# "Scaling Language Models", table A1 quality rules): the rule counts
# DISTINCT stop words present, not their frequency
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(
    df: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_frac: float = 0.80,
    min_stop_hits: int = 2,
    max_dup_token_frac: float = 0.3,
    max_top_bigram_frac: float = 0.18,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher document-quality gate (Rae et al. 2021 §A1.1): the
    word-level rules — word count in [min, max], mean word length in
    [3, 10], fraction of words containing an alphabetic character
    ≥ 0.8, at least 2 distinct stop words present — composed with the
    repetition rules this module already computes
    (:func:`repetition_stats`: duplicate-token fraction, dominant-
    bigram fraction) into one ``keep`` verdict with every rule's value
    and flag exposed for threshold sweeps.

    All word rules are single-pass column expressions over a let-bound
    token array (one regex split per row, no UDF, no shuffle); the
    repetition join adds the module's existing bounded (id, gram)
    aggregate.  Mean word length avoids a per-word aggregate entirely:
    it is (chars minus whitespace-ish separators) / words, computed as
    ``sum(length(word))`` via aggregate() so the SQL oracle can spell
    the identical quantity.  Fractions round to 6 decimals before the
    threshold compare (same convention as :func:`repetition_filter` —
    Spark and the DuckDB oracle must decide borderline docs
    identically).
    """
    toks = tokenize(col)
    nw = F.size(toks)
    wordlen_sum = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    mean_wl = F.round(
        F.when(nw > 0, wordlen_sum.cast("double") / nw).otherwise(F.lit(0.0)), 6
    )
    alpha = F.round(
        F.when(
            nw > 0,
            F.size(F.filter(toks, lambda w: w.rlike("[a-z]"))).cast("double") / nw,
        ).otherwise(F.lit(0.0)),
        6,
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks), F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
        )
    )
    base = df.select(
        F.col(id_col),
        nw.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        alpha.alias("alpha_word_frac"),
        stop_hits.alias("stop_hits"),
    )
    rep = repetition_stats(df, col, id_col).select(
        id_col, "dup_token_frac", "top_bigram_frac"
    )
    out = base.join(rep, id_col)
    return out.withColumn(
        "keep",
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("alpha_word_frac") >= min_alpha_frac)
        & (F.col("stop_hits") >= min_stop_hits)
        & (F.col("dup_token_frac") <= max_dup_token_frac)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac),
    )


def top_fraction_by_score(
    df: DataFrame,
    num: int,
    den: int,
    score_col: str,
    part_col: str = "source",
    id_col: str = "doc_id",
    shard_width: int = 16,
) -> DataFrame:
    """Keep the top ``num/den`` fraction of each group by an INTEGRAL
    score (e.g. the longest quarter of each source by token count) with
    pure integer semantics: a group of ``n`` rows keeps its best
    ``ceil(n * num / den)`` — no float threshold, so a SQL oracle can
    reproduce the boundary decision exactly (a percentile-interpolation
    threshold risks a 1-ulp disagreement flipping boundary rows).

    Rank = ``row_number() OVER (PARTITION BY part_col ORDER BY score
    DESC, id)`` computed scale-safely via :func:`~logdag_spark.
    operators.scan.partitioned_rank` on the negated score (shards slice
    the score domain, so parallelism scales with score spread /
    ``shard_width``, not with the handful of groups).  Group sizes ride
    the rank's own tiny per-shard counts frame (``total_col``) — no
    second pass over the corpus — and the cap ``ceil(n * num / den)``
    is integer ``div`` arithmetic end to end: a double quotient could
    round across an integer boundary once ``n * num`` leaves the 2^53
    exact range, flipping exactly the boundary row this design exists
    to pin down.

    Output: input columns + ``score_rank`` (long, 1-based, best = 1) +
    ``keep`` (boolean).  ``score_col`` must be integral and non-NULL.
    """
    from logdag_spark.operators.scan import partitioned_rank

    if num < 0 or den <= 0:
        raise ValueError(f"need num >= 0 and den > 0, got {num}/{den}")
    if num > den:
        # a transposed call like (4, 1) would silently keep 100% of every
        # group; fail fast like group_quantiles' 1 <= q_num <= q_den check
        raise ValueError(f"need num <= den, got {num}/{den}")
    reserved = {"_neg_score", "_cap_n", "score_rank", "keep"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"columns {sorted(reserved)} collide with top_fraction internals"
        )
    ranked = partitioned_rank(
        df.withColumn("_neg_score", -F.col(score_col).cast("long")),
        "_neg_score",
        id_col,
        part_cols=(part_col,),
        shard_width=shard_width,
        out_col="score_rank",
        total_col="_cap_n",
    )
    # keep iff rank <= ceil(n * num / den), in pure long arithmetic
    cap = F.expr(f"(_cap_n * {int(num)} + {int(den) - 1}) div {int(den)}")
    return ranked.withColumn("keep", F.col("score_rank") <= cap).drop(
        "_neg_score", "_cap_n"
    )


# ------------------------------------------------- cross-doc duplicated text


def dup_gram_stats(
    df: DataFrame, n: int = 4, col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Cross-document duplicated-text diagnostics at n-gram granularity
    (the detection half of substring-level dedup à la Lee et al.,
    "Deduplicating Training Data Makes Language Models Better"): for
    each document, how many of its n-gram POSITIONS carry a gram that
    also appears in at least one OTHER document.

    Output: (id, ``n_grams`` total gram positions, ``dup_grams``
    positions whose gram occurs in >= 2 distinct docs) — both longs, 0
    for documents shorter than ``n`` tokens.  Integer outputs by design:
    the ratio is the caller's one division, and the DuckDB oracle
    compares exact counts instead of rounded doubles.

    Scale shape: the exploded (id, gram) frame is bounded by corpus
    token count; both aggregates partial-combine map-side (a document's
    grams stay inside its scan partition, and heavy boilerplate grams
    collapse to one (gram, count) row per map task before the
    exchange).  The gram-frequency join emits COUNTS only — a gram
    shared by B docs costs B joined rows, never the B² pairs a
    pair-emitting design would; this is why the operator scales where
    naive all-pairs substring comparison cannot.
    """
    grams = df.select(
        F.col(id_col), F.explode(token_ngrams(col, n)).alias("_gram")
    )
    per_doc = grams.groupBy(id_col, "_gram").agg(F.count(F.lit(1)).alias("_occ"))
    gram_docs = per_doc.groupBy("_gram").agg(F.count(F.lit(1)).alias("_n_docs"))
    stats = (
        per_doc.join(gram_docs, "_gram")
        .groupBy(id_col)
        .agg(
            F.sum("_occ").alias("_n_grams"),
            F.sum(F.when(F.col("_n_docs") >= 2, F.col("_occ")).otherwise(0)).alias(
                "_dup_grams"
            ),
        )
    )
    return (
        df.select(id_col)
        .join(stats, id_col, "left")
        .select(
            id_col,
            F.coalesce("_n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("_dup_grams", F.lit(0)).cast("long").alias("dup_grams"),
        )
    )


def remove_dup_spans(
    df: DataFrame,
    n: int = 4,
    col: str = "text",
    id_col: str = "doc_id",
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Substring-level duplicate REMOVAL — the action half of Lee et
    al.'s "Deduplicating Training Data Makes Language Models Better"
    (:func:`dup_gram_stats` is the detection half): every token
    position covered by an n-gram that occurs in >= 2 distinct
    documents is dropped, and the document is rebuilt from the
    surviving tokens.  A position ``p`` is covered iff some duplicated
    gram STARTS in ``[p-n+1, p]``.

    Output: ``(id_col, n_tok, n_removed, cleaned)`` — ``cleaned`` is
    the canonical single-space token rebuild (this pipeline's token
    normal form; original whitespace/punctuation is not preserved),
    ``''`` for a fully-duplicated document.

    Scale shape: the positional gram frame is bounded by corpus token
    count; the dup decision travels as gram doc-COUNTS (a gram shared
    by B docs costs B joined rows, never the B² pairs of a
    pair-emitting design); per-doc duplicated-start lists come back
    through one aggregate; the coverage test is a per-row higher-order
    filter — O(tokens × dup_starts) per document, bounded by the
    upstream document-length cap (``chunk_documents``), with no
    additional shuffle.

    Cache lifecycle: the positional gram frame (≈ corpus token count in
    rows — a multiple of corpus size on executor storage at 100 TB) is
    persisted at ``storage_level`` for the lifetime of the RETURNED lazy
    frame; pass ``StorageLevel.DISK_ONLY`` to keep it out of executor
    memory, and release it with ``spark.catalog.clearCache()`` once the
    result is materialized — the entry shim does this between queries.
    """
    # NULL text -> empty token array (size(NULL) is NULL and would leak
    # NULL n_tok/n_removed where every sibling operator reports 0)
    toks = F.coalesce(tokenize(col), F.array().cast("array<string>"))
    base = df.select(F.col(id_col), toks.alias("_toks"))
    grams = base.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size("_toks") >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size("_toks") - n),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.array_join(F.slice("_toks", i + 1, n), " ").alias(
                            "gram"
                        ),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<pos:int,gram:string>>"))
        ).alias("_g"),
    ).select(id_col, F.col("_g.pos").alias("_pos"), F.col("_g.gram").alias("_gram"))
    # persisted: the gram frame feeds BOTH the dup aggregate and the
    # probe side of the dup join, and Catalyst plans no ReusedExchange
    # across DataFrame branches — unpersisted, the corpus tokenize +
    # positional explode (the expensive stage) would run once per branch
    grams = grams.persist(storage_level)
    dup = (
        grams.groupBy("_gram")
        .agg(F.count_distinct(id_col).alias("_nd"))
        .where(F.col("_nd") >= 2)
        .select("_gram")
    )
    starts = (
        grams.join(dup, "_gram")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("_pos")).alias("_starts"))
    )
    idx = F.when(
        F.size("_toks") > 0, F.sequence(F.lit(0), F.size("_toks") - 1)
    ).otherwise(F.array().cast("array<int>"))
    kept = F.filter(
        idx,
        lambda i: ~F.exists(
            F.col("_starts"), lambda s: (s <= i) & (i < s + n)
        ),
    )
    return (
        base.join(starts, id_col, "left")
        .withColumn(
            "_starts", F.coalesce("_starts", F.array().cast("array<int>"))
        )
        .withColumn("_kept", kept)
        .select(
            id_col,
            F.size("_toks").cast("long").alias("n_tok"),
            (F.size("_toks") - F.size("_kept")).cast("long").alias("n_removed"),
            F.array_join(
                F.transform("_kept", lambda i: F.element_at("_toks", i + 1)),
                " ",
            ).alias("cleaned"),
        )
    )


# --------------------------------------------------------------- PII redact

# Patterns restricted to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB): char classes, bounded repeats, \b, \d.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
LONGNUM_RE = r"\b\d{9,}\b"


def pii_redact(
    df: DataFrame, col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII-style masking: emails -> ``<EMAIL>``, IPv4 -> ``<IP>``, long
    (>= 9 digit) numbers -> ``<NUM>``, applied in that order; counts are
    taken per stage on the stage's INPUT text so an address consumed by
    the email rule is not double-counted by the number rule.

    Output: (id_col, n_emails, n_ips, n_longnums, redacted).  Pure
    narrow projection — regexp chains inside whole-stage codegen, no
    shuffle, no UDF.
    """
    t0 = F.col(col)
    t1 = F.regexp_replace(t0, EMAIL_RE, "<EMAIL>")
    t2 = F.regexp_replace(t1, IPV4_RE, "<IP>")
    t3 = F.regexp_replace(t2, LONGNUM_RE, "<NUM>")
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(t0, F.lit(EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(t1, F.lit(IPV4_RE), F.lit(0))).alias("n_ips"),
        F.size(F.regexp_extract_all(t2, F.lit(LONGNUM_RE), F.lit(0))).alias("n_longnums"),
        t3.alias("redacted"),
    )


# ----------------------------------------------------------- semantic dedup


def semantic_dedup(
    df: DataFrame,
    threshold: float,
    cluster_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style embedding dedup: within each cluster, a vector is
    a duplicate iff some SMALLER id in the same cluster has cosine
    similarity >= ``threshold`` with it (decided on the 6-decimal-rounded
    cosine, matching the SQL oracle).  ``dup_of`` is the smallest such
    dominating id; ``keep`` marks survivors.

    The "exists a smaller id" rule (rather than greedy sequential
    pruning) is deliberately order-free: it is decidable per pair, needs
    one aggregation, and is exactly expressible in SQL — the published
    SemDeDup keeps one arbitrary point per similarity cluster, and
    min-id domination is that choice made deterministic.

    ``cluster_col`` bounds the quadratic pair join: pass a kmeans/IVF
    cell id at corpus scale (``similarity.kmeans_centroids`` +
    ``assign_cluster``), a curated label for exact-oracle tests.  The
    compact L2-normalized frame is persisted — a self-join otherwise
    re-executes the upstream plan once per alias (no exchange reuse).

    Output: (id_col, cluster_col, dup_of, keep).
    """
    norm = df.select(
        F.col(id_col).alias("_id"),
        F.col(cluster_col).alias("_cl"),
        normalize(F.col(vec_col)).alias("_nv"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    return _semantic_dedup_on(norm, id_col, cluster_col, threshold)


def _semantic_dedup_on(
    norm: DataFrame, id_col: str, cluster_col: str, threshold: float
) -> DataFrame:
    a, b = norm.alias("a"), norm.alias("b")
    dom = (
        a.join(
            b,
            (F.col("a._cl") == F.col("b._cl")) & (F.col("a._id") > F.col("b._id")),
        )
        .where(F.round(dot(F.col("a._nv"), F.col("b._nv")), 6) >= threshold)
        .groupBy(F.col("a._id").alias("_id"))
        .agg(F.min(F.col("b._id")).alias("dup_of"))
    )
    return (
        norm.select("_id", "_cl")
        .join(dom, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("_cl").alias(cluster_col),
            "dup_of",
            F.col("dup_of").isNull().alias("keep"),
        )
    )


def semantic_dedup_ivf(
    df: DataFrame,
    threshold: float,
    dim: int,
    n_clusters: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> DataFrame:
    """The corpus-scale :func:`semantic_dedup` path made concrete: the
    cluster column is an IVF cell from spherical k-means
    (``similarity.kmeans_centroids`` + ``assign_cluster``), so the
    quadratic pair join is bounded by max cell size (choose n_clusters
    ~ sqrt(N)).  APPROXIMATE by construction — a near-duplicate pair
    split across two cells is never compared (the SemDeDup trade-off);
    raise n_clusters for speed, lower it for recall.

    Output: (id_col, ivf_cell, dup_of, keep).
    """
    from logdag_spark.operators.similarity import (
        assign_cluster,
        kmeans_centroids,
    )

    cent = kmeans_centroids(
        df, dim, n_clusters, n_iter, id_col=id_col, vec_col=vec_col, seed=seed
    )
    norm = df.select(
        F.col(id_col).alias("_id"),
        assign_cluster(cent)(F.col(vec_col)).alias("_cl"),
        normalize(F.col(vec_col)).alias("_nv"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    return _semantic_dedup_on(norm, id_col, "ivf_cell", threshold)
