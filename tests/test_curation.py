"""Unit tests for the corpus-curation operators (operators/curation.py):
planted-case semantics for decontamination, repetition filtering, PII
redaction, and semantic (embedding) dedup.  The DuckDB oracle parity for
the same operators runs in test_entry.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logdag_spark.operators.curation import (
    decontaminate,
    gopher_quality,
    pii_redact,
    repetition_filter,
    repetition_stats,
    semantic_dedup,
    token_ngrams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_ngrams_short_docs_empty(spark):
    df = _docs(spark, [(1, "one two"), (2, "a b c d")])
    out = {
        r["doc_id"]: r["g"]
        for r in df.select("doc_id", token_ngrams("text", 3).alias("g")).collect()
    }
    assert out[1] == []  # < n tokens -> no partial grams
    assert out[2] == ["a b c", "b c d"]


def test_decontaminate_flags_leaked_grams(spark):
    bench = _docs(spark, [(100, "the secret eval answer key")])
    corpus = _docs(
        spark,
        [
            (1, "totally clean document text here"),
            (2, "contains the secret eval answer verbatim"),
            (3, "secret eval answer key secret eval answer key"),  # repeats
        ],
    )
    out = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in decontaminate(corpus, bench, n=4).collect()
    }
    assert out[1] == (0, False)
    assert out[2] == (1, True)  # one 4-gram position hits
    # repeated leak counts per POSITION, not per distinct gram
    assert out[3][0] > out[2][0] and out[3][1]


def test_repetition_stats_and_filter(spark):
    df = _docs(
        spark,
        [
            (1, "spam spam spam spam"),  # one token repeated
            (2, "all distinct tokens here now"),
            (3, ""),  # empty doc
        ],
    )
    stats = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}
    assert stats[1]["dup_token_frac"] == 0.75 and stats[1]["top_bigram_frac"] == 1.0
    assert stats[2]["dup_token_frac"] == 0.0
    assert stats[3]["n_tok"] == 0 and stats[3]["top_bigram_frac"] == 0.0
    kept = {
        r["doc_id"]: r["keep"]
        for r in repetition_filter(df, 0.3, 0.5).collect()
    }
    assert kept == {1: False, 2: True, 3: True}


def test_gopher_quality_rules(spark):
    """Each Gopher rule (Rae et al. 2021 §A1.1) fails exactly the doc
    planted to violate it; the clean doc passes every rule."""
    good = "the quick brown fox jumps over dogs and cats with great vigor often"
    df = _docs(
        spark,
        [
            (1, good),                              # passes all rules
            (2, "short of words"),                  # n_words < 5
            (3, "internationalization " * 12),      # mean word len > 10 (and dup)
            (4, "1 2 3 4 5 6 7 8 9 0 11 22 33 44"), # alpha fraction 0
            (5, "quick brown fox jumps high"),      # zero stop words
            (6, "the the the the the of of of"),    # dup_token_frac high
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in gopher_quality(
        df, min_words=5, min_stop_hits=2, max_dup_token_frac=0.5,
        max_top_bigram_frac=0.9,
    ).collect()}
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False and out[2]["n_words"] == 3
    assert out[3]["keep"] is False and out[3]["mean_word_len"] > 10
    assert out[4]["keep"] is False and out[4]["alpha_word_frac"] == 0.0
    assert out[5]["keep"] is False and out[5]["stop_hits"] == 0
    assert out[6]["keep"] is False and out[6]["dup_token_frac"] == 0.75
    # values the SQL oracle must reproduce: 6-decimal-rounded fractions
    assert out[1]["stop_hits"] == 3  # the, and, with
    words = good.split()
    assert abs(
        out[1]["mean_word_len"] - round(sum(map(len, words)) / len(words), 6)
    ) < 1e-12


def test_pii_redact_counts_and_masks(spark):
    df = _docs(
        spark,
        [
            (1, "mail a@b.co and c.d@e-f.org please"),
            (2, "host 10.1.2.3 and 192.168.0.1 up"),
            (3, "card 1234567890123456 ok, short 12345 kept"),
            (4, "mixed x@y.io at 8.8.8.8 id 999999999"),
            (5, "nothing to hide"),
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in pii_redact(df).collect()}
    assert out[1]["n_emails"] == 2 and out[1]["redacted"] == "mail <EMAIL> and <EMAIL> please"
    assert out[2]["n_ips"] == 2 and "<IP>" in out[2]["redacted"]
    assert out[3]["n_longnums"] == 1 and "12345 kept" in out[3]["redacted"]
    assert (out[4]["n_emails"], out[4]["n_ips"], out[4]["n_longnums"]) == (1, 1, 1)
    assert out[5]["redacted"] == "nothing to hide"
    # the email rule consumes its digits before the number rule sees them
    df2 = _docs(spark, [(9, "u123456789@example.com")])
    r9 = pii_redact(df2).collect()[0]
    assert (r9["n_emails"], r9["n_longnums"], r9["redacted"]) == (1, 0, "<EMAIL>")


def test_semantic_dedup_within_cluster_min_id(spark):
    rows = [
        (1, 0, [1.0, 0.0]),
        (2, 0, [1.0, 0.0]),     # dup of 1 (same cluster)
        (3, 0, [0.999, 0.01]),  # near-dup of 1 and 2 -> dup_of = 1
        (4, 1, [1.0, 0.0]),     # identical direction but OTHER cluster
        (5, 0, [0.0, 1.0]),     # orthogonal -> kept
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    out = {
        r["vec_id"]: (r["dup_of"], r["keep"])
        for r in semantic_dedup(df, threshold=0.95, cluster_col="label").collect()
    }
    assert out[1] == (None, True)
    assert out[2] == (1, False)
    assert out[3] == (1, False)
    assert out[4] == (None, True)
    assert out[5] == (None, True)


def test_chunk_documents_stride_and_tail(spark):
    from logdag_spark.operators.text import chunk_documents

    docs = _docs(
        spark,
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 toks
            (2, "a b c"),
            (3, ""),
        ],
    )
    out = chunk_documents(docs, chunk_tokens=4, overlap=1)  # stride 3
    rows = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["chunk_n_tok"])
        for r in out.collect()
    )
    # doc 1: ceil((10-1)/3) = 3 chunks at offsets 0,3,6
    assert [r for r in rows if r[0] == 1] == [
        (1, 0, "t0 t1 t2 t3", 4),
        (1, 1, "t3 t4 t5 t6", 4),
        (1, 2, "t6 t7 t8 t9", 4),
    ]
    assert [r for r in rows if r[0] == 2] == [(2, 0, "a b c", 3)]
    assert not [r for r in rows if r[0] == 3]  # empty doc -> no chunks
    # consecutive chunks share exactly `overlap` tokens
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=0)


def test_unigram_logprob_orders_typicality(spark):
    from logdag_spark.operators.text import unigram_logprob

    docs = _docs(
        spark,
        [
            (1, "the the the the"),          # most frequent token
            (2, "the the rare rare"),
            (3, "singleton"),
            (4, ""),
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in unigram_logprob(docs).collect()}
    # doc 1 uses only the most common token -> lowest avg -ln p
    assert out[1]["logprob"] < out[2]["logprob"] < out[3]["logprob"]
    assert out[4] == {"doc_id": 4, "n_tok": 0, "logprob": 0.0}
    # external model: unseen tokens get the 1/N floor, not -inf/NaN
    model = spark.createDataFrame([("the", 9)], "token string, n long")
    ext = {r["doc_id"]: r["logprob"] for r in unigram_logprob(docs, model).collect()}
    import math

    assert all(math.isfinite(v) for v in ext.values())
    assert ext[3] == round(math.log(9), 6)  # p = 1/9 floor


def test_quantize_embeddings_roundtrip(spark):
    from logdag_spark.operators.similarity import quantize_embeddings

    rows = [
        (1, [0.5, -1.0, 0.25]),
        (2, [0.0, 0.0, 0.0]),
        (3, [2.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r.asDict() for r in quantize_embeddings(df).collect()}
    assert out[1]["qvec"] == [64, -127, 32]  # round(0.5*127), etc.
    assert out[1]["scale"] == 127.0
    assert out[2]["scale"] == 0.0 and out[2]["qvec"] == [0, 0, 0]
    assert out[3]["qvec"] == [127]


def test_source_ngram_overlap_counts_shared(spark):
    from logdag_spark.operators.curation import source_ngram_overlap

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "s1"),
            (2, "alpha beta gamma delta epsilon", "s2"),  # shares 1 4-gram run
            (3, "totally different words here", "s3"),
            (4, "alpha beta gamma delta", "s1"),  # duplicate gram, same source
        ],
        "doc_id long, text string, source string",
    )
    got = {
        (r["src1"], r["src2"]): r["shared_grams"]
        for r in source_ngram_overlap(docs, n=4).collect()
    }
    # s1/s2 share the distinct gram "alpha beta gamma delta" (and "beta
    # gamma delta epsilon" is s2-only); duplicates within s1 count once
    assert got == {("s1", "s2"): 1}


def test_semantic_dedup_ivf_finds_planted_dups(spark):
    import random

    from logdag_spark.operators.curation import semantic_dedup_ivf

    rng = random.Random(5)
    rows = []
    for i in range(60):
        base = [rng.gauss(0, 1) for _ in range(8)]
        rows.append((2 * i, base))
        # planted near-duplicate of every even id
        rows.append((2 * i + 1, [x * 1.0001 for x in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup_ivf(df, threshold=0.999, dim=8, n_clusters=4)
    assert out.count() == 120
    dups = {r["vec_id"]: r["dup_of"] for r in out.where("NOT keep").collect()}
    # scaled copies are cosine-identical and land in the same cell:
    # nearly all odd ids collapse onto their even partner
    hit = sum(1 for v, d in dups.items() if v % 2 == 1 and d == v - 1)
    assert hit >= 50  # recall >= ~0.83 on planted pairs
    # survivors keep NULL dup_of
    assert out.where("keep AND dup_of IS NOT NULL").count() == 0


def test_top_fraction_by_score_integer_cap(spark):
    from logdag_spark.operators.curation import top_fraction_by_score

    # group sizes 10 and 7 -> caps ceil(10/4)=3, ceil(7/4)=2
    rows = [(i, "a", (i * 13) % 40 + 1) for i in range(10)]
    rows += [(100 + i, "b", (i * 7) % 20 + 1) for i in range(7)]
    df = spark.createDataFrame(rows, "doc_id long, source string, score int")
    out = top_fraction_by_score(df, 1, 4, "score", shard_width=4)
    kept = out.where("keep")
    counts = {r["source"]: r["count"] for r in kept.groupBy("source").count().collect()}
    assert counts == {"a": 3, "b": 2}
    # every kept score >= every dropped score within a group
    for src in ("a", "b"):
        kmin = kept.where(f"source = '{src}'").agg({"score": "min"}).first()[0]
        dmax = (
            out.where(f"NOT keep AND source = '{src}'")
            .agg({"score": "max"})
            .first()[0]
        )
        assert kmin >= dmax
    # deterministic across repartitioning
    a = sorted((r["doc_id"], r["score_rank"]) for r in out.collect())
    b = sorted(
        (r["doc_id"], r["score_rank"])
        for r in top_fraction_by_score(
            df.repartition(5), 1, 4, "score", shard_width=4
        ).collect()
    )
    assert a == b


def test_dup_gram_stats_planted_duplication(spark):
    from logdag_spark.operators.curation import dup_gram_stats

    shared = "the quick brown fox jumps"
    docs = spark.createDataFrame(
        [
            (1, shared + " over the lazy dog"),        # shares grams with 2
            (2, shared + " into the cold river"),      # shares grams with 1
            (3, "completely unrelated text body here"),  # no overlap
            (4, "tiny doc"),                            # < n tokens -> 0 grams
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["dup_grams"])
        for r in dup_gram_stats(docs, n=4).collect()
    }
    # doc 1: 9 tokens -> 6 grams; the 2 grams inside "the quick brown fox
    # jumps" also occur in doc 2
    assert got[1] == (6, 2) and got[2] == (6, 2)
    assert got[3] == (2, 0)
    assert got[4] == (0, 0)


def test_remove_dup_spans_planted(spark):
    from logdag_spark.operators.curation import remove_dup_spans

    shared = "the quick brown fox jumps"  # 5 tokens, 2 cross-doc 4-grams
    docs = spark.createDataFrame(
        [
            (1, shared + " over the lazy dog"),
            (2, shared + " into the cold river"),
            (3, "completely unrelated text body here"),
            (4, "tiny doc"),  # < n tokens -> untouched
            (5, shared),      # fully covered -> cleaned == ''
            (6, shared),
            (7, None),        # NULL text -> (0, 0, ''), never NULL
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tok"], r["n_removed"], r["cleaned"])
        for r in remove_dup_spans(docs, n=4).collect()
    }
    # docs 1/2: dup grams start at positions 0 and 1 -> positions 0..4
    # covered, the 4 unique tail tokens survive
    assert got[1] == (9, 5, "over the lazy dog")
    assert got[2] == (9, 5, "into the cold river")
    assert got[3] == (5, 0, "completely unrelated text body here")
    assert got[4] == (2, 0, "tiny doc")
    assert got[5] == (5, 5, "") and got[6] == (5, 5, "")
    assert got[7] == (0, 0, "")


def test_top_fraction_transposed_fraction_raises(spark):
    from logdag_spark.operators.curation import top_fraction_by_score

    df = spark.createDataFrame([(1, "a", 5)], "doc_id long, source string, score int")
    with pytest.raises(ValueError, match="num <= den"):
        top_fraction_by_score(df, 4, 1, "score")


def test_unigram_logprob_duplicate_model_token_raises(spark):
    from logdag_spark.operators.text import unigram_logprob

    df = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    model = spark.createDataFrame(
        [("alpha", 3), ("alpha", 1), ("beta", 2)], "token string, n long"
    )
    with pytest.raises(Exception, match="duplicate model rows"):
        unigram_logprob(df, model=model).collect()


def test_corpus_persist_storage_level_knob(spark):
    """unigram_logprob / remove_dup_spans accept a non-default storage
    level for their corpus-scale internal persist (VERDICT r4 #7)."""
    from pyspark.storagelevel import StorageLevel

    from logdag_spark.operators.curation import remove_dup_spans
    from logdag_spark.operators.text import unigram_logprob

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d x y"), (3, "p q r s t u")],
        "doc_id long, text string",
    )
    def cached_levels(frame):
        plan = frame._jdf.queryExecution().optimizedPlan().toString()
        return [
            line.split("StorageLevel", 1)[1]
            for line in plan.splitlines()
            if "InMemoryRelation" in line
        ]

    spark.catalog.clearCache()
    out = unigram_logprob(df, storage_level=StorageLevel.DISK_ONLY)
    assert out.count() == 3
    levels = cached_levels(out)
    assert levels and all(lv.startswith("(disk,") for lv in levels)
    spark.catalog.clearCache()
    out2 = remove_dup_spans(df, n=2, storage_level=StorageLevel.DISK_ONLY)
    assert out2.count() == 3
    levels = cached_levels(out2)
    assert levels and all(lv.startswith("(disk,") for lv in levels)
    spark.catalog.clearCache()
