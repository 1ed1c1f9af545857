"""Deterministic sampling + canonical-doc selection (training-data end-caps)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pprl_spark.operators.dedup import canonical_documents
from pprl_spark.operators.sampling import hash_sample, stratified_sample


def test_hash_sample_partition_independent(spark):
    """The kept set must be a pure function of (key, salt) — identical
    under any repartitioning (df.sample's per-partition RNG is not)."""
    base = spark.range(0, 5_000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"] for r in hash_sample(base, 0.3, salt=1).collect()}
    b = {
        r["doc_id"]
        for r in hash_sample(base.repartition(17, "doc_id"), 0.3, salt=1).collect()
    }
    c = {r["doc_id"] for r in hash_sample(base.coalesce(1), 0.3, salt=1).collect()}
    assert a == b == c
    # rate lands near the target (sha256 is uniform; 5k draws at p=0.3)
    assert 0.25 < len(a) / 5_000 < 0.35
    # a different salt draws a genuinely different set
    d = {r["doc_id"] for r in hash_sample(base, 0.3, salt=2).collect()}
    assert a != d


def test_stratified_sample_rates(spark):
    df = spark.range(0, 3_000).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("keep"), F.lit("drop"), F.lit("half")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
    )
    out = stratified_sample(
        df, "lang", {"keep": 1.0, "drop": 0.0}, default_fraction=0.5, salt=3
    )
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts.get("keep") == 1_000
    assert "drop" not in counts
    assert 400 < counts.get("half", 0) < 600


def test_canonical_documents_picks_best_quality(spark):
    docs = spark.createDataFrame(
        [
            # cluster {1,2,3}: doc 2 has the richest text -> canonical
            (1, "aa bb"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "aa aa aa"),
            # singleton
            (9, "lone document"),
            # cluster {10,11}: identical text -> tie -> min doc_id
            (10, "same words here"),
            (11, "same words here"),
        ],
        "doc_id long, text string",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, entity_id long",
    )
    out = {r["entity_id"]: r for r in canonical_documents(docs, clusters).collect()}
    assert out[1]["canonical_id"] == 2 and out[1]["n_members"] == 3
    assert out[9]["canonical_id"] == 9 and out[9]["n_members"] == 1
    assert out[10]["canonical_id"] == 10 and out[10]["n_members"] == 2
    assert set(out) == {1, 9, 10}


def test_quality_filter_metrics_edge_cases(spark):
    from pprl_spark.functions.text import (
        alpha_word_ratio,
        max_word_len,
        repetition_ratio,
        symbol_ratio,
    )

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam ham"),        # rep 4/5
            (2, "a b c d"),                        # rep 1/4, alpha 1.0
            (3, "### $$$ %%%"),                    # all symbols, alpha 0
            (4, ""),                               # empty -> zeros
            (5, "ok httpsveryverylongunbrokentokenxxxxx"),  # mwl big
            (6, "count 123 456 789"),              # alpha 1/4
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            repetition_ratio("text").alias("rep"),
            symbol_ratio("text").alias("sym"),
            max_word_len("text").alias("mwl"),
            alpha_word_ratio("text").alias("alpha"),
        ).collect()
    }
    assert abs(out[1]["rep"] - 0.8) < 1e-9
    assert abs(out[2]["rep"] - 0.25) < 1e-9 and out[2]["alpha"] == 1.0
    # doc 3: every non-space char is a symbol -> sym = 9/11; no alpha words
    assert abs(out[3]["sym"] - 9 / 11) < 1e-9 and out[3]["alpha"] == 0.0
    assert out[4]["rep"] == 0.0 and out[4]["sym"] == 0.0 and out[4]["mwl"] == 0
    assert out[5]["mwl"] == len("httpsveryverylongunbrokentokenxxxxx")
    assert abs(out[6]["alpha"] - 0.25) < 1e-9


def test_dedup_pipeline_resume_and_sample_invalidation(spark, tmp_path):
    """run_dedup: full execute -> full resume -> rate change re-runs ONLY
    kept_docs (pairs/clusters/canonical reused from their stage tables)."""
    from pprl_spark.plans.dedup_pipeline import run_dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = str(tmp_path / "dd")

    p1 = run_dedup(spark, docs, base, sample_fractions={"en": 0.5})
    assert p1.executed == ["dedup_pairs", "dedup_clusters", "canonical", "kept_docs"]
    k1 = {r["doc_id"] for r in p1.io.read(spark, "kept_docs").collect()}

    p2 = run_dedup(spark, docs, base, sample_fractions={"en": 0.5})
    assert p2.executed == [] and len(p2.skipped) == 4

    p3 = run_dedup(spark, docs, base, sample_fractions={"en": 0.1})
    assert p3.executed == ["kept_docs"]
    assert set(p3.skipped) == {"dedup_pairs", "dedup_clusters", "canonical"}

    # determinism: the kept set is content-addressed, so re-running the
    # original rates (after p3 overwrote the table) reproduces it exactly
    p4 = run_dedup(spark, docs, base, sample_fractions={"en": 0.5})
    assert p4.executed == ["kept_docs"]
    k4 = {r["doc_id"] for r in p4.io.read(spark, "kept_docs").collect()}
    assert k1 == k4


def test_stratified_sample_plan_has_no_exchange(spark):
    """The sampler must stay a pure map-side filter: no Exchange (and no
    join) anywhere in the executed plan — the property that makes it free
    at 100 TB."""
    df = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    out = stratified_sample(df, "lang", {"en": 0.2}, default_fraction=0.5, salt=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_chunk_tokens_edges(spark):
    from pprl_spark.functions.text import chunk_tokens

    df = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(25))),  # 25 toks -> 3 chunks
            (2, "a b c"),                                # short -> 1 chunk
            (3, ""),                                     # empty -> none
            (4, " ".join(f"t{i}" for i in range(20))),  # exact window -> 2
        ],
        "doc_id long, text string",
    )
    rows = (
        df.select("doc_id", F.explode(chunk_tokens("text", size=20, stride=10)).alias("c"))
        .select("doc_id", "c.chunk_id", "c.n_tokens", "c.chunk_text")
        .collect()
    )
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert [(r["chunk_id"], r["n_tokens"]) for r in by_doc[1]] == [(0, 20), (1, 15), (2, 5)]
    assert [(r["chunk_id"], r["n_tokens"]) for r in by_doc[2]] == [(0, 3)]
    assert 3 not in by_doc
    assert [(r["chunk_id"], r["n_tokens"]) for r in by_doc[4]] == [(0, 20), (1, 10)]
    # every token of doc 1 is covered by chunk starts
    assert by_doc[1][0]["chunk_text"].startswith("t0 t1")
    assert by_doc[1][2]["chunk_text"] == "t20 t21 t22 t23 t24"


def test_stratified_sample_table_matches_dict_variant(spark):
    """The broadcast-rate-table variant must keep the identical set as
    the CASE-chain variant (same hash, same rates)."""
    from pprl_spark.operators.sampling import stratified_sample_table

    df = spark.range(0, 4_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 7).cast("string")).alias("lang"),
    )
    rates = {"s0": 1.0, "s1": 0.25, "s2": 0.0}
    a = {
        r["doc_id"]
        for r in stratified_sample(df, "lang", rates, default_fraction=0.4, salt=9).collect()
    }
    rdf = spark.createDataFrame(
        [(k, v) for k, v in rates.items()], "stratum string, fraction double"
    )
    b = {
        r["doc_id"]
        for r in stratified_sample_table(
            df, rdf, "lang", default_fraction=0.4, salt=9
        ).collect()
    }
    assert a == b and len(a) > 0


def test_chunk_tokens_matches_python_reference_all_lengths(spark):
    """One Spark job checks every doc length 0..60 against a Python
    reference of the window formula (coverage + sizes + texts)."""
    from pprl_spark.functions.text import chunk_tokens

    size, stride = 7, 3
    docs = [(n, " ".join(f"w{i}" for i in range(n))) for n in range(0, 61)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got: dict = {}
    for r in (
        df.select("doc_id", F.explode(chunk_tokens("text", size=size, stride=stride)).alias("c"))
        .select("doc_id", "c.chunk_id", "c.n_tokens", "c.chunk_text")
        .collect()
    ):
        got.setdefault(r["doc_id"], []).append((r["chunk_id"], r["n_tokens"], r["chunk_text"]))

    for n, _ in docs:
        w = [f"w{i}" for i in range(n)]
        want = []
        if n > 0:
            n_chunks = 1 + (n - 1) // stride
            for i in range(n_chunks):
                toks = w[i * stride : i * stride + size]
                want.append((i, len(toks), " ".join(toks)))
        assert got.get(n, []) == want, f"n={n}"


def test_pair_review_sample_deterministic_and_bounded(spark):
    import random

    from pprl_spark.operators.sampling import pair_review_sample

    rng = random.Random(23)
    rows = [
        (i, i + 1 + rng.randrange(50), round(rng.random(), 6)) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id1 long, id2 long, sim double")
    one = sorted(
        tuple(r) for r in pair_review_sample(df.repartition(1), k_per_bin=3, salt=11).collect()
    )
    many = sorted(
        tuple(r) for r in pair_review_sample(df.repartition(9), k_per_bin=3, salt=11).collect()
    )
    assert one == many
    from collections import Counter

    per_bin = Counter(r[0] for r in one)
    assert all(v <= 3 for v in per_bin.values())
    assert all(r[4] in (1, 2, 3) for r in one)
    # different salt -> (almost surely) different selection within a
    # populated bin, same bounds
    other = sorted(
        tuple(r) for r in pair_review_sample(df, k_per_bin=3, salt=12).collect()
    )
    assert other != one


def test_pair_review_sample_validation(spark):
    import pytest

    from pprl_spark.operators.sampling import pair_review_sample

    df = spark.createDataFrame([(1, 2, 0.5)], "id1 long, id2 long, sim double")
    with pytest.raises(ValueError):
        pair_review_sample(df, k_per_bin=0)
    with pytest.raises(ValueError):
        pair_review_sample(df, n_bins=0)


def test_entity_consistent_split_no_leakage(spark):
    from pprl_spark.operators.sampling import entity_consistent_split

    # 300 docs in 100 entities of 3 — every entity must land whole
    rows = [(i, i // 3) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, entity_id long")
    out = entity_consistent_split(
        df, [("train", 0.8), ("valid", 0.1), ("test", 0.1)], salt=5
    ).collect()
    by_entity = {}
    for r in out:
        by_entity.setdefault(r.entity_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_entity.values())  # leakage-free
    from collections import Counter

    c = Counter(r.split for r in out)
    assert set(c) <= {"train", "valid", "test"}
    assert c["train"] > c["valid"] and c["train"] > c["test"]
    # deterministic across partitionings
    again = sorted(
        tuple(r)
        for r in entity_consistent_split(
            df.repartition(7), [("train", 0.8), ("valid", 0.1), ("test", 0.1)], salt=5
        ).collect()
    )
    assert again == sorted(tuple(r) for r in out)


def test_entity_consistent_split_validation(spark):
    import pytest

    from pprl_spark.operators.sampling import entity_consistent_split

    df = spark.createDataFrame([(1, 1)], "doc_id long, entity_id long")
    with pytest.raises(ValueError):
        entity_consistent_split(df, [])
    with pytest.raises(ValueError):
        entity_consistent_split(df, [("train", 0.5), ("test", 0.2)])


def test_weighted_sample_deterministic_and_proportional(spark):
    from pprl_spark.operators.sampling import weighted_sample

    # p=0 never kept, p=1 always kept, p=0.5 keeps roughly half;
    # out-of-range probabilities clamp
    rows = (
        [(i, 0.0) for i in range(100)]
        + [(1000 + i, 1.0) for i in range(100)]
        + [(2000 + i, 0.5) for i in range(400)]
        + [(3000, -0.2), (3001, 1.7)]
    )
    df = spark.createDataFrame(rows, "doc_id long, p double")
    kept = {r.doc_id for r in weighted_sample(df, "p", salt=3).collect()}
    assert not any(d < 100 for d in kept)
    assert all((1000 + i) in kept for i in range(100))
    half = sum(1 for d in kept if 2000 <= d < 2400)
    assert 150 <= half <= 250  # ~200 expected
    assert 3000 not in kept and 3001 in kept  # clamped
    # pure function of (key, salt, p): partitioning-independent
    again = {r.doc_id for r in weighted_sample(df.repartition(9), "p", salt=3).collect()}
    assert again == kept
    # a different salt reshuffles the p=0.5 stratum
    other = {r.doc_id for r in weighted_sample(df, "p", salt=4).collect()}
    assert other != kept
