"""Corpus-level operators: vocab top-k, decontamination, TF-IDF, blocklist."""

import pytest
from pyspark.sql import functions as F

from pprl_spark.functions.text import blocklist_hits, scrub_blocklist
from pprl_spark.operators.corpus import (
    benchmark_grams,
    decontaminate,
    tfidf_top_terms,
    vocab_topk,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a b c a b a"),
        (2, "a b c d e f"),
        (3, "x y z x y x"),
        (4, "a b c d e f g h"),  # shares the 'a b c d e f' run with 2
        (5, ""),  # empty doc: no tokens, no grams
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_vocab_topk_order_and_ties(spark, docs):
    got = vocab_topk(docs, k=4).collect()
    # counts: a=5, b=4, c=3, x=3, y=2, d=2, e=2, f=2, ...
    # tie at cnt=3 resolves alphabetically: c before x
    assert [(r["word"], r["cnt"]) for r in got] == [
        ("a", 5), ("b", 4), ("c", 3), ("x", 3)
    ]


def test_vocab_topk_partitioning_independent(spark, docs):
    one = vocab_topk(docs.repartition(1), k=5).collect()
    many = vocab_topk(docs.repartition(7), k=5).collect()
    assert [(r["word"], r["cnt"]) for r in one] == [(r["word"], r["cnt"]) for r in many]


def test_vocab_topk_rejects_bad_k(docs):
    with pytest.raises(ValueError):
        vocab_topk(docs, k=0)


def test_benchmark_grams_distinct(spark, docs):
    bench = docs.where(F.col("doc_id") == 1)  # "a b c a b a": 4 3-grams, all distinct
    assert benchmark_grams(bench, n=3).count() == 4


def test_decontaminate_flags_shared_ngrams(spark, docs):
    bench = docs.where(F.col("doc_id") == 2)  # grams of "a b c d e f"
    corpus = docs.where(F.col("doc_id") != 2)
    got = {(r["doc_id"], r["n_shared"]) for r in decontaminate(corpus, bench, n=3).collect()}
    # doc 1 shares "a b c"; doc 4 shares all four of doc 2's 3-grams;
    # docs 3 and 5 share nothing and are absent
    assert got == {(1, 1), (4, 4)}


def test_decontaminate_no_broadcast_same_result(spark, docs):
    bench = docs.where(F.col("doc_id") == 2)
    corpus = docs.where(F.col("doc_id") != 2)
    a = set(map(tuple, decontaminate(corpus, bench, n=3).collect()))
    b = set(map(tuple, decontaminate(corpus, bench, n=3, broadcast_benchmark=False).collect()))
    assert a == b


def test_tfidf_top_terms_scores(spark, docs):
    out = tfidf_top_terms(docs, n_top=2)
    rows = {(r["doc_id"], r["rank"]): (r["word"], r["score"]) for r in out.collect()}
    # doc 3: x appears 3/6 times, df(x)=1 -> idf (4+1)/(1+1)=2.5 -> 1.25;
    # y 2/6, idf 2.5 -> ~0.8333 (n_docs counts the empty doc too: N=5? no —
    # N = docs.count() = 5, idf = 6/2 = 3.0)
    w, s = rows[(3, 1)]
    assert w == "x" and abs(s - (3 / 6) * (6 / 2)) < 1e-9
    w, s = rows[(3, 2)]
    assert w == "y" and abs(s - (2 / 6) * (6 / 2)) < 1e-9
    # empty doc contributes no rows
    assert not any(d == 5 for d, _ in rows)
    # ranks are 1..n_top at most
    assert all(r in (1, 2) for _, r in rows)


def test_tfidf_tie_breaks_alphabetical(spark):
    df = spark.createDataFrame(
        [(1, "b a"), (2, "c d")], "doc_id long, text string"
    )
    out = tfidf_top_terms(df, n_top=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["word"]))
    # equal tf and df for both words of each doc -> identical scores ->
    # alphabetical order decides rank
    assert sorted(by_doc[1]) == [(1, "a"), (2, "b")]
    assert sorted(by_doc[2]) == [(1, "c"), (2, "d")]


def test_blocklist_hits_and_scrub(spark):
    df = spark.createDataFrame(
        [(1, "Slow query SLOW scan"), (2, "fast scan"), (3, "")],
        "doc_id long, text string",
    )
    out = df.select(
        "doc_id",
        blocklist_hits("text", ["slow", "error"]).alias("h"),
        scrub_blocklist("text", ["slow", "error"], "[X]").alias("s"),
    ).collect()
    got = {r["doc_id"]: (r["h"], r["s"]) for r in out}
    assert got[1] == (2, "[X] query [X] scan")  # case-normalized matching
    assert got[2] == (0, "fast scan")
    assert got[3] == (0, "")


# --- interleaved span-sequence dedup (input_hint shape) -----------------

SPAN_SCHEMA = (
    "doc_id long, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def test_span_serialize_sorts_by_offset(spark):
    from pprl_spark.operators.dedup import span_serialize_col

    rows = [
        (1, [("text", "b", None, 1), ("text", "a", None, 0)]),
        (2, [("text", "a", None, 0), ("text", "b", None, 1)]),
    ]
    df = spark.createDataFrame(rows, SPAN_SCHEMA)
    got = df.select("doc_id", span_serialize_col("spans").alias("s")).collect()
    vals = {r["doc_id"]: r["s"] for r in got}
    assert vals[1] == vals[2]  # same sequence once offset-ordered


def test_span_serialize_separators_prevent_collisions(spark):
    from pprl_spark.operators.dedup import span_serialize_col

    rows = [
        (1, [("text", "ab", None, 0)]),
        (2, [("text", "a", "b", 0)]),  # text/media_ref boundary
        (3, [("text", "a", None, 0), ("text", "b", None, 1)]),  # span boundary
    ]
    df = spark.createDataFrame(rows, SPAN_SCHEMA)
    got = [r["s"] for r in df.select(span_serialize_col("spans").alias("s")).collect()]
    assert len(set(got)) == 3


def test_exact_duplicate_spans(spark):
    from pprl_spark.operators.dedup import exact_duplicate_spans

    rows = [
        (1, [("text", "x", None, 0), ("image", None, "img://1", 1)]),
        (2, [("text", "x", None, 0), ("image", None, "img://1", 1)]),  # dup of 1
        (3, [("text", "x", None, 0), ("image", None, "img://2", 1)]),  # media differs
        (4, [("text", "x", None, 0)]),  # shorter sequence
    ]
    df = spark.createDataFrame(rows, SPAN_SCHEMA)
    got = {(r["doc_id"], r["canonical_id"], r["n_copies"])
           for r in exact_duplicate_spans(df).collect()}
    assert got == {(1, 1, 2), (2, 1, 2)}


def test_token_budget_sample(spark):
    from pprl_spark.operators.sampling import PPM, token_budget_sample, sample_hash
    from pyspark.sql import functions as F

    rows = [(i, "en" if i < 8 else "zh", 100) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, nt long")
    # en total = 800 -> budget 400 = rate 500000ppm; zh total 400 <= 1000 -> keep all
    out = token_budget_sample(df, "lang", {"en": 400, "zh": 1000}, "nt", salt=3)
    got = {r["doc_id"] for r in out.collect()}
    assert {i for i in range(8, 12)} <= got  # zh fully kept
    # en membership is exactly the hash rule at 500000 ppm
    hashes = {
        r["doc_id"]: r["h"]
        for r in df.where("lang = 'en'")
        .select("doc_id", (sample_hash(F.col("doc_id"), 3) % PPM).alias("h"))
        .collect()
    }
    want_en = {d for d, h in hashes.items() if h < 500_000}
    assert {d for d in got if d < 8} == want_en


def test_token_budget_sample_drops_unbudgeted_strata(spark):
    from pprl_spark.operators.sampling import token_budget_sample

    df = spark.createDataFrame(
        [(1, "en", 10), (2, "xx", 10)], "doc_id long, lang string, nt long"
    )
    out = token_budget_sample(df, "lang", {"en": 100}, "nt", default_budget=None)
    assert {r["doc_id"] for r in out.collect()} == {1}


def test_quality_trim_drops_bottom_fraction(spark):
    from pprl_spark.operators.corpus import quality_trim
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "doc_id long, q double"
    )
    out = quality_trim(df, F.col("q"), frac=0.5)
    # type-7 percentile(0.5) over 0..9 = 4.5 -> keep q >= 4.5
    assert {r["doc_id"] for r in out.collect()} == {5, 6, 7, 8, 9}


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_decontaminate_plan_broadcasts_benchmark(spark, docs):
    from pprl_spark.operators.corpus import decontaminate

    bench = docs.where(F.col("doc_id") == 2)
    corpus = docs.where(F.col("doc_id") != 2)
    plan = _plan(decontaminate(corpus, bench, n=3))
    assert "BroadcastHashJoin" in plan  # benchmark grams broadcast
    # the corpus side must reach the join without any exchange: the only
    # hash exchanges allowed are the benchmark-gram distinct and the
    # final per-doc count
    assert plan.count("Exchange hashpartitioning") <= 2


def test_tfidf_plan_broadcast_and_window_limit(spark, docs):
    from pprl_spark.operators.corpus import tfidf_top_terms

    plan = _plan(tfidf_top_terms(docs, n_top=2))
    assert "BroadcastHashJoin" in plan  # IDF table broadcast back
    # Spark 4 pushes the rank<=n filter into a pre-shuffle partial
    # group-limit, so only ~n rows per (doc, partition) ride the window
    # exchange — if this ever disappears the top-n becomes a full sort
    assert "WindowGroupLimit" in plan


# ---------------------------------------------------------------------------
# Unigram surprisal / CCNet-style perplexity buckets
# ---------------------------------------------------------------------------


def test_unigram_surprisals_golden(spark, docs):
    import math

    from pprl_spark.operators.corpus import unigram_surprisals

    got = {r["word"]: (r["cnt"], r["surprisal_u"]) for r in unigram_surprisals(docs).collect()}
    # counts over docs 1-4 (doc 5 is empty): total = 26 tokens
    counts = {"a": 5, "b": 4, "c": 3, "x": 3, "d": 2, "e": 2, "f": 2, "y": 2,
              "z": 1, "g": 1, "h": 1}
    assert {w: c for w, (c, _) in got.items()} == counts
    for w, c in counts.items():
        assert got[w][1] == math.floor(1e6 * math.log(26.0 / c)), w


def test_surprisal_scores_integer_mean(spark, docs):
    from pprl_spark.operators.corpus import surprisal_scores, unigram_surprisals

    vocab = unigram_surprisals(docs)
    su = {r["word"]: r["surprisal_u"] for r in vocab.collect()}
    got = {r["doc_id"]: r for r in surprisal_scores(docs, vocab).collect()}
    texts = {1: "a b c a b a", 2: "a b c d e f", 3: "x y z x y x",
             4: "a b c d e f g h"}
    assert set(got) == set(texts)  # doc 5 (zero tokens) dropped, CCNet-style
    for d, t in texts.items():
        toks = t.split()
        exp_sum = sum(su[w] for w in toks)
        assert got[d]["n_tokens"] == len(toks)
        assert got[d]["sum_u"] == exp_sum
        assert got[d]["mean_u"] == exp_sum // len(toks)  # exact integer floor


def test_surprisal_scores_oov_modes(spark, docs):
    from pprl_spark.operators.corpus import surprisal_scores, unigram_surprisals

    vocab = unigram_surprisals(docs).where(F.col("cnt") >= 2)  # trim: drops z,g,h
    # inner-join semantics: OOV tokens skipped, n_tokens counts scored only
    inner = {r["doc_id"]: r for r in surprisal_scores(docs, vocab).collect()}
    assert inner[3]["n_tokens"] == 5  # 'z' skipped from 'x y z x y x'
    assert inner[4]["n_tokens"] == 6  # 'g h' skipped
    # default-surprisal semantics: OOV charged at the given rate
    flat = {r["doc_id"]: r for r in
            surprisal_scores(docs, vocab, oov_surprisal_u=9_000_000).collect()}
    assert flat[3]["n_tokens"] == 6
    assert flat[3]["sum_u"] == inner[3]["sum_u"] + 9_000_000


def test_perplexity_buckets_tertiles(spark, docs):
    from pprl_spark.operators.corpus import (
        perplexity_buckets,
        surprisal_scores,
        unigram_surprisals,
    )

    scores = surprisal_scores(docs, unigram_surprisals(docs))
    got = {r["doc_id"]: r for r in perplexity_buckets(scores).collect()}
    means = sorted(r["mean_u"] for r in got.values())
    # type-7 percentile over n=4 values: pos = p*(n-1)
    def q(p):
        pos = p * (len(means) - 1)
        lo, f = int(pos), pos - int(pos)
        return means[lo] + f * (means[min(lo + 1, len(means) - 1)] - means[lo])

    lo, hi = q(1.0 / 3.0), q(2.0 / 3.0)
    for r in got.values():
        exp = "head" if r["mean_u"] <= lo else ("middle" if r["mean_u"] <= hi else "tail")
        assert r["bucket"] == exp, (r["doc_id"], r["mean_u"], lo, hi)
    assert {r["bucket"] for r in got.values()} >= {"head", "tail"}


def test_surprisal_plan_broadcasts_vocab(spark, docs):
    from pprl_spark.operators.corpus import (
        perplexity_buckets,
        surprisal_scores,
        unigram_surprisals,
    )

    out = perplexity_buckets(surprisal_scores(docs, unigram_surprisals(docs)))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # vocab and the 1-row total/threshold aggregates join broadcast-side;
    # the only corpus-sized exchanges are the word-count and per-doc
    # groupBys (both map-side combined)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_surprisal_partitioning_independent(spark, docs):
    from pprl_spark.operators.corpus import surprisal_scores, unigram_surprisals

    def run(d):
        return sorted(
            (r["doc_id"], r["n_tokens"], r["sum_u"], r["mean_u"])
            for r in surprisal_scores(d, unigram_surprisals(d)).collect()
        )

    assert run(docs.repartition(1)) == run(docs.repartition(7))


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------


def test_pii_counts_and_scrub_golden(spark):
    from pprl_spark.functions.text import pii_counts, scrub_pii

    rows = [
        (1, "Mail Bob.Smith+x@Corp.Example NOW"),
        (2, "srv 10.0.0.1 and 192.168.1.255 up"),
        (3, "call 555-123-4567 or 555.987.6543"),
        (4, "no pii here 1234 5678"),
        (5, "a@b.co at 8.8.8.8 tel 123-456-7890"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", *pii_counts("text"), scrub_pii("text").alias("s")
        ).collect()
    }
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_phone"]) == (1, 0, 0)
    assert got[1]["s"] == "mail [EMAIL] now"
    assert got[2]["n_ipv4"] == 2 and got[2]["s"] == "srv [IP] and [IP] up"
    assert got[3]["n_phone"] == 2
    assert got[3]["s"] == "call [PHONE] or [PHONE]"
    assert (got[4]["n_email"], got[4]["n_ipv4"], got[4]["n_phone"]) == (0, 0, 0)
    assert got[5]["s"] == "[EMAIL] at [IP] tel [PHONE]"


def test_pii_scrub_plan_no_exchange(spark):
    from pprl_spark.functions.text import pii_counts, scrub_pii

    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("x a@b.co y").alias("text")
    )
    out = df.select("doc_id", *pii_counts("text"), scrub_pii("text").alias("s"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_corpus_rollup_levels_consistent(spark, docs):
    from pprl_spark.operators.corpus import corpus_rollup

    d = docs.withColumn("lang", F.when(F.col("doc_id") <= 2, "en").otherwise("fr")) \
            .withColumn("source", F.concat(F.lit("s"), (F.col("doc_id") % 2).cast("string")))
    rows = corpus_rollup(d).collect()
    total = [r for r in rows if r["gid"] == 3]
    assert len(total) == 1 and total[0]["n_docs"] == 5
    assert total[0]["lang_g"] == "<all>" and total[0]["source_g"] == "<all>"
    # per-lang subtotals sum to the grand total at every measure
    lang_rows = [r for r in rows if r["gid"] == 1]
    for m in ("n_docs", "n_tokens", "n_chars"):
        assert sum(r[m] for r in lang_rows) == total[0][m]
    # leaf level sums to each lang subtotal
    for lr in lang_rows:
        leaves = [r for r in rows if r["gid"] == 0 and r["lang_g"] == lr["lang_g"]]
        assert sum(r["n_docs"] for r in leaves) == lr["n_docs"]


def test_corpus_rollup_single_exchange(spark, docs):
    from pprl_spark.operators.corpus import corpus_rollup

    d = docs.withColumn("lang", F.lit("en")).withColumn("source", F.lit("s0"))
    plan = corpus_rollup(d)._jdf.queryExecution().executedPlan().toString()
    # one Expand + one exchange: all grouping-set levels share a pass
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Expand" in plan


def test_blocking_stats_topk_and_total(spark):
    from pprl_spark.operators.blocking import blocking_stats

    df = spark.createDataFrame(
        [(i, f"b{i % 3}") for i in range(10)] + [(100, "hot")] * 0,
        "doc_id long, block_key string",
    )
    rows = {r["rank"]: r for r in blocking_stats(df, k=2).collect()}
    # sizes: b0=4, b1=3, b2=3 (tie at 3 -> b1 before b2)
    assert rows[1]["block_key"] == "b0" and rows[1]["size"] == 4 and rows[1]["pairs"] == 6
    assert rows[2]["block_key"] == "b1" and rows[2]["size"] == 3
    tot = rows[0]
    assert tot["block_key"] == "<all>" and tot["size"] == 10
    assert tot["pairs"] == 6 + 3 + 3 and tot["n_blocks"] == 3


def test_blocking_stats_no_global_sort(spark):
    from pprl_spark.operators.blocking import blocking_stats

    df = spark.createDataFrame(
        [(i, f"b{i % 5}") for i in range(50)], "doc_id long, block_key string"
    )
    plan = blocking_stats(df, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # heap top-k, not a sort


def test_cross_media_duplicates_semantics(spark):
    from pprl_spark.operators.dedup import cross_media_duplicates

    def doc(i, texts, refs):
        spans = [("text", t, None, j) for j, t in enumerate(texts)]
        spans += [("image", None, r, len(texts) + j) for j, r in enumerate(refs)]
        return (i, spans)

    rows = [
        doc(1, ["a", "b"], ["img1"]),
        doc(2, ["a", "b"], ["img2"]),      # same text, different media -> flagged with 1
        doc(3, ["a", "b"], ["img1"]),      # exact dup of 1 (same media) -> same group
        doc(4, ["a", "c"], ["img1"]),      # different text -> not in group
        doc(5, ["x"], ["m1"]),
        doc(6, ["x"], ["m1"]),             # same text AND same media -> NOT flagged
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, spans array<struct<kind string, text string, media_ref string, offset int>>",
    )
    got = {r["doc_id"]: r for r in cross_media_duplicates(df).collect()}
    assert set(got) == {1, 2, 3}
    for i in (1, 2, 3):
        assert got[i]["text_canonical_id"] == 1
        assert got[i]["n_text_copies"] == 3
        assert got[i]["n_media_variants"] == 2


def test_cross_media_media_order_matters(spark):
    from pprl_spark.operators.dedup import cross_media_duplicates

    rows = [
        (1, [("text", "a", None, 0), ("image", None, "m1", 1), ("image", None, "m2", 2)]),
        (2, [("text", "a", None, 0), ("image", None, "m2", 1), ("image", None, "m1", 2)]),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, spans array<struct<kind string, text string, media_ref string, offset int>>",
    )
    # same text, same media SET but different media ORDER -> 2 variants
    got = {r["doc_id"]: r["n_media_variants"] for r in cross_media_duplicates(df).collect()}
    assert got == {1: 2, 2: 2}


def test_profile_columns_counts_nulls_and_extremes(spark):
    from pprl_spark.operators.corpus import profile_columns

    rows = [(1, "b", None), (2, None, 5), (3, "a", 9), (3, "a", None)]
    df = spark.createDataFrame(rows, "id long, s string, v long")
    got = {r.col_name: r for r in profile_columns(df).collect()}
    assert set(got) == {"id", "s", "v"}
    assert all(r.n_rows == 4 for r in got.values())
    assert (got["id"].n_nulls, got["id"].n_distinct) == (0, 3)
    assert (got["s"].n_nulls, got["s"].n_distinct) == (1, 2)
    assert (got["v"].n_nulls, got["v"].n_distinct) == (2, 2)
    # native-type order BEFORE the string cast: numeric min of v is "5"
    assert (got["v"].min_val, got["v"].max_val) == ("5", "9")
    assert (got["s"].min_val, got["s"].max_val) == ("a", "b")


def test_bigram_lm_hand_computed(spark):
    import math

    from pprl_spark.operators.corpus import bigram_scores, bigram_surprisals

    rows = [(1, "a b a c"), (2, "a b"), (3, "x")]  # doc 3: no bigrams
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = {r.bigram: r for r in bigram_surprisals(df).collect()}
    # counts: ab=2, ba=1, ac=1; ctx a=3, b=1
    assert (vocab["a b"].cnt, vocab["a b"].ctx_cnt) == (2, 3)
    assert vocab["a b"].surprisal_b == math.floor(1e6 * math.log(3 / 2))
    assert vocab["b a"].surprisal_b == 0  # p(a|b) = 1
    assert vocab["a c"].surprisal_b == math.floor(1e6 * math.log(3))
    # conditional distribution normalizes exactly: sum cnt per ctx == ctx_cnt
    assert vocab["a b"].cnt + vocab["a c"].cnt == vocab["a b"].ctx_cnt

    got = {r.doc_id: r for r in bigram_scores(df, bigram_surprisals(df)).collect()}
    assert set(got) == {1, 2}  # the 1-word doc has no cross-entropy
    s_ab, s_ac = vocab["a b"].surprisal_b, vocab["a c"].surprisal_b
    assert (got[1].n_bigrams, got[1].sum_b) == (3, s_ab + 0 + s_ac)
    assert got[1].mean_b == (s_ab + s_ac) // 3
    assert (got[2].n_bigrams, got[2].mean_b) == (1, s_ab)


def test_pmi_collocations_hand_computed(spark):
    import math

    from pprl_spark.operators.corpus import pmi_collocations

    # bigram events: "a b" x3, "a c" x1, "c a" x1  (from "a b a b a b", "a c a")
    rows = [(1, "a b a b a b"), (2, "a c a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.bigram: r for r in pmi_collocations(df, min_count=1, k=10).collect()}
    # events: d1 -> ab, ba, ab, ba, ab; d2 -> ac, ca ; N = 7
    # counts: ab=3, ba=2, ac=1, ca=1
    # c_left:  a=ab+ac=4, b=ba=2, c=ca=1
    # c_right: b=3, a=ba+ca=3, c=1
    n = 7.0
    assert got["a b"].cnt == 3 and got["a b"].c_left == 4 and got["a b"].c_right == 3
    assert got["a b"].pmi_u == math.floor(1e6 * math.log((n * 3) / (4 * 3)))
    assert got["c a"].pmi_u == math.floor(1e6 * math.log((n * 1) / (1 * 3)))
    # min_count guard drops the hapax pairs
    kept = {r.bigram for r in pmi_collocations(df, min_count=2, k=10).collect()}
    assert kept == {"a b", "b a"}


def test_pmi_partitioning_independent(spark):
    from pprl_spark.operators.corpus import pmi_collocations

    import random

    rng = random.Random(5)
    rows = [
        (i, " ".join(rng.choice("abcdefgh") for _ in range(20))) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    one = pmi_collocations(df.repartition(1), min_count=2, k=15).collect()
    many = pmi_collocations(df.repartition(13), min_count=2, k=15).collect()
    assert [(r.bigram, r.pmi_u) for r in one] == [(r.bigram, r.pmi_u) for r in many]


def test_equiwidth_histogram_integer_bucketing(spark):
    from pprl_spark.operators.corpus import equiwidth_histogram

    rows = [(i, v) for i, v in enumerate([0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9])]
    df = spark.createDataFrame(rows, "doc_id long, n int")
    got = {r.bucket: r for r in equiwidth_histogram(df, "n", n_buckets=5).collect()}
    # span [0, 10), width 2: bucket i holds {2i, 2i+1}
    assert set(got) == {0, 1, 2, 3, 4}
    assert (got[4].n_rows, got[4].lo_v, got[4].hi_v) == (4, 8, 9)
    assert (got[0].n_rows, got[0].lo_v, got[0].hi_v) == (2, 0, 1)
    # extremes land inside the range: max value in last bucket, min in first
    total = sum(r.n_rows for r in got.values())
    assert total == 12


def test_duplicated_spans_golden(spark):
    from pprl_spark.operators.corpus import duplicated_spans

    # docs 1 and 2 share the 5-gram "a b c d e"; doc 3 is clean; docs 4
    # and 6 are identical short docs (< n tokens), so their single
    # whole-text shingle has corpus count 2 and marks ALL their tokens
    # (capped at n_tokens=3, not n=5); doc 5 CONTAINS doc 4's text but
    # its grams are all 5-token strings — exact granularity, no match
    rows = [
        (1, "a b c d e x y z w v"),
        (2, "q a b c d e f r s t"),
        (3, "k l m n o p u zz uu vv"),
        (4, "tiny doc here"),
        (5, "pad1 tiny doc here pad2 pad3"),
        (6, "tiny doc here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in duplicated_spans(df, n=5).collect()}
    assert set(got) == {1, 2, 3, 4, 5, 6}
    # doc 1: one hit at pos 0 -> span tokens 0..4
    assert (got[1].n_dup_tokens, got[1].n_spans) == (5, 1)
    # doc 2: grams "a b c d e"(pos 1) and "b c d e f"? — only the shared
    # gram counts; corpus count of "a b c d e" = 2 -> pos 1; no other
    # gram repeats, so span = tokens 1..5
    assert (got[2].n_dup_tokens, got[2].n_spans) == (5, 1)
    assert got[3].n_dup_tokens == 0 and got[3].n_spans == 0
    assert got[3].dup_fraction == 0.0
    # short docs: whole-text shingle, capped at their 3 tokens
    for d in (4, 6):
        assert (got[d].n_tokens, got[d].n_dup_tokens, got[d].n_spans) == (3, 3, 1)
        assert got[d].dup_fraction == 1.0
    # doc 5 contains doc 4's text but as 5-grams none repeat (the
    # whole-doc-4 shingle "tiny doc here" is a 3-token string; doc 5's
    # grams are all 5-token strings) — granularity is exact, not fuzzy
    assert got[5].n_dup_tokens == 0


def test_duplicated_spans_merges_touching_windows(spark):
    from pprl_spark.operators.corpus import duplicated_spans

    # the repeated phrase appears twice INSIDE one doc: both occurrences
    # count toward the corpus frequency (memorization definition) and
    # produce two disjoint spans in that doc
    rows = [
        (1, "a b c x x a b c y y"),
        (2, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in duplicated_spans(df, n=3).collect()}
    # "a b c" occurs at pos 0 and 5 in doc 1 -> corpus count 2; windows
    # [0,2] and [5,7]: gap > n so two spans, 6 duplicated tokens
    assert (got[1].n_dup_tokens, got[1].n_spans) == (6, 2)
    # contiguous check: "x x a" (pos 3)? only grams with count>=2 mark;
    # no other gram repeats so nothing else is counted
    assert got[2].n_dup_tokens == 0


def test_duplicated_spans_partitioning_independent(spark):
    import random

    from pprl_spark.operators.corpus import duplicated_spans

    rng = random.Random(11)
    rows = [
        (i, " ".join(rng.choice("abcde") for _ in range(30))) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    one = sorted(
        (r.doc_id, r.n_dup_tokens, r.n_spans, r.dup_fraction)
        for r in duplicated_spans(df.repartition(1), n=4).collect()
    )
    many = sorted(
        (r.doc_id, r.n_dup_tokens, r.n_spans, r.dup_fraction)
        for r in duplicated_spans(df.repartition(13), n=4).collect()
    )
    assert one == many


def test_source_divergence_golden(spark):
    import math

    from pprl_spark.operators.corpus import source_divergence

    # source A: 3x "a", 1x "b"; source B: 1x "a", 3x "b"
    # corpus: a=4/8, b=4/8; P_A = (0.75, 0.25)
    rows = [(1, "a a a b", "A"), (2, "a b b b", "B")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.source: r for r in source_divergence(df).collect()}
    assert got["A"].n_tokens == 4 and got["A"].vocab_size == 2

    def term(p, q):
        return math.floor(1e6 * p * math.log(p / q))

    exp = term(0.75, 0.5) + term(0.25, 0.5)
    assert got["A"].kl_u == exp
    assert got["B"].kl_u == exp  # symmetric construction
    assert got["A"].kl == exp / 1e6
    # identical-to-corpus source: single-source corpus has KL ~ 0
    one = source_divergence(
        spark.createDataFrame([(1, "x y x", "S")], "doc_id long, text string, source string")
    ).collect()[0]
    assert one.kl_u == 0


def test_source_divergence_partitioning_independent(spark):
    import random

    from pprl_spark.operators.corpus import source_divergence

    rng = random.Random(29)
    rows = [
        (i, " ".join(rng.choice("abcdef") for _ in range(30)), f"s{i % 4}")
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    one = sorted(tuple(r) for r in source_divergence(df.repartition(1)).collect())
    many = sorted(tuple(r) for r in source_divergence(df.repartition(11)).collect())
    assert one == many
