"""BM25 lexical retrieval top-k."""

import math

import pytest


def _bm25_u(tf, dl, n_docs, df, total_tokens, k1=1.2, b=0.75):
    # the exact float expression tree the operator evaluates
    idf_u = float(math.floor(1_000_000.0 * math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))))
    avgdl = total_tokens / n_docs
    return math.floor(idf_u * (tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))))


def test_bm25_golden_exact(spark):
    from pprl_spark.operators.retrieval import bm25_topk

    rows = [
        (1, "apple banana apple"),
        (2, "apple c d e f g h i j k"),
        (3, "banana banana banana"),
        (4, "nothing relevant here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.query_id, r.doc_id): r
        for r in bm25_topk(df, {"q1": "apple", "q2": "banana apple"}, k=10).collect()
    }
    n, tt = 4, 3 + 10 + 3 + 3
    # q1: doc1 (tf 2, dl 3) must outrank doc2 (tf 1, dl 10)
    assert got[("q1", 1)].rk == 1 and got[("q1", 2)].rk == 2
    assert got[("q1", 1)].score_u == _bm25_u(2, 3, n, 2, tt)
    assert got[("q1", 2)].score_u == _bm25_u(1, 10, n, 2, tt)
    # q2 sums both terms for doc1; doc4 matches nothing
    assert got[("q2", 1)].score_u == _bm25_u(2, 3, n, 2, tt) + _bm25_u(1, 3, n, 2, tt)
    assert ("q1", 4) not in got and ("q2", 4) not in got
    assert ("q1", 3) not in got  # no query term


def test_bm25_partitioning_independent(spark):
    import random

    from pprl_spark.operators.retrieval import bm25_topk

    rng = random.Random(31)
    vocab = ["apple", "banana", "cherry", "date", "fig", "x", "y", "z"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 30))))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    q = {"a": "apple banana", "b": "cherry fig date"}
    one = sorted(tuple(r) for r in bm25_topk(df.repartition(1), q, k=7).collect())
    many = sorted(tuple(r) for r in bm25_topk(df.repartition(11), q, k=7).collect())
    assert one == many


def test_bm25_validation(spark):
    from pprl_spark.operators.retrieval import bm25_topk

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, {}, k=5)
    with pytest.raises(ValueError):
        bm25_topk(df, {"q": "a"}, k=0)
    with pytest.raises(ValueError):
        bm25_topk(df, {"q": "   "}, k=5)


def test_bm25_stream_scores_match_batch(spark, tmp_path):
    from pprl_spark.operators.retrieval import bm25_index, bm25_score_stream, bm25_topk

    import random

    rng = random.Random(41)
    vocab = ["apple", "banana", "cherry", "x", "y", "z"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(2, 20))))
        for i in range(120)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = {"qa": "apple banana", "qb": "cherry z"}
    idx = bm25_index(docs, q)

    # batch equivalence: stateless scorer == the topk pipeline's scores
    batch = {
        (r.query_id, r.doc_id): r.score_u
        for r in bm25_topk(docs, q, k=1000).collect()
    }
    scored = {
        (r.query_id, r.doc_id): r.score_u
        for r in bm25_score_stream(docs, idx, q).collect()
    }
    assert scored == batch  # exact integer equality, full map

    # genuine readStream run (append mode, no state)
    in_dir, out_dir, ck = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    docs.coalesce(1).write.parquet(in_dir)
    stream = spark.readStream.schema("doc_id long, text string").parquet(in_dir)
    out = bm25_score_stream(stream, idx, q)
    assert out.isStreaming
    qh = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    qh.awaitTermination(120)
    streamed = {
        (r.query_id, r.doc_id): r.score_u for r in spark.read.parquet(out_dir).collect()
    }
    assert streamed == batch


def test_bm25_index_handles_absent_terms(spark):
    from pprl_spark.operators.retrieval import bm25_index, bm25_score_stream

    docs = spark.createDataFrame([(1, "apple pie")], "doc_id long, text string")
    idx = bm25_index(docs, {"q": "apple zzz_absent"})
    assert "zzz_absent" not in idx["idf"]  # df=0 terms never enter the index
    got = bm25_score_stream(docs, idx, {"q": "apple zzz_absent"}).collect()
    assert len(got) == 1 and got[0].doc_id == 1
    import pytest

    with pytest.raises(ValueError):
        bm25_score_stream(docs, idx, {"q": "zzz_absent"})
