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
