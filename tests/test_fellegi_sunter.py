"""Fellegi-Sunter EM weighting: recovery, exactness, plan shape."""

import itertools
import math

import pytest
from pyspark.sql import functions as F

from pprl_spark.operators.fellegi_sunter import (
    agreement_vectors,
    fs_em,
    fs_score,
    fs_train,
    fs_weights_micro,
    pattern_counts,
)


def _expected_counts(lam, m, u, n=1_000_000):
    """Exact expected pattern counts under the two-class CI model."""
    k = len(m)
    out = []
    for g in itertools.product((0, 1), repeat=k):
        pm = lam
        pu = 1 - lam
        for gi, mi, ui in zip(g, m, u):
            pm *= mi if gi else (1 - mi)
            pu *= ui if gi else (1 - ui)
        out.append((g, int(round(n * (pm + pu)))))
    return out


def test_em_recovers_parameters():
    lam, m, u = 0.2, [0.95, 0.9, 0.85, 0.7], [0.05, 0.2, 0.1, 0.3]
    params = fs_em(_expected_counts(lam, m, u), 4, iters=200)
    assert abs(params["lambda"] - lam) < 0.02
    for got, exp in zip(params["m"], m):
        assert abs(got - exp) < 0.03, (got, exp)
    for got, exp in zip(params["u"], u):
        assert abs(got - exp) < 0.03, (got, exp)


def test_em_deterministic_under_pattern_order():
    pats = _expected_counts(0.3, [0.9, 0.8], [0.1, 0.25])
    a = fs_em(pats, 2, iters=50)
    b = fs_em(list(reversed(pats)), 2, iters=50)
    assert a["m"] == b["m"] and a["u"] == b["u"] and a["lambda"] == b["lambda"]


def test_weights_micro_signs_and_floor():
    (aw, dw), = fs_weights_micro([0.9], [0.1])
    assert aw == math.floor(1e6 * math.log2(9.0))  # strong positive evidence
    assert dw == math.floor(1e6 * math.log2(0.1 / 0.9))  # negative
    assert aw > 0 > dw


@pytest.fixture(scope="module")
def pairs(spark):
    rows = [
        # id1, id2, lang1, lang2, src1, src2, sim
        (1, 2, "en", "en", "a", "a", 0.9),
        (1, 3, "en", "fr", "a", "b", 0.2),
        (2, 3, "en", None, "a", "a", 0.6),
        (4, 5, "de", "de", "b", "b", 0.95),
        (4, 6, "de", "de", "a", "b", 0.4),
    ]
    return spark.createDataFrame(
        rows, "id1 long, id2 long, lang1 string, lang2 string, src1 string, src2 string, sim double"
    )


def AGREE():
    return {
        "lang": F.col("lang1") == F.col("lang2"),
        "src": F.col("src1") == F.col("src2"),
        "sim": F.col("sim") >= 0.5,
    }


def test_agreement_vectors_null_is_disagreement(spark, pairs):
    g = {
        (r["id1"], r["id2"]): (r["g_lang"], r["g_src"], r["g_sim"])
        for r in agreement_vectors(pairs, AGREE()).collect()
    }
    assert g[(1, 2)] == (1, 1, 1)
    assert g[(1, 3)] == (0, 0, 0)
    assert g[(2, 3)] == (0, 1, 1)  # null lang2 -> disagreement, not null


def test_pattern_counts_and_exact_integer_scores(spark, pairs):
    fields = ["lang", "src", "sim"]
    gamma = agreement_vectors(pairs, AGREE())
    pats = {
        tuple(r[f"g_{f}"] for f in fields): r["cnt"]
        for r in pattern_counts(gamma, fields).collect()
    }
    assert sum(pats.values()) == 5 and pats[(1, 1, 1)] == 2
    weights = [(2_000_000, -500_000), (1_000_000, -250_000), (3_141_592, -2_718_281)]
    got = {
        (r["id1"], r["id2"]): r["score_u"]
        for r in fs_score(gamma, fields, weights).collect()
    }
    g = {
        (r["id1"], r["id2"]): tuple(r[f"g_{f}"] for f in fields)
        for r in gamma.collect()
    }
    for k, gv in g.items():
        exp = sum(w[0] if b else w[1] for b, w in zip(gv, weights))
        assert got[k] == exp, k


def test_fs_train_end_to_end_orders_matches_first(spark, pairs):
    fields = ["lang", "src", "sim"]
    gamma = agreement_vectors(pairs, AGREE())
    params = fs_train(gamma, fields, iters=100)
    scored = fs_score(gamma, fields, params["weights_u"])
    by_score = [
        (r["id1"], r["id2"])
        for r in scored.orderBy(F.desc("score_u"), "id1", "id2").collect()
    ]
    # full-agreement pairs outrank the all-disagreement pair
    assert set(by_score[:2]) == {(1, 2), (4, 5)}
    assert by_score[-1] == (1, 3)


def test_fs_score_adds_no_exchange(spark, pairs):
    fields = ["lang", "src", "sim"]
    gamma = agreement_vectors(pairs, AGREE())
    scored = fs_score(gamma, fields, [(1, -1), (2, -2), (3, -3)])
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # literal CASE projection only
