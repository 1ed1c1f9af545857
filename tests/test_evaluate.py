"""pairwise_cluster_eval: hand-computed goldens + degenerate cases."""

from pprl_spark.operators.evaluate import pairwise_cluster_eval


def _eval(spark, rows):
    df = spark.createDataFrame(rows, "entity_id long, truth_id long")
    [r] = pairwise_cluster_eval(df).collect()
    return r


def test_hand_computed_contingency(spark):
    # items 1..6; pred {1,2,3},{4,5},{6}; truth {1,2},{3,4},{5},{6}
    rows = [(1, 1), (1, 1), (1, 3), (4, 3), (4, 5), (6, 6)]
    r = _eval(spark, rows)
    assert (r.n_items, r.n_pred_clusters, r.n_truth_clusters) == (6, 3, 4)
    # tp = C(2,2)=1; pred_pairs = C(3,2)+C(2,2) = 4; truth_pairs = 1+1 = 2
    assert (r.tp_pairs, r.pred_pairs, r.truth_pairs) == (1, 4, 2)
    assert r.precision == 1 / 4 and r.recall == 1 / 2
    assert r.f1 == 2 * 1 / (4 + 2)  # single division — exact


def test_perfect_clustering_is_f1_one(spark):
    rows = [(1, 1), (1, 1), (2, 2), (3, 3), (3, 3), (3, 3)]
    r = _eval(spark, rows)
    assert r.tp_pairs == r.pred_pairs == r.truth_pairs == 1 + 3
    assert r.precision == r.recall == r.f1 == 1.0


def test_all_singletons_zero_denominators(spark):
    # no pairs anywhere: the CASE guards make every metric 0.0, not NaN
    rows = [(i, i) for i in range(5)]
    r = _eval(spark, rows)
    assert (r.tp_pairs, r.pred_pairs, r.truth_pairs) == (0, 0, 0)
    assert (r.precision, r.recall, r.f1) == (0.0, 0.0, 0.0)


def test_big_cluster_no_double_overflow(spark):
    # C(n,2) stays in BIGINT via shiftright: a 4M-item cluster's
    # n*(n-1) = 1.6e13 is exact; the double path would also hold here,
    # but assert the exact integer shows through untruncated
    n = 4_000_000
    df = spark.range(n).selectExpr("1L AS entity_id", "1L AS truth_id")
    [r] = pairwise_cluster_eval(df).collect()
    assert r.tp_pairs == n * (n - 1) // 2
    assert r.f1 == 1.0
