"""As-of (point-in-time) join: semantics, ties, strictness, plan shape."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pprl_spark.operators.events import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(100, _ts(10), 1, 50.0), (101, _ts(20), 1, 60.0), (102, _ts(5), 2, 70.0),
         (103, _ts(15), 3, 80.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    right = spark.createDataFrame(
        [(1, _ts(8), 1, 1.0), (2, _ts(10), 1, 2.0), (3, _ts(10), 1, 3.0),
         (4, _ts(12), 1, 4.0), (5, _ts(30), 2, 5.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    return left, right


def test_asof_basic_ties_and_nulls(spark, frames):
    left, right = frames
    got = {r["event_id"]: r for r in asof_join(left, right).collect()}
    # left@10: right rows <=10 are ids 1,2,3; ties at ts=10 -> max event_id (3)
    assert got[100]["asof_event_id"] == 3 and got[100]["asof_value"] == 3.0
    # left@20: latest <=20 is id 4
    assert got[101]["asof_event_id"] == 4
    # user 2 left@5: right@30 is later -> no match
    assert got[102]["asof_event_id"] is None and got[102]["asof_value"] is None
    # user 3 has no right rows at all
    assert got[103]["asof_event_id"] is None
    # left columns pass through intact
    assert got[100]["value"] == 50.0 and got[100]["user_id"] == 1


def test_asof_strict_excludes_equal_ts(spark, frames):
    left, right = frames
    got = {r["event_id"]: r for r in asof_join(left, right, strict=True).collect()}
    # left@10 strict: only right@8 (id 1) qualifies
    assert got[100]["asof_event_id"] == 1
    assert got[101]["asof_event_id"] == 4  # unaffected


def test_asof_single_exchange(spark, frames):
    left, right = frames
    plan = asof_join(left, right)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


def test_asof_partitioning_independent(spark, frames):
    left, right = frames

    def run(lp, rp):
        return sorted(
            (r["event_id"], r["asof_event_id"])
            for r in asof_join(left.repartition(lp), right.repartition(rp)).collect()
        )

    assert run(1, 1) == run(7, 3)


# ---------------------------------------------------------------------------
# Range (interval) join
# ---------------------------------------------------------------------------


def test_range_join_equals_naive(spark):
    """Bin-bucketed plan == naive equi-join + range filter, incl. edges."""
    import random

    from pprl_spark.operators.events import range_join

    rng = random.Random(7)
    W = 1_000_000  # 1s window
    rows = [
        (i, _ts(rng.randrange(0, 50)), rng.randrange(1, 4), float(i))
        for i in range(120)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    l = df.where(F.col("event_id") % 2 == 0)
    r = df.where(F.col("event_id") % 2 == 1)
    got = sorted(
        (x["event_id"], x["r_event_id"], x["delta_us"])
        for x in range_join(l, r, lower_us=-W, upper_us=W).collect()
    )
    naive = sorted(
        (a, b, (tb - ta) * 1_000_000)
        for (a, ta, ua, _) in [(x[0], int(x[1].timestamp()), x[2], x[3]) for x in rows if x[0] % 2 == 0]
        for (b, tb, ub, _) in [(x[0], int(x[1].timestamp()), x[2], x[3]) for x in rows if x[0] % 2 == 1]
        if ua == ub and abs(tb - ta) * 1_000_000 <= W
    )
    assert got == naive and len(got) > 0


def test_range_join_asymmetric_window(spark):
    from pprl_spark.operators.events import range_join

    l = spark.createDataFrame(
        [(1, _ts(100), 1, 0.0)], "event_id long, ts timestamp, user_id long, value double"
    )
    r = spark.createDataFrame(
        [(10, _ts(95), 1, 0.0), (11, _ts(105), 1, 0.0), (12, _ts(99), 1, 0.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    # only look BACK 2s: [ts-2s, ts]
    got = {x["r_event_id"] for x in
           range_join(l, r, lower_us=-2_000_000, upper_us=0).collect()}
    assert got == {12}


def test_range_join_no_cartesian(spark):
    from pprl_spark.operators.events import range_join

    l = spark.createDataFrame(
        [(1, _ts(0), 1, 0.0)], "event_id long, ts timestamp, user_id long, value double"
    )
    plan = range_join(l, l)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_funnel_steps_hand_computed(spark):
    from datetime import datetime

    from pprl_spark.operators.events import funnel_steps

    T = lambda m, s=0: datetime(2026, 1, 1, 10, m, s)
    rows = [
        # user 1: full funnel inside the bounds
        (1, T(0), "view"), (1, T(10), "click"), (1, T(20), "purchase"),
        # user 2: clicks too late (> 1 hour after view)
        (2, T(0), "view"), (2, T(0) .replace(hour=12), "click"),
        # user 3: same-timestamp click must NOT count (strictly later)
        (3, T(5), "view"), (3, T(5), "click"),
        # user 4: purchase BEFORE click is not a completion
        (4, T(0), "view"), (4, T(30), "click"), (4, T(25), "purchase"),
        # user 5: never viewed -> not in the cohort
        (5, T(0), "click"), (5, T(1), "purchase"),
        # user 1 noise: later extra view must not move t_1
        (1, T(50), "view"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r.user_id: r for r in funnel_steps(df, ["view", "click", "purchase"]).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert (got[1].stage, got[1].t_1, got[1].t_2, got[1].t_3) == (3, T(0), T(10), T(20))
    assert (got[2].stage, got[2].t_2) == (1, None)
    assert (got[3].stage, got[3].t_2) == (1, None)
    assert (got[4].stage, got[4].t_2, got[4].t_3) == (2, T(30), None)


def test_cohort_retention_hand_computed(spark):
    from datetime import datetime

    from pprl_spark.operators.events import cohort_retention

    # 2026-01-05 is a Monday (ISO week start)
    rows = [
        (1, datetime(2026, 1, 5)),   # cohort W0
        (1, datetime(2026, 1, 14)),  # active W1
        (1, datetime(2026, 1, 20)),  # active W2
        (2, datetime(2026, 1, 7)),   # cohort W0
        (2, datetime(2026, 1, 8)),   # same week (offset 0, dedup with user 2's cohort row)
        (3, datetime(2026, 1, 13)),  # cohort W1
        (3, datetime(2026, 1, 26)),  # active W3 (offset 2 from its own cohort)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort_week.date().isoformat(), r.week_offset): r.n_users
        for r in cohort_retention(df).collect()
    }
    assert got == {
        ("2026-01-05", 0): 2,  # users 1, 2
        ("2026-01-05", 1): 1,  # user 1
        ("2026-01-05", 2): 1,  # user 1
        ("2026-01-12", 0): 1,  # user 3
        ("2026-01-12", 2): 1,  # user 3
    }


def test_windowed_anomaly_golden(spark):
    import math
    from datetime import datetime, timedelta

    from pprl_spark.operators.events import windowed_anomaly

    # one event type, hourly counts [2,2,2,2,2,2,20]: the spike window
    # z-scores against a zero-variance trail -> var 0 -> z_u pinned 0?
    # no — trailing counts are all 2 (var 0) so z_u = 0 by contract;
    # add variation [1,2,3,2,1,2] then spike 20
    base = datetime(2026, 1, 1, 0, 0, 0)
    counts = [1, 2, 3, 2, 1, 2, 20]
    rows = []
    eid = 0
    for h, c in enumerate(counts):
        for i in range(c):
            rows.append((eid, base + timedelta(hours=h, minutes=i % 50), 1, "click"))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {r.window_start: r for r in windowed_anomaly(df, trailing=6, min_windows=3).collect()}
    # windows 0,1,2 withheld (cold start: fewer than 3 predecessors)
    assert len(got) == 4
    spike = got[max(got)]
    assert spike.n_events == 20 and spike.n_prev == 6
    s1, s2, n = sum(counts[:6]), sum(c * c for c in counts[:6]), 6.0
    mean = s1 / n
    var = (s2 - s1 * s1 / n) / n
    z = (20.0 - mean) / math.sqrt(var)
    assert spike.mean_u == math.floor(1e6 * mean)
    assert spike.z_u == math.floor(1e6 * z)
    assert spike.z_u > 20_000_000  # >20 sigma: unambiguous anomaly


def test_windowed_anomaly_zero_variance_and_validation(spark):
    from datetime import datetime, timedelta

    import pytest

    from pprl_spark.operators.events import windowed_anomaly

    base = datetime(2026, 1, 1)
    rows = [
        (h * 10 + i, base + timedelta(hours=h, minutes=i), 1, "view")
        for h in range(5)
        for i in range(3)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = windowed_anomaly(df, trailing=6, min_windows=3).collect()
    assert all(r.z_u == 0 for r in got)  # constant counts: var 0 -> pinned
    with pytest.raises(ValueError):
        windowed_anomaly(df, trailing=0)
    with pytest.raises(ValueError):
        windowed_anomaly(df, trailing=4, min_windows=5)


def test_type_transitions_golden(spark):
    from datetime import datetime, timedelta

    from pprl_spark.operators.events import type_transitions

    base = datetime(2026, 1, 1)
    # user 1: A -> B -> A -> A; user 2: B -> A (transitions:
    # A->B 1, B->A 2, A->A 1); same-ts tie for user 3 breaks on
    # event_id: C(10) then D(11) -> C->D
    rows = [
        (1, base, 1, "A"), (2, base + timedelta(minutes=1), 1, "B"),
        (3, base + timedelta(minutes=2), 1, "A"),
        (4, base + timedelta(minutes=3), 1, "A"),
        (5, base, 2, "B"), (6, base + timedelta(minutes=1), 2, "A"),
        (10, base, 3, "C"), (11, base, 3, "D"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {(r.prev_type, r.event_type): r for r in type_transitions(df).collect()}
    assert got[("A", "B")].n == 1 and got[("B", "A")].n == 2
    assert got[("A", "A")].n == 1
    assert got[("C", "D")].n == 1 and ("D", "C") not in got
    # row-normalized: from A -> {B: 1/2, A: 1/2}
    assert got[("A", "B")].p == 0.5 and got[("A", "A")].p == 0.5
    assert got[("B", "A")].p == 1.0
