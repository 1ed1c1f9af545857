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
