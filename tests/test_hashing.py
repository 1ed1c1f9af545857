"""Bloom-hash kernel parity + properties.

Mirrors `/root/reference/test/embedder/test_bloom_filters.py:9-30` and the
docstring golden at `bloom_filters.py:63-67`.
"""

from hypothesis import given
from hypothesis import strategies as st

from pprl_spark.functions.hashing import bloom_indices, bloom_indices_with_collisions


def test_golden_abc():
    # bloom_filters.py:63-67: ["a","b","c"], defaults -> this exact set
    assert set(bloom_indices(["a", "b", "c"])) == {334, 1013, 192, 381, 18, 720}


def test_memo_equivalence():
    feats = ["_d", "do", "or", "ri", "is", "s_"] * 3
    memo: dict = {}
    with_memo = bloom_indices_with_collisions(feats, _memo=memo)
    without = bloom_indices_with_collisions(feats)
    assert with_memo == without
    assert len(memo) == 6


def test_salt_changes_indices():
    a = bloom_indices(["a", "b"], salt="")
    b = bloom_indices(["a", "b"], salt="pepper")
    assert a != b


@given(
    st.lists(st.text(min_size=1, max_size=8), min_size=1, max_size=30),
    st.integers(min_value=8, max_value=2048),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=0, max_value=64),
)
def test_index_bounds_and_collision_range(feats, size, num_hashes, offset):
    # test_bloom_filters.py:25-27 property: offset <= i < size + offset
    idx, coll = bloom_indices_with_collisions(feats, size, num_hashes, offset)
    assert all(offset <= i < size + offset for i in idx)
    assert 0.0 <= coll < 1.0
    assert idx == sorted(set(idx))


def test_pack_bitmap_matches_jvm_bitmap(spark):
    """Python pack_bitmap (embed kernel) == bloom_bitmap_col (JVM HOF)
    for boundary-heavy index sets, incl. bit 63's two's-complement wrap."""
    from pyspark.sql import functions as F

    from pprl_spark.functions.hashing import pack_bitmap
    from pprl_spark.operators.candidates import bloom_bitmap_col

    cases = [
        [],
        [0],
        [63],
        [64],
        [0, 63, 64, 127, 128, 1023],
        list(range(0, 1024, 7)),
        [62, 63, 64, 65, 510, 511, 512, 513],
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i int, ix array<int>")
    got = {
        r["i"]: r["bm"]
        for r in df.select("i", bloom_bitmap_col(F.col("ix"), 16).alias("bm")).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == pack_bitmap(c, 16), c
