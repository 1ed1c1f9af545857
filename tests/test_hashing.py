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
