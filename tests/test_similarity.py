"""Jaro / Jaro-Winkler kernel parity.

The r6 kernel rewrite (str.find inner scan + sorted-match transposition
count) must stay bit-exact with DuckDB's ``jaro_winkler_similarity`` —
the oracle the driver compares ``pprl_jw_pairs`` / ``text_jaro_winkler``
against. Fuzzed over word-ish strings plus adversarial edge cases.
"""

from __future__ import annotations

import random
import string

import duckdb
import pytest

from pprl_spark.functions.similarity import jaro, jaro_winkler

EDGE = [
    ("", ""),
    ("a", ""),
    ("", "a"),
    ("a", "a"),
    ("ab", "ba"),
    ("abc", "abc"),
    ("martha", "marhta"),
    ("dwayne", "duane"),
    ("dixon", "dicksonx"),
    ("a" * 100, "a" * 99 + "b"),
    ("aaab", "baaa"),
    ("ab ab ab", "ba ba ba"),
]


def _duck_jw(pairs):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", pairs)
    return [
        r[0]
        for r in con.execute(
            "SELECT jaro_winkler_similarity(a, b) FROM t"
        ).fetchall()
    ]


def test_jaro_winkler_duckdb_parity_fuzz():
    rng = random.Random(1234)
    words = [
        "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randrange(2, 9)))
        for _ in range(200)
    ]

    def mk():
        return " ".join(rng.choice(words) for _ in range(rng.randrange(1, 13)))

    cases = list(EDGE)
    for _ in range(3000):
        a = mk()
        if rng.random() < 0.5:
            b = list(a)
            for _ in range(rng.randrange(0, 6)):
                p = rng.randrange(len(b))
                b[p] = rng.choice(string.ascii_lowercase)
            b = "".join(b)
        else:
            b = mk()
        cases.append((a, b))
    expected = _duck_jw(cases)
    for (a, b), want in zip(cases, expected):
        got = jaro_winkler(a, b)
        assert got == pytest.approx(want, abs=0.0), (a, b, got, want)


def test_jaro_known_values():
    # classic textbook pairs (winkler boost applies above 0.7)
    assert jaro("martha", "marhta") == pytest.approx(0.9444444444444445)
    assert jaro_winkler("martha", "marhta") == pytest.approx(0.9611111111111111)
    assert jaro("", "") == 0.0
    assert jaro_winkler("abc", "abc") == 1.0
