"""zorder_key: known-value Morton interleaves + SQL-twin structural parity."""

import pytest

from pprl_spark.functions.layout import zorder_key, zorder_key_sql


def test_known_morton_values(spark):
    rows = [(0, 0), (3, 0), (0, 3), (3, 3), (5, 9), (65535, 65535)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = [r.z for r in df.select(zorder_key("a", "b", 16).alias("z")).collect()]

    def ref(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got == [ref(a, b) for a, b in rows]
    assert ref(3, 0) == 0b0101 and ref(0, 3) == 0b1010 and ref(3, 3) == 0b1111


def test_locality_row_group_spread(spark):
    # the layout claim: sorting by z bounds BOTH columns' spread within
    # any contiguous chunk far better than sorting by one column does.
    # 32x32 grid, 64-row chunks: z-sorted chunks cover a ~8x8 square
    # (max spread 7+7), a-sorted chunks cover 2 full-width stripes
    # (b-spread 31)
    rows = [(a, b) for a in range(32) for b in range(32)]
    df = spark.createDataFrame(rows, "a long, b long")
    z = [
        (r.a, r.b)
        for r in df.select("a", "b", zorder_key("a", "b", 5).alias("z"))
        .orderBy("z")
        .collect()
    ]
    chunks = [z[i : i + 64] for i in range(0, len(z), 64)]
    zmax = max(
        max(max(c for c, _ in ch) - min(c for c, _ in ch) for ch in chunks),
        max(max(c for _, c in ch) - min(c for _, c in ch) for ch in chunks),
    )
    assert zmax <= 7  # each 64-row chunk is one 8x8 z-square


def test_sql_twin_matches(spark):
    import duckdb

    rows = [(a, b) for a in range(0, 200, 7) for b in range(0, 200, 11)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = sorted(
        (r.a, r.b, r.z)
        for r in df.select("a", "b", zorder_key("a", "b", 16).alias("z")).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    sql = f"SELECT a, b, {zorder_key_sql('a', 'b', 16)}::BIGINT AS z FROM t"
    assert got == sorted(map(tuple, con.execute(sql).fetchall()))


def test_bits_validation():
    with pytest.raises(ValueError):
        zorder_key("a", "b", 0)
    with pytest.raises(ValueError):
        zorder_key_sql("a", "b", 32)
