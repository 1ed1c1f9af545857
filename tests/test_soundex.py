"""Own American Soundex: classic vectors, H/W rule, engine parity."""

import duckdb
import pytest

from pprl_spark.functions.phonetic import soundex_col, soundex_sql

# classic published vectors, including the H/W-transparency and
# vowel-separation rules (Ashcraft: c and r merge ACROSS the h;
# Tymczak: the vowel keeps z and k apart; Pfister: f merges into P)
VECTORS = {
    "Robert": "R163",
    "Rupert": "R163",
    "Ashcraft": "A261",
    "Ashcroft": "A261",
    "Tymczak": "T522",
    "Pfister": "P236",
    "Honeyman": "H555",
    "Jackson": "J250",
    "Washington": "W252",
    "Lee": "L000",
    "Gutierrez": "G362",
    "VanDeusen": "V532",
    "o'brien": "O165",
    "": "",
    "123": "",
}


def test_classic_vectors_spark(spark):
    df = spark.createDataFrame([(n,) for n in VECTORS], "name string")
    got = {r.name: r.sx for r in df.select("name", soundex_col(df["name"]).alias("sx")).collect()}
    assert got == VECTORS


def test_sql_twin_parity():
    con = duckdb.connect()
    for name, want in VECTORS.items():
        lit = "'" + name.replace("'", "''") + "'"
        assert con.execute(f"SELECT {soundex_sql(lit)}").fetchone()[0] == want, name


def test_blocking_key_groups_variants(spark):
    # the property a blocking key needs: common misspellings collide
    df = spark.createDataFrame(
        [("smith",), ("smyth",), ("smithe",), ("jones",)], "name string"
    )
    got = [r.sx for r in df.select(soundex_col(df["name"]).alias("sx")).collect()]
    assert got[0] == got[1] == got[2] != got[3]
