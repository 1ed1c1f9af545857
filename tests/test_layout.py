"""write_partitioned: partition pruning + row-group stat pushdown, plan-pinned."""

import pathlib

from pyspark.sql import functions as F

from pprl_spark.sources.tables import write_partitioned


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_layout_prunes_and_pushes(spark, tmp_path):
    path = str(tmp_path / "docs")
    rows = [
        (i, f"text {i}", ["en", "fr", "de"][i % 3], f"src{i % 2}") for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    write_partitioned(df, path, partition_by=["lang"], sort_by=["doc_id"])

    # hive directory layout, one file per partition (single writer task each)
    dirs = sorted(p.name for p in pathlib.Path(path).iterdir() if p.is_dir())
    assert dirs == ["lang=de", "lang=en", "lang=fr"]
    for d in dirs:
        files = list((pathlib.Path(path) / d).glob("*.parquet"))
        assert len(files) == 1

    back = spark.read.parquet(path)
    assert back.count() == 300

    # partition-column filter prunes directories (PartitionFilters),
    # and the scan reads only 100 rows' worth of files
    q1 = back.where(F.col("lang") == "en")
    assert "PartitionFilters: [isnotnull(lang" in _plan(q1)
    assert q1.count() == 100

    # range filter on the sort column is pushed to parquet; sorted files
    # make the row-group min/max stats tight
    q2 = back.where(F.col("doc_id") < 30)
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,30)]" in _plan(q2)
    assert q2.count() == 30

    # round-trip fidelity (partition column moves to the end of the
    # read-back schema — compare by name, not position)
    assert {tuple(sorted(r.asDict().items())) for r in back.collect()} == {
        tuple(sorted(r.asDict().items())) for r in df.collect()
    }
