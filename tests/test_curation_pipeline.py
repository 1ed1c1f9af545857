"""End-to-end curation pipeline: stages, resume, selective invalidation."""

import pytest
from pyspark.sql import functions as F

from pprl_spark.plans.curation_pipeline import run_curation

ALL = ["scrubbed", "vocab", "scored", "filtered",
       "dedup_pairs", "dedup_clusters", "canonical", "kept_docs"]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()


def test_curation_full_run_resume_and_retune(spark, docs, tmp_path):
    base = str(tmp_path / "cur")
    p1 = run_curation(spark, docs, base, sample_fractions={"en": 0.5})
    assert p1.executed == ALL and p1.skipped == []
    kept1 = {r["doc_id"] for r in spark.read.parquet(f"{base}/kept_docs").collect()}
    assert kept1  # non-empty

    # identical re-run: everything resumes
    p2 = run_curation(spark, docs, base, sample_fractions={"en": 0.5})
    assert p2.executed == [] and p2.skipped == ALL
    kept2 = {r["doc_id"] for r in spark.read.parquet(f"{base}/kept_docs").collect()}
    assert kept2 == kept1  # byte-stable kept set

    # retune the filter: scrub/vocab/scored stay committed
    p3 = run_curation(spark, docs, base, trim_frac=0.2, sample_fractions={"en": 0.5})
    assert p3.skipped == ["scrubbed", "vocab", "scored"]
    assert p3.executed == ["filtered", "dedup_pairs", "dedup_clusters",
                           "canonical", "kept_docs"]
    kept3 = spark.read.parquet(f"{base}/kept_docs")
    # tighter trim keeps fewer docs, and every kept doc survived filters
    assert kept3.count() < len(kept1)

    # retune only sampling: everything except kept_docs resumes
    p4 = run_curation(spark, docs, base, trim_frac=0.2,
                      sample_fractions={"en": 0.9})
    assert p4.executed == ["kept_docs"]


def test_curation_stage_contents(spark, docs, tmp_path):
    base = str(tmp_path / "cur2")
    run_curation(spark, docs, base, trim_frac=0.1, drop_buckets=("tail",))
    scrubbed = spark.read.parquet(f"{base}/scrubbed")
    assert "n_pii" in scrubbed.columns and scrubbed.count() == docs.count()
    scored = spark.read.parquet(f"{base}/scored")
    assert {"mean_u", "bucket", "quality"} <= set(scored.columns)
    assert {r["bucket"] for r in scored.select("bucket").distinct().collect()} == {
        "head", "middle", "tail"
    }
    filtered = spark.read.parquet(f"{base}/filtered")
    # the tail tertile and bottom quality decile are gone
    assert filtered.where(F.col("bucket") == "tail").count() == 0
    assert 0 < filtered.count() < scored.count()
    kept = spark.read.parquet(f"{base}/kept_docs")
    # kept docs are canonical survivors of filtered
    assert kept.count() <= filtered.count()
