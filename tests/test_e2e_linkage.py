"""End-to-end F1 gate on the FEBRL-style labeled fixture.

The evaluation mirrors the reference tutorial
(`/root/reference/docs/tutorials/example-febrl.qmd:164-182`): every B
record has exactly one true A match; precision = TP/|matches|, recall =
TP/|truth| with the full entity count as denominator (qmd:176). Gate:
pairwise F1 >= 0.99 at fixed blocking keys (BASELINE.json).
"""

import pytest
from pyspark.sql import functions as F

from pprl_spark.config import EmbedderConfig
from pprl_spark.operators.blocking import add_block_keys, explode_blocks
from pprl_spark.operators.candidates import generate_candidates
from pprl_spark.operators.cluster import clusters_from_matches
from pprl_spark.operators.embedding import embed_documents
from pprl_spark.operators.matching import mutual_best_match
from pprl_spark.sources.synthetic import labeled_pairs, synthesize_documents

N = 400
KEEP = ["doc_id", "true_id", "given_name", "surname", "date_of_birth", "sex", "address", "postcode"]


@pytest.fixture(scope="module")
def linked(spark):
    cfg = EmbedderConfig(abs_cutoff=0.3)
    A = synthesize_documents(spark, N, "A").cache()
    B = synthesize_documents(spark, N, "B").cache()
    embA = embed_documents(A, cfg, keep=KEEP)
    embB = embed_documents(B, cfg, keep=KEEP)
    cand = generate_candidates(
        explode_blocks(add_block_keys(embA, cfg)),
        explode_blocks(add_block_keys(embB, cfg)),
        cfg,
    )
    matches = mutual_best_match(cand.where(F.col("sim") >= 0.3)).cache()
    truth = labeled_pairs(A, B).cache()
    return matches, truth


def test_f1_gate(spark, linked):
    matches, truth = linked
    tp = matches.join(truth, ["id1", "id2"]).count()
    n_match, n_truth = matches.count(), truth.count()
    assert n_truth == N
    precision = tp / n_match
    recall = tp / n_truth
    f1 = 2 * precision * recall / (precision + recall)
    assert f1 >= 0.99, f"F1={f1:.4f} (p={precision:.4f}, r={recall:.4f})"


def test_clusters(spark, linked):
    matches, _ = linked
    clusters = clusters_from_matches(matches)
    # matched pairs are 1:1 -> every component has exactly 2 docs
    sizes = clusters.groupBy("entity_id").count().select("count").distinct().collect()
    assert {r["count"] for r in sizes} == {2}


def test_trained_scm_linkage_f1(spark, tmp_path):
    """Trained-SCM end-to-end: train on the seeded truth pairs, run the
    full pipeline with scm rescoring (the reference's headline path,
    embedder.py:568-645), hold the same F1 gate."""
    from pprl_spark.operators.scm import train_scm
    from pprl_spark.plans.pipeline import run_linkage

    cfg = EmbedderConfig(abs_cutoff=0.3)
    A = synthesize_documents(spark, N, "A").cache()
    B = synthesize_documents(spark, N, "B").cache()
    truth = labeled_pairs(A, B).cache()

    # aligned training pairs: truth-matched rows' Bloom index arrays
    embA = embed_documents(A, cfg, keep=KEEP)
    embB = embed_documents(B, cfg, keep=KEEP)
    aligned = (
        truth.join(embA.select(F.col("doc_id").alias("id1"), F.col("bf_indices").alias("bf_indices_1")), "id1")
        .join(embB.select(F.col("doc_id").alias("id2"), F.col("bf_indices").alias("bf_indices_2")), "id2")
        .select("bf_indices_1", "bf_indices_2")
    )
    scm = train_scm(aligned, cfg, seed=11)["scm"]

    pipe = run_linkage(
        spark, cfg, A, B, str(tmp_path / "scm_run"), scm=scm, use_thresholds=False
    )
    assert "scm_scored" in pipe.executed
    matches = pipe.io.read(spark, "matches")
    tp = matches.join(truth, ["id1", "id2"]).count()
    precision = tp / matches.count()
    recall = tp / truth.count()
    f1 = 2 * precision * recall / (precision + recall)
    assert f1 >= 0.99, f"trained-SCM F1={f1:.4f} (p={precision:.4f}, r={recall:.4f})"


def test_scm_fixture_roundtrip(tmp_path):
    """save_scm/load_scm preserve the matrix exactly (the oracle sums the
    same float64 values the scorer uses)."""
    import numpy as np

    from pprl_spark.operators.scm import load_scm, save_scm

    rng = np.random.default_rng(5)
    A = rng.normal(size=(32, 32)).astype(np.float32).astype(np.float64)
    A[rng.random(A.shape) < 0.3] = 0.0
    p = str(tmp_path / "scm.parquet")
    save_scm(A, p)
    assert np.array_equal(load_scm(p, 32), A)
