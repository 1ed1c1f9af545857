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
