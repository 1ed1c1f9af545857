"""Fellegi-Sunter weighting on the north-star linkage workload.

End-to-end: blocked Bloom candidates over two FEBRL-style parties,
per-field agreements on the PII-like attributes, unsupervised EM (no
labels touched), FS-calibrated mutual-best match — gated at the same
pairwise F1 >= 0.99 bar as the similarity-only pipeline, proving the
probabilistic weighting layer composes with the reference dataflow
without degrading the reference-parity result.
"""

import pytest
from pyspark.sql import functions as F

from pprl_spark.config import EmbedderConfig
from pprl_spark.operators.blocking import add_block_keys, explode_blocks
from pprl_spark.operators.candidates import generate_candidates
from pprl_spark.operators.embedding import embed_documents
from pprl_spark.operators.fellegi_sunter import agreement_vectors, fs_score, fs_train
from pprl_spark.operators.matching import mutual_best_match
from pprl_spark.sources.synthetic import labeled_pairs, synthesize_documents

N = 400
KEEP = ["doc_id", "true_id", "given_name", "surname", "date_of_birth", "sex", "address", "postcode"]
FIELDS = ["surname", "dob", "sex", "sim"]


@pytest.fixture(scope="module")
def fs_linked(spark):
    cfg = EmbedderConfig(abs_cutoff=0.3)
    A = synthesize_documents(spark, N, "A").cache()
    B = synthesize_documents(spark, N, "B").cache()
    embA = embed_documents(A, cfg, keep=KEEP).localCheckpoint()
    embB = embed_documents(B, cfg, keep=KEEP).localCheckpoint()
    cand = generate_candidates(
        explode_blocks(add_block_keys(embA, cfg)),
        explode_blocks(add_block_keys(embB, cfg)),
        cfg,
    ).where(F.col("sim") >= 0.3)
    attrs_a = embA.select(
        F.col("doc_id").alias("id1"),
        F.col("surname").alias("surname1"),
        F.col("date_of_birth").alias("dob1"),
        F.col("sex").alias("sex1"),
    )
    attrs_b = embB.select(
        F.col("doc_id").alias("id2"),
        F.col("surname").alias("surname2"),
        F.col("date_of_birth").alias("dob2"),
        F.col("sex").alias("sex2"),
    )
    gamma = agreement_vectors(
        cand.join(attrs_a, "id1").join(attrs_b, "id2"),
        {
            "surname": F.col("surname1") == F.col("surname2"),
            "dob": F.col("dob1") == F.col("dob2"),
            "sex": F.col("sex1") == F.col("sex2"),
            "sim": F.col("sim") >= 0.5,
        },
    ).localCheckpoint()
    params = fs_train(gamma, FIELDS, iters=100)
    scored = fs_score(gamma, FIELDS, params["weights_u"])
    matches = mutual_best_match(scored, order_cols=("score_u", "sim")).cache()
    truth = labeled_pairs(A, B).cache()
    return params, matches, truth


def test_em_finds_the_match_class(spark, fs_linked):
    params, _, _ = fs_linked
    lam = params["lambda"]
    # one true match per B record among the blocked candidates: the EM's
    # latent match class should be a small-but-nonzero fraction
    assert 0.001 < lam < 0.6, lam
    # every field must be more likely to agree among matches than
    # non-matches (m > u) -> positive agreement weights
    for f, (m, u) in zip(params["fields"], zip(params["m"], params["u"])):
        assert m > u, (f, m, u)


def test_fs_f1_gate(spark, fs_linked):
    _, matches, truth = fs_linked
    tp = matches.join(truth, ["id1", "id2"]).count()
    n_match, n_truth = matches.count(), truth.count()
    precision = tp / n_match
    recall = tp / n_truth
    f1 = 2 * precision * recall / (precision + recall)
    assert f1 >= 0.99, f"F1={f1:.4f} (p={precision:.4f}, r={recall:.4f})"
