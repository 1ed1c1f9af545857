"""Delta-match equivalence: incremental new-vs-all == batch over the union.

The streaming pattern (streaming/incremental.py) appends stream-embedded
documents to the stage table and periodically matches the delta. These
tests pin the exact decomposition it relies on:

  self_candidates(corpus ∪ delta)
    == self_candidates(corpus) ∪ delta_candidates(corpus, delta)

and therefore mutual-best matching over the incremental union equals a
from-scratch batch match over the full corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pprl_spark.config import EmbedderConfig
from pprl_spark.operators.blocking import add_block_keys, explode_blocks
from pprl_spark.operators.candidates import generate_candidates
from pprl_spark.operators.embedding import embed_documents
from pprl_spark.operators.matching import mutual_best_match
from pprl_spark.sources.synthetic import synthesize_documents
from pprl_spark.streaming.incremental import delta_candidates, delta_match

KEEP = ["doc_id", "true_id"]


@pytest.fixture(scope="module")
def split_blocks(spark):
    """(corpus_blocks, delta_blocks, union_blocks) over 300 docs, 80/20."""
    cfg = EmbedderConfig()
    docs = synthesize_documents(spark, 300, "A")
    blocks = explode_blocks(
        add_block_keys(embed_documents(docs, cfg, keep=KEEP), cfg)
    ).localCheckpoint()
    is_delta = F.xxhash64("doc_id") % 5 == 0  # deterministic ~20% split
    corpus = blocks.where(~is_delta).localCheckpoint()
    delta = blocks.where(is_delta).localCheckpoint()
    return cfg, corpus, delta, blocks


def _pairs_set(df):
    return {
        (r["id1"], r["id2"], round(r["sim"], 9))
        for r in df.select("id1", "id2", "sim").collect()
    }


def test_delta_candidates_union_equivalence(split_blocks):
    cfg, corpus, delta, union = split_blocks
    batch = generate_candidates(union, None, cfg, cap=False)
    prior = generate_candidates(corpus, None, cfg, cap=False)
    new = delta_candidates(corpus, delta, cfg, cap=False)
    assert _pairs_set(batch) == _pairs_set(prior) | _pairs_set(new)
    # the delta really contributes pairs (the split is not degenerate)
    assert _pairs_set(new)


def test_delta_match_equals_batch_match(split_blocks):
    cfg, corpus, delta, union = split_blocks
    batch_matches = mutual_best_match(
        generate_candidates(union, None, cfg, cap=False), self_linkage=True
    )
    prior = generate_candidates(corpus, None, cfg, cap=False).localCheckpoint()
    new = delta_candidates(corpus, delta, cfg, cap=False).localCheckpoint()
    inc_matches = delta_match(prior, new)
    assert _pairs_set(batch_matches) == _pairs_set(inc_matches)
    assert inc_matches.count() > 0


def test_delta_candidates_orientation(split_blocks):
    """All emitted pairs are id1 < id2 and involve >= 1 delta doc."""
    cfg, corpus, delta, _ = split_blocks
    new = delta_candidates(corpus, delta, cfg, cap=False)
    rows = new.collect()
    delta_ids = {r["doc_id"] for r in delta.select("doc_id").distinct().collect()}
    for r in rows:
        assert r["id1"] < r["id2"]
        assert r["id1"] in delta_ids or r["id2"] in delta_ids
