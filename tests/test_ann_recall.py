"""ANN recall with auto-derived parameters at two corpus scales.

Pins the scale-awareness contract: ``auto_n_planes`` / ``auto_n_centroids``
grow with the corpus so per-bucket (per-list) work stays bounded, and the
approximate searches still find most of the true neighbors that a
brute-force scan returns. Vectors are deterministic cluster+noise draws so
near-neighbor structure exists for the recall to be meaningful.
"""

from __future__ import annotations

import pytest

from pprl_spark.operators.ann import (
    auto_n_centroids,
    auto_n_planes,
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)

DIM = 32
N_CLUSTERS = 40
K = 5
N_QUERIES = 10


def _make_vectors(spark, n):
    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                center = np.random.RandomState(int(i) % N_CLUSTERS).randn(DIM)
                noise = np.random.RandomState(1_000_003 + int(i)).randn(DIM)
                rows.append([float(x) for x in center + 0.15 * noise])
            yield pd.DataFrame({"vec_id": ids, "embedding": rows})

    return (
        spark.range(n)
        .mapInPandas(gen, "vec_id long, embedding array<double>")
        .localCheckpoint()
    )


def _recall(approx, exact):
    truth = {}
    for r in exact.collect():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    found = {}
    for r in approx.collect():
        found.setdefault(r["query_id"], set()).add(r["vec_id"])
    per_q = [
        len(found.get(q, set()) & hits) / len(hits) for q, hits in truth.items()
    ]
    return sum(per_q) / len(per_q)


def test_auto_params_scale_with_corpus():
    assert auto_n_planes(200) == 4
    assert auto_n_planes(20_000) > auto_n_planes(200)
    assert auto_n_planes(10**9) <= 24
    assert auto_n_centroids(200) < auto_n_centroids(20_000)
    assert 4 <= auto_n_centroids(1) <= auto_n_centroids(10**12) <= 65536


@pytest.mark.parametrize("n", [200, 20_000])
def test_ann_recall_auto_params(spark, n):
    vecs = _make_vectors(spark, n)
    queries = vecs.where("vec_id < %d" % N_QUERIES).withColumnRenamed(
        "vec_id", "query_id"
    )
    corpus = vecs.where("vec_id >= %d" % N_QUERIES)
    exact = brute_force_topk(corpus, queries, k=K).localCheckpoint()

    ivf = ivf_topk(corpus, queries, k=K, nprobe=4, kmeans_iters=3)
    r_ivf = _recall(ivf, exact)
    assert r_ivf >= 0.5, f"IVF recall {r_ivf} at n={n}"

    lsh = lsh_topk(corpus, queries, DIM, k=K, multiprobe=True)
    r_lsh = _recall(lsh, exact)
    assert r_lsh >= 0.4, f"LSH recall {r_lsh} at n={n}"


def test_ivf_lloyd_clamps_centroids_to_sample(spark):
    """n_centroids larger than the corpus (or the driver sample cap) must
    clamp, not IndexError inside the Lloyd loop (advice r3)."""
    corpus = _make_vectors(spark, 20)
    queries = _make_vectors(spark, 2).selectExpr(
        "vec_id as query_id", "embedding"
    )
    out = ivf_topk(
        corpus, queries, k=3, n_centroids=50, nprobe=4, kmeans_iters=2
    )
    rows = out.collect()
    assert len(rows) > 0
    assert {r["query_id"] for r in rows} == {0, 1}


def test_ivf_persisted_probe_matches_ivf_topk(spark, tmp_path):
    """The persisted-index probe must return EXACTLY what ivf_topk returns
    at the same deterministic quantizer, and its lists scan must be
    partition-pruned to the probed cent_ids (write-once/probe-many)."""
    from pprl_spark.operators.ann import ivf_probe, read_ivf_index, write_ivf_index

    vecs = _make_vectors(spark, 2_000)
    queries = vecs.where("vec_id < %d" % N_QUERIES).withColumnRenamed(
        "vec_id", "query_id"
    )
    corpus = vecs.where("vec_id >= %d" % N_QUERIES)

    base = str(tmp_path / "ivf_idx")
    write_ivf_index(corpus, base, n_centroids=16)
    centroids, lists = read_ivf_index(spark, base)

    probed = ivf_probe(centroids, lists, queries, k=K, nprobe=4)
    direct = ivf_topk(corpus, queries, k=K, n_centroids=16, nprobe=4)

    got = {(r["query_id"], r["vec_id"], r["rank"]) for r in probed.collect()}
    want = {(r["query_id"], r["vec_id"], r["rank"]) for r in direct.collect()}
    assert got == want

    # partition pruning: the probe's cent_id IN (...) filter must reach
    # the lists scan as a PartitionFilter, so unprobed list directories
    # are never read (nprobe * |queries| <= 40 of 16 lists here, but the
    # contract is structural: the filter is on the partition column)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cent_id" in plan
