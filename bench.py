"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...,
     "docs_scored_per_sec": ..., "linkage_docs_per_sec": ...}

Headline suite:
- the PPRL dataflow over the driver's documents table (tokenize ->
  Bloom-embed -> LSH block -> score -> mutual-best match -> clusters);
- the FEBRL-style synthetic two-party linkage at input_hint shape
  (normalize -> embed -> block -> candidates -> match), which is the
  north-star workload;
- dedup / text-analysis / ANN sweeps.

Scaling-efficiency runs (N vs 4N cores) are produced by
``tools/bench_scaling.py`` and recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

import __spark_entry__ as entry
from pprl_spark.config import EmbedderConfig
from pprl_spark.operators.blocking import add_block_keys, explode_blocks
from pprl_spark.operators.candidates import generate_candidates
from pprl_spark.operators.cluster import connected_components
from pprl_spark.operators.dedup import minhash_near_duplicates, simhash_near_duplicates
from pprl_spark.operators.embedding import embed_documents
from pprl_spark.operators.matching import mutual_best_match
from pprl_spark.session import get_spark
from pprl_spark.sources.synthetic import synthesize_documents

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SYN_N = int(os.environ.get("PPRL_BENCH_N", "20000"))
KEEP = ["doc_id", "true_id", "given_name", "surname", "date_of_birth", "sex", "address", "postcode"]


def bench_linkage_synthetic(spark):
    """North-star workload: two-party linkage at input_hint shape.

    Stage outputs are materialized (localCheckpoint = in-session stand-in
    for the pipeline's stage tables): the candidate generator derives
    block-size dim tables from its inputs, and without a materialization
    boundary Catalyst re-executes the embed lineage once per derivation.
    """
    cfg = EmbedderConfig(abs_cutoff=0.3)
    A = synthesize_documents(spark, SYN_N, "A")
    B = synthesize_documents(spark, SYN_N, "B")
    blocks_a = explode_blocks(
        add_block_keys(embed_documents(A, cfg, keep=KEEP), cfg), include_indices=False
    ).localCheckpoint()
    blocks_b = explode_blocks(
        add_block_keys(embed_documents(B, cfg, keep=KEEP), cfg), include_indices=False
    ).localCheckpoint()
    cand = generate_candidates(blocks_a, blocks_b, cfg, min_sim=cfg.abs_cutoff)
    matches = mutual_best_match(cand)
    return matches.count()


def main() -> None:
    spark = get_spark(app_name="pprl_bench", master=f"local[{CPUS}]")
    q = entry.queries()

    # linkage_synthetic runs FIRST: it is the north-star workload and the
    # most memory-sensitive query (guarded 126MB broadcast + two stage
    # checkpoints); running it on a fresh heap removes the session-state
    # sensitivity that intermittently doubled its time mid-suite
    suite = {
        "linkage_synthetic": bench_linkage_synthetic,
        "pprl_embed": lambda s: q["pprl_bloom_stats"](s, SF_DIR).count(),
        "pprl_block_score": lambda s: q["pprl_score_pairs"](s, SF_DIR).count(),
        "pprl_match": lambda s: q["pprl_mutual_best_match"](s, SF_DIR).count(),
        "pprl_clusters": lambda s: q["pprl_clusters"](s, SF_DIR).count(),
        "dedup_minhash": lambda s: minhash_near_duplicates(
            entry._docs(s, SF_DIR), k=3, threshold=0.5
        ).count(),
        "dedup_simhash": lambda s: simhash_near_duplicates(entry._docs(s, SF_DIR)).count(),
        # SemDeDup: cluster-bounded quadratic embedding dedup
        "dedup_semantic": lambda s: q["dedup_semantic"](s, SF_DIR).count(),
        # distributed sorted-neighborhood window pairs (rank equi-join)
        "dedup_snm": lambda s: q["dedup_snm_pairs"](s, SF_DIR).count(),
        # leakage-free entity-keyed split (rides the minhash pair memo)
        "dedup_split": lambda s: q["dedup_split"](s, SF_DIR).count(),
        # exact prefix-filter set-similarity join (lossless counterpart
        # of dedup_minhash over the same k=2 shingle sets)
        "dedup_setjoin": lambda s: q["dedup_setjoin"](s, SF_DIR).count(),
        # write-once/probe-many dedup: delta batch vs standing MinHash index
        "dedup_delta": lambda s: q["dedup_delta"](s, SF_DIR).count(),
        # measured banding recall vs the exact setjoin ground truth
        "dedup_recall": lambda s: q["dedup_recall_report"](s, SF_DIR).count(),
        # exact asymmetric containment join (quote/boilerplate shape)
        "dedup_containment": lambda s: q["dedup_containment"](s, SF_DIR).count(),
        "text_stats": lambda s: q["text_stats"](s, SF_DIR).count(),
        "ann_topk": lambda s: q["ann_topk"](s, SF_DIR).count(),
        "ann_ivf": lambda s: q["ann_ivf"](s, SF_DIR).count(),
        # first run pays the one-time IVF index write; repeats measure
        # the persisted-index probe (the write-once/probe-many path)
        "ann_ivf_probe": lambda s: q["ann_ivf_persisted"](s, SF_DIR).count(),
        "scm_scored": lambda s: q["pprl_scm_scored"](s, SF_DIR).count(),
        "events_windowed": lambda s: q["events_windowed"](s, SF_DIR).count(),
        # trailing-window z-score anomaly report
        "events_anomaly": lambda s: q["events_anomaly"](s, SF_DIR).count(),
        # first-order Markov transition matrix
        "events_transitions": lambda s: q["events_transitions"](s, SF_DIR).count(),
        "events_sessionize": lambda s: q["events_sessionize"](s, SF_DIR).count(),
        "jw_pairs": lambda s: q["pprl_jw_pairs"](s, SF_DIR).count(),
        # built-in JVM levenshtein rescoring (codegen'd, no Python)
        "edit_pairs": lambda s: q["pprl_edit_pairs"](s, SF_DIR).count(),
        "dedup_clusters": lambda s: q["dedup_clusters"](s, SF_DIR).count(),
        "multimodal_decode": lambda s: q["multimodal_decode"](s, SF_DIR).count(),
        # first run pays the one-time bucketed corpus write; repeats
        # measure the write-once/probe-many delta path the feature exists
        # for (median of 3 -> the probe cost dominates the recorded time)
        "delta_match": lambda s: q["delta_match_pairs"](s, SF_DIR).count(),
        # the scale-safe production shape: cap=True skew protection on
        # the same bucketed probe (delta_match's cap=False exists for
        # exact oracle equivalence)
        "delta_match_capped": lambda s: q["delta_match_capped"](s, SF_DIR).count(),
        "dedup_winnow": lambda s: q["dedup_winnow"](s, SF_DIR).count(),
        # dedup end-cap (canonical survivor per cluster) and the
        # shuffle-free content-addressed sampler (r5)
        "dedup_canonical": lambda s: q["dedup_canonical"](s, SF_DIR).count(),
        "sample_stratified": lambda s: q["sample_stratified"](s, SF_DIR).count(),
        "sample_quality_weighted": lambda s: q["sample_quality_weighted"](s, SF_DIR).count(),
        # incremental cluster maintenance + cluster-size histogram (r5);
        # both reuse the memoized minhash pair table (like dedup_clusters)
        "delta_clusters": lambda s: q["delta_clusters"](s, SF_DIR).count(),
        "dedup_cluster_sizes": lambda s: q["dedup_cluster_sizes"](s, SF_DIR).count(),
        # cluster edge-density + cross-source duplication matrix (both
        # ride the memoized minhash pair table, like dedup_clusters)
        "dedup_cluster_density": lambda s: q["dedup_cluster_density"](s, SF_DIR).count(),
        "dedup_source_matrix": lambda s: q["dedup_source_matrix"](s, SF_DIR).count(),
        # pairwise P/R/F1 vs exact-dup truth from contingency aggregates
        # (no pair enumeration; also rides the minhash pair memo)
        "dedup_eval": lambda s: q["dedup_eval"](s, SF_DIR).count(),
        # degree-ordered triangle counting over the near-dup graph
        "graph_triangles": lambda s: q["graph_triangles"](s, SF_DIR).count(),
        # fixed-point PageRank over the near-dup graph (pair-memo rider)
        "graph_pagerank": lambda s: q["graph_pagerank"](s, SF_DIR).count(),
        # authority-based canonical pick (cc + pagerank composition)
        "dedup_canonical_pr": lambda s: q["dedup_canonical_pr"](s, SF_DIR).count(),
        # single-pass per-column ANALYZE profile
        "corpus_profile": lambda s: q["corpus_profile"](s, SF_DIR).count(),
        # bigram-LM cross-entropy scoring (order-2 CCNet filter)
        "text_bigram_lm": lambda s: q["text_bigram_lm"](s, SF_DIR).count(),
        # PMI collocation top-k
        "vocab_pmi": lambda s: q["vocab_pmi"](s, SF_DIR).count(),
        # integer-exact equi-width histogram
        "corpus_histogram": lambda s: q["corpus_histogram"](s, SF_DIR).count(),
        # codegen'd Morton layout key
        "layout_zorder": lambda s: q["layout_zorder"](s, SF_DIR).count(),
        # own-soundex fold (JVM, no UDF)
        "pprl_soundex": lambda s: q["pprl_soundex"](s, SF_DIR).count(),
        # ordered funnel (keyed joins, no event-pair self-join)
        "events_funnel": lambda s: q["events_funnel"](s, SF_DIR).count(),
        # weekly cohort-retention matrix
        "events_cohorts": lambda s: q["events_cohorts"](s, SF_DIR).count(),
        # corpus-statistics / hygiene passes (r5): heavy hitters,
        # benchmark-overlap decontamination, dictionary scrub, TF-IDF,
        # span-sequence dedup, token-budget sampling, quality trim
        "vocab_topk": lambda s: q["vocab_topk"](s, SF_DIR).count(),
        "text_decontaminate": lambda s: q["text_decontaminate"](s, SF_DIR).count(),
        # exact substring-duplication spans (granular dedup, Lee et al.)
        "text_dup_spans": lambda s: q["text_dup_spans"](s, SF_DIR).count(),
        # BM25 lexical retrieval (query-vocab-filtered postings only)
        "text_bm25": lambda s: q["text_bm25"](s, SF_DIR).count(),
        "text_blocklist": lambda s: q["text_blocklist"](s, SF_DIR).count(),
        "text_tfidf": lambda s: q["text_tfidf"](s, SF_DIR).count(),
        "spans_exact_dedup": lambda s: q["spans_exact_dedup"](s, SF_DIR).count(),
        # greedy span-atomic packing + modality composition over the
        # interleaved shape (pure array-expression scans, no shuffle)
        "spans_chunked": lambda s: q["spans_chunked"](s, SF_DIR).count(),
        "spans_modality": lambda s: q["spans_modality"](s, SF_DIR).count(),
        "spans_media_audit": lambda s: q["spans_media_audit"](s, SF_DIR).count(),
        "spans_cross_media": lambda s: q["spans_cross_media"](s, SF_DIR).count(),
        "sample_token_budget": lambda s: q["sample_token_budget"](s, SF_DIR).count(),
        "text_quality_trim": lambda s: q["text_quality_trim"](s, SF_DIR).count(),
        # CCNet-style unigram-surprisal scoring + head/middle/tail split
        "text_surprisal": lambda s: q["text_surprisal"](s, SF_DIR).count(),
        # Fellegi-Sunter EM weighting over blocked pairs (pattern-table
        # EM on the driver, literal CASE scoring)
        "fs_scored": lambda s: q["pprl_fs_scored"](s, SF_DIR).count(),
        # FS-calibrated mutual-best match over the memoized scored table
        # (stage-cost semantics: measures the match windows, not re-scoring)
        "fs_match": lambda s: q["pprl_fs_match"](s, SF_DIR).count(),
        "fs_clusters": lambda s: q["pprl_fs_clusters"](s, SF_DIR).count(),
        # PII redaction pass (codegen'd regex count + sequential scrub)
        "text_pii_scrub": lambda s: q["text_pii_scrub"](s, SF_DIR).count(),
        # as-of join (tagged-union carry-forward window, one exchange)
        "events_asof": lambda s: q["events_asof"](s, SF_DIR).count(),
        # explicit-value pivot (one map-side-combined conditional agg)
        "events_pivot": lambda s: q["events_pivot"](s, SF_DIR).count(),
        # grouping-set composition report (one Expand + one exchange)
        "corpus_rollup": lambda s: q["corpus_rollup"](s, SF_DIR).count(),
        # per-source unigram KL drift report (integer micro-nat sums)
        "corpus_divergence": lambda s: q["corpus_divergence"](s, SF_DIR).count(),
        # bin-bucketed interval join (fan-out bounded by bin occupancy)
        "events_range_join": lambda s: q["events_range_join"](s, SF_DIR).count(),
        # blocking skew diagnostics (heap top-k + 1-row global summary)
        "block_stats": lambda s: q["pprl_block_stats"](s, SF_DIR).count(),
        # k-anonymity privacy audit over the same blocked table
        "pprl_kanon": lambda s: q["pprl_kanon"](s, SF_DIR).count(),
        # k-anonymity enforcement: sub-k blocks dropped pre-join
        "pprl_suppressed": lambda s: q["pprl_suppressed_pairs"](s, SF_DIR).count(),
        # reference Dice normalization over the same blocked candidates
        "pprl_dice": lambda s: q["pprl_dice_pairs"](s, SF_DIR).count(),
        # threshold calibration sweep, clerical-review sample, blocking
        # RR/PC/PQ metrics (all ride the scored-pair memo)
        "threshold_sweep": lambda s: q["pprl_threshold_sweep"](s, SF_DIR).count(),
        "review_pairs": lambda s: q["pprl_review_pairs"](s, SF_DIR).count(),
        "blocking_eval": lambda s: q["pprl_blocking_eval"](s, SF_DIR).count(),
    }

    # EVERY query records a median of N_RUNS genuine samples: this host's
    # DRAM bandwidth swings 75-230 GB/s between phases
    # (tools/bench_boxscaling.py), so single-run numbers are
    # noise-indistinguishable from 30-60% regressions. Memo-backed
    # queries would otherwise re-count an already-materialized
    # localCheckpoint on repeats and record ~0s — OWNED_MEMO lists the
    # stage frames each query must rebuild per sample (its OWN work),
    # while upstream dependencies stay memoized (stage-cost semantics:
    # pprl_block_score measures the block join GIVEN the embed stage).
    # Deliberately NOT reset: corpus_bkt (delta_match measures the
    # probe-only path after the one-time bucketed write), ivf_index
    # (ann_ivf_probe likewise), minhash_dedup_pairs under dedup_clusters
    # (it measures CC over the pair table dedup_minhash just built).
    # (the suite's dedup_minhash entry calls the operator directly, so it
    # has no memo to reset; the memoized minhash pair table is built by
    # dedup_clusters' first sample and deliberately kept for its repeats)
    N_RUNS = 3
    OWNED_MEMO = {
        "pprl_embed": ["embedded"],
        "fs_scored": ["fs_scored"],
        "pprl_block_score": ["scored_pairs", "blocked"],
        "pprl_match": ["mutual_best"],
        # the exact AllPairs join is memoized (shared with dedup_recall);
        # dedup_setjoin measures the JOIN, so each sample rebuilds it —
        # dedup_recall then deliberately rides the memo (stage-cost
        # semantics: it measures the recall counting, not the join)
        "dedup_setjoin": ["setjoin_pairs"],
    }

    import statistics

    timings: dict[str, float] = {}
    all_samples: dict[str, list[float]] = {}
    rows: dict[str, int] = {}
    runs: dict[str, int] = {}
    n_docs = entry._docs(spark, SF_DIR).count()
    import gc

    for name, fn in suite.items():
        samples = []
        for i in range(N_RUNS):
            if i > 0:
                entry.invalidate_memo(spark, SF_DIR, OWNED_MEMO.get(name, []))
            gc.collect()  # release dropped DataFrames so ContextCleaner
            # can free their checkpoint/broadcast blocks before the run
            t0 = time.time()
            rows[name] = fn(spark)
            samples.append(time.time() - t0)
        timings[name] = round(statistics.median(samples), 3)
        all_samples[name] = [round(s, 3) for s in samples]
        runs[name] = len(samples)

    # One box-probe sample (tools/bench_boxscaling.py): steady-state DRAM
    # bandwidth at 4 and 16 concurrent streams, recorded machine-readably
    # so every bench artifact carries its own host-phase indicator
    # (fast phase: 16p ~180-220 GB/s; slow phase: ~75-120).
    from tools.bench_boxscaling import measure as _bw

    bw_probe = {
        "gbps_4p": round(_bw(4, prefault=True), 1),
        "gbps_16p": round(_bw(16, prefault=True), 1),
    }

    total = round(sum(timings.values()), 3)
    pprl_time = timings["pprl_embed"] + timings["pprl_block_score"] + timings["pprl_match"]
    link_docs = 2 * SYN_N
    out = {
        "metric": "pprl_pipeline_suite",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "rows": rows,
        "runs": runs,
        "samples": all_samples,
        "bw_probe": bw_probe,
        "docs_scored_per_sec": round(n_docs / pprl_time, 1) if pprl_time > 0 else None,
        "linkage_docs_per_sec": round(link_docs / timings["linkage_synthetic"], 1),
        "cpus": CPUS,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
