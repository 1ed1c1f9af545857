"""Candidate-pair generation: salted blocked equi-join + sparse scoring.

Replaces the reference's dense cross-join similarity matrix
(`/root/reference/src/pprl/embedder/embedder.py:468-528`, SURVEY.md §2.4
J1) with a block-key equi-join producing a long-form
``(id1, id2, sim)`` pair table. Scoring stays JVM-side:
identity-SCM soft-cosine ≡ cosine = |A∩B| / (√|A|·√|B|) via
``size(array_intersect(...))`` on the sorted sparse index arrays
(`embedder.py:519` reduces to exactly this when scm = I; see
`docs/tutorials/example-verknupfung.qmd:168-169`).

Scale mechanics:
- dedupe (doc, key) explosion BEFORE the join;
- per-block salting: side-1 rows get ``salt = pmod(hash(id), S)``, side-2
  rows replicate over all S salts, so a celebrity block's pairs spread
  over S shuffle partitions; S is chosen per block from block sizes
  (small blocks keep S=1 and do not replicate);
- AQE skew-join catches residual imbalance;
- per-pair dedupe (a pair may share several keys) via min(block_key)
  groupBy, which also carries provenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pprl_spark.config import EmbedderConfig


def _heap_bytes(spark, key: str, default: str = "1g") -> int:
    """Parse a Spark memory conf ('5g', '512m', '2048') to bytes."""
    raw = str(spark.conf.get(key, default) or default).strip().lower()
    mult = 1
    for suffix, m in (("k", 2**10), ("m", 2**20), ("g", 2**30), ("t", 2**40)):
        if raw.endswith(suffix):
            mult, raw = m, raw[:-1]
            break
    try:
        return int(float(raw) * mult)
    except ValueError:
        return 2**30


def choose_pair_join_hint(
    spark,
    build_rows: int,
    driver_heap: int | None = None,
    exec_heap: int | None = None,
    n_words: int = 16,
) -> str:
    """Pick the pair-join strategy from observable state.

    The unhinted plan is a trap: Catalyst's size estimate under the
    explode/checkpoint lineage comes in under the broadcast threshold and
    silently builds a corpus-sized driver hash relation (measured ~400MB
    at 400k docs — driver OOM). ``auto`` replaces that guess with a
    counted build side and the *configured* memory:

    - **broadcast** when the estimated in-memory relation fits in 10%
      of the smaller of driver/executor heap. Bytes/row scales with the
      Bloom width: the bitmap is ``8*n_words`` B plus a measured ~572 B
      of fixed per-row overhead (key, id, n, hash-relation slots) — the
      calibration point is 700 B/row at bf_size=1024 (n_words=16), the
      100k-doc run's ~400MB from ~600k rows. A fixed 700 B/row constant
      underestimated bf_size=8192 relations ~2.3x and could authorize a
      broadcast past the heap bound. This recovers the fast plan for
      small-to-medium corpora WITH a provable bound, instead of trusting
      Catalyst's estimate.
    - **merge** (sort-merge) otherwise — spills, completes at any scale.

    ``shuffle_hash`` is deliberately NOT auto-selected. It is pinnable
    explicitly (``pair_join_hint="shuffle_hash"``) for operators who have
    measured their cluster, but repeated measurement at 100k docs/side
    shows it is not robustly faster and fails catastrophically under
    memory pressure: local[16]/64 parts 75.0s vs merge 76.9s (a tie);
    local[16]/16 parts 133s vs 81.5s (1.6x WORSE — every core pins one
    large build map); local[32]/128 parts 112.5s then a >570s timeout on
    repeat vs merge's stable 91.1s (GC death spiral once 32 concurrent
    builds contend with the checkpointed block tables in the unified
    pool). A strategy whose best case is a tie and whose worst case is a
    wedged stage has no business being chosen automatically; sort-merge
    degrades gracefully (spills) at every scale and parallelism measured.

    ``driver_heap``/``exec_heap`` (bytes) override the conf reads — for
    tests (``spark.driver.memory`` is immutable at runtime) and callers
    that know the real executor sizing better than the conf.
    """
    if driver_heap is None:
        driver_heap = _heap_bytes(spark, "spark.driver.memory")
    if exec_heap is None:
        exec_heap = _heap_bytes(spark, "spark.executor.memory", default="0")
    if exec_heap == 0:
        # spark.executor.memory is unset. Only in local mode does the
        # driver JVM double as the executor; on a cluster an unset conf
        # means Spark's 1g per-executor default, and substituting a large
        # driver heap here would authorize a broadcast the 1g executors
        # cannot hold (the exact OOM this bound exists to prevent).
        master = str(spark.conf.get("spark.master", "") or "")
        if master.startswith("local"):
            exec_heap = driver_heap
        else:
            exec_heap = 2**30  # Spark's executor-memory default: 1g
    # bytes/row = bitmap (8*n_words) + measured fixed overhead (~572B of
    # key/id/n plus hash-relation slots); 700B/row at the n_words=16
    # calibration point
    inmem_bytes = build_rows * (8 * n_words + 572)
    if inmem_bytes < 0.10 * min(driver_heap, exec_heap):
        return "broadcast"
    return "merge"


def _similarity_expr(sim: str):
    i = F.col("_isect").cast("double")
    s1 = F.col("_n1").cast("double")
    s2 = F.col("_n2").cast("double")
    if sim == "cosine":
        return i / (F.sqrt(s1) * F.sqrt(s2))
    if sim == "dice":
        return F.lit(2.0) * i / (s1 + s2)
    if sim == "jaccard":
        return i / (s1 + s2 - i)
    raise ValueError(f"unknown similarity {sim!r}")


def bloom_bitmap_col(indices, n_words: int):
    """Sparse index array -> fixed-width bitmap (array of n_words longs).

    Single-pass aggregate (array-of-words accumulator). The bitmap is the
    join-side representation of the Bloom vector: 8*n_words bytes fixed
    (128B at bf_size=1024) vs ~360B+ for the int array — smaller shuffle
    and sort rows — and pair scoring becomes word-AND + bit_count instead
    of a per-pair hash-set intersect.
    """
    pow2 = F.array(
        *[F.lit(1 << i if i < 63 else -(2**63)).cast("long") for i in range(64)]
    )
    wseq = F.array(*[F.lit(w) for w in range(n_words)])
    return F.aggregate(
        indices,
        F.array_repeat(F.lit(0).cast("long"), n_words),
        lambda acc, x: F.zip_with(
            acc,
            wseq,
            lambda a, w: F.when(
                F.floor(x.cast("long") / 64).cast("int") == w,
                a.bitwiseOR(F.element_at(pow2, (x % 64 + 1).cast("int"))),
            ).otherwise(a),
        ),
    )


def bitmap_intersect_count(bm1, bm2, n_words: int | None = None):
    """|A ∩ B| from two bitmaps: sum of bit_count(word AND word) — exactly
    equal to size(array_intersect(...)) on the distinct index arrays.

    Pass ``n_words`` (the fixed bitmap width every caller knows from
    config) to get the UNROLLED form — a flat sum of
    ``bit_count(element_at AND element_at)`` terms, all codegen'd
    expressions — instead of the higher-order-function fold, which is
    interpreted per pair (HOFs never enter whole-stage codegen): measured
    2.8s -> 0.8s for scoring the 18.4M-row sf0.1 block join, identical
    values. The fold remains as the fallback for unknown widths.
    """
    if n_words is not None:
        acc = None
        for w_ in range(n_words):
            term = F.bit_count(
                F.element_at(bm1, w_ + 1).bitwiseAND(F.element_at(bm2, w_ + 1))
            ).cast("long")
            acc = term if acc is None else acc + term
        return acc
    return F.aggregate(
        F.zip_with(bm1, bm2, lambda a, b: F.bit_count(a.bitwiseAND(b)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cap_blocks(
    blocks: DataFrame,
    config: EmbedderConfig,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministically thin oversized blocks to ~max_block_size docs.

    Celebrity keys (a shared surname+postcode at web scale) produce
    blocks whose pair count grows quadratically — one 10^6-doc block is
    10^12 pairs on its own. Each doc in a block of size n survives with
    probability 1/ceil(n/cap) via a keyed hash — no window/sort needed,
    just a broadcast of the (hot-key -> factor) dim table and a map-side
    filter. Deterministic across runs and partitionings. True matches
    inside thinned blocks are still covered by the (selectivity-bounded)
    MinHash band keys, which are never the oversized ones unless the
    corpus is degenerate; the F1 gate validates the net effect.
    """
    cap = config.max_block_size
    if not cap:
        return blocks
    # Thin on the HASHED key on both input shapes: bucketed stage tables
    # carry _bk = xxhash64(block_key), so hashing the plain path's string
    # key first makes the per-doc survivor decision numerically identical
    # whether the caller feeds raw or bucketed block tables (one doc's
    # survival = pmod(xxhash64(hashed_key, id), factor) either way —
    # measured as a 1-match difference at 100k docs before this).
    if "_bk" in blocks.columns:
        keyed = blocks.withColumn("_capk", F.col("_bk"))
    else:
        keyed = blocks.withColumn("_capk", F.xxhash64("block_key"))
    hot = (
        keyed.groupBy("_capk")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") > cap)
        .withColumn("_factor", F.ceil(F.col("_n") / F.lit(cap)).cast("long"))
        .select("_capk", "_factor")
    )
    out = (
        keyed.join(F.broadcast(hot), "_capk", "left")
        .where(
            F.col("_factor").isNull()
            | (F.pmod(F.xxhash64("_capk", id_col), F.col("_factor")) == 0)
        )
        .drop("_factor")
    )
    return out.drop("_capk")


def generate_candidates(
    blocks1: DataFrame,
    blocks2: DataFrame | None,
    config: EmbedderConfig,
    id_col: str = "doc_id",
    score: bool = True,
    cap: bool = True,
    min_sim: float | None = None,
    allow_uncapped: bool = False,
) -> DataFrame:
    """Join exploded block tables into scored candidate pairs.

    ``blocks2=None`` means self-linkage (dedup): pairs within one table
    with ``id1 < id2``. Output: (id1, id2, block_key_hash, sim?) with one
    row per distinct pair (provenance is the xxhash64 of the block key —
    the join carries hashed keys + bitmaps, never the strings/arrays).

    ``min_sim`` prunes scored pairs BEFORE the pair-dedupe exchange: the
    filter runs map-side on the join output, so sub-cutoff pairs (the
    vast majority under LSH banding) never hit the shuffle. Pass the
    pipeline's abs_cutoff here when downstream masking would drop them
    anyway (P4, `embedder.py:276`).

    ``allow_uncapped=True`` acknowledges a deliberate ``cap=False`` on
    pre-bucketed inputs (e.g. exact union-equivalence for an oracle) and
    suppresses the no-skew-protection warning; without it the warning
    stays, so unwitting callers still hear about the unguarded shape.
    """
    if cap:
        blocks1 = cap_blocks(blocks1, config, id_col)
        if blocks2 is not None:
            blocks2 = cap_blocks(blocks2, config, id_col)

    # Join-side representation: hash the block key to a long (8B sort keys
    # instead of string compares) and pack the Bloom vector into a bitmap.
    # Measured at 100k docs/source, 16 cores: join+score went 37.7s with
    # (string key, int-array vectors, array_intersect) to 9.5s with
    # (hashed key, bitmaps, bit_count AND) — the shuffle/sort rows are
    # ~2.7x smaller and the per-pair intersect is 16 word-ANDs.
    n_words = -(-(config.bf_size + config.offset) // 64)

    def bitmap_of(blocks):
        # Prefer the bitmap the embed kernel precomputed (bf_bitmap):
        # the JVM construction below is a higher-order function — always
        # interpreted eval (HOFs never enter whole-stage codegen) at
        # ~1ms/row, and the optimizer may re-evaluate the expression once
        # per consumer (join side, salt-size agg, cap agg), which showed
        # up as an intermittent 5x stall with every core inside
        # ArrayAggregate.eval. The fallback keeps old stage tables and
        # bare (id, bf_indices, block_key) inputs working.
        if "bf_bitmap" in blocks.columns:
            return F.col("bf_bitmap")
        return bloom_bitmap_col(F.col("bf_indices"), n_words)

    def n_of(blocks):
        if "bf_n" in blocks.columns:
            return F.col("bf_n")
        return F.size("bf_indices")

    def bk_of(blocks):
        # bucketed stage tables (sources.tables.write_bucketed_blocks)
        # store the hashed key as _bk; joining on the stored column keeps
        # the scan's bucket distribution valid, so the pair join runs
        # with ZERO exchanges on pre-bucketed inputs
        if "_bk" in blocks.columns:
            return F.col("_bk")
        return F.xxhash64("block_key")

    left = blocks1.select(
        F.col(id_col).alias("id1"),
        bk_of(blocks1).alias("_bk"),
        bitmap_of(blocks1).alias("_bm1"),
        n_of(blocks1).alias("_n1"),
    )
    right_src = blocks2 if blocks2 is not None else blocks1
    right = right_src.select(
        F.col(id_col).alias("id2"),
        bk_of(right_src).alias("_bk"),
        bitmap_of(right_src).alias("_bm2"),
        n_of(right_src).alias("_n2"),
    )

    # ---- skew salting -------------------------------------------------
    # Block sizes on the (usually larger) left side decide the per-block
    # fan-out S. Small dim table (block_key -> S) is broadcast to both
    # sides: left takes one salted key, right replicates S times. This is
    # the classic salt-and-replicate pattern; S=1 for all but hot keys so
    # replication cost is bounded.
    #
    # PRE-BUCKETED inputs (stored _bk column) skip salting entirely:
    # salting redistributes rows ACROSS a shuffle, and the whole point of
    # bucketed stage tables is that the join has no shuffle — adding
    # _salt to the join keys would force the exchange right back in
    # (Spark requires all cluster keys covered for co-partitioning).
    # Skew safety on that path comes from cap_blocks, which bounds any
    # block to max_block_size docs (~cap²/2 pairs per hot bucket task) —
    # so the zero-exchange path requires cap=True (warning below).
    # ONE bucketed side also disables salting, deliberately: Spark then
    # shuffles only the plain side into the bucket distribution — the
    # delta-match shape, where a small delta probes a big write-once
    # corpus with zero corpus-side exchange. Salting would replicate the
    # corpus over the salt range every batch, re-introducing the very
    # shuffle bucketing removes, to protect against a skew that
    # cap_blocks already bounds.
    pre_bucketed = "_bk" in blocks1.columns or (
        blocks2 is not None and "_bk" in blocks2.columns
    )
    if pre_bucketed and not cap and not allow_uncapped:
        import warnings

        warnings.warn(
            "generate_candidates: pre-bucketed inputs skip salting and "
            "cap=False disables block capping — no skew protection is "
            "active. Pass cap=True (default) on bucketed inputs.",
            stacklevel=2,
        )
    S = config.salt_buckets
    if S > 1 and not pre_bucketed:
        sizes = (
            left.groupBy("_bk")
            .agg(F.count("*").alias("_n"))
            .where(F.col("_n") > config.max_block_size)
            .withColumn(
                "_s",
                F.least(
                    F.lit(S), F.ceil(F.col("_n") / F.lit(config.max_block_size)).cast("int")
                ),
            )
            .select("_bk", "_s")
        )
        left = (
            left.join(F.broadcast(sizes), "_bk", "left")
            .withColumn("_s", F.coalesce(F.col("_s"), F.lit(1)))
            .withColumn("_salt", F.pmod(F.xxhash64("id1"), F.col("_s")).cast("int"))
            .drop("_s")
        )
        right = (
            right.join(F.broadcast(sizes), "_bk", "left")
            .withColumn("_s", F.coalesce(F.col("_s"), F.lit(1)))
            .withColumn("_salt", F.explode(F.sequence(F.lit(0), F.col("_s") - 1)))
            .drop("_s")
        )
        join_keys = ["_bk", "_salt"]
    else:
        join_keys = ["_bk"]

    # Join-strategy hint — NEVER let the planner choose unhinted: both
    # sides are corpus-sized (docs x keys x salt, carrying the bf arrays),
    # but Catalyst's size estimate under the explode/checkpoint lineage
    # comes in under the broadcast threshold — at 100k docs/source the
    # unhinted plan silently broadcast a ~400MB hash relation from the
    # driver (plan audit showed BuildRight on the FULL salted right side);
    # at 400k it OOMed the driver outright. "auto" counts the build side
    # (one cheap action when the caller feeds materialized stage tables,
    # as the pipeline and bench do) and broadcasts only under a provable
    # heap bound, falling back to sort-merge (stable at every measured
    # scale: 100k 75-91s, 400k 518.7s @5g — spills, never wedges); see
    # choose_pair_join_hint for why shuffle_hash is pin-only.
    hint = config.pair_join_hint
    if hint == "auto":
        # count the un-bitmapped source (scan-only on materialized input);
        # 1.25 covers the salt replication of hot blocks (bounded by S)
        build_rows = int(right_src.count() * 1.25)
        hint = choose_pair_join_hint(left.sparkSession, build_rows, n_words=n_words)
    if hint == "broadcast":
        pairs = left.join(F.broadcast(right), join_keys)
    else:
        pairs = left.hint(hint).join(right, join_keys)
    if blocks2 is None:
        pairs = pairs.where(F.col("id1") < F.col("id2"))
    if "_salt" in pairs.columns:
        pairs = pairs.drop("_salt")

    if score:
        # Score BEFORE the pair-dedupe shuffle: the intersect runs on the
        # join output where both bitmaps are already co-located, so the
        # groupBy below shuffles only (id1, id2, key, sim) scalars — at
        # 10^12 docs the pair table dominates, and not carrying two
        # vectors through the exchange is a ~10x shuffle saving.
        # Intersect form: the UNROLLED flat bit_count sum (codegen) only
        # when no min_sim filter follows (2.8s -> 0.8s on 18.4M pairs);
        # the compact interpreted HOF fold under a trailing filter. The
        # unrolled-under-filter alternatives were measured and rejected
        # TWICE (r6, both sessions), in both join shapes:
        # - broadcast shape, 20k docs/side, noop sink: fold 3.0s vs
        #   unrolled 7.5s, unrolled + a monotonically_increasing_id
        #   pushdown barrier 7.2s — the 16-term chain un-JITs the fused
        #   broadcast-probe + salt-explode stage with or without the
        #   pushed-down filter duplicating it;
        # - merge shape, 100k docs/side, local[4] (the at-scale shape):
        #   match phase 58.6s with the fold vs 241.4s with
        #   unrolled+barrier. A 20k merge-shape .count() probe had
        #   suggested the opposite (3.4s vs 8.9s) — but count() lets
        #   Catalyst prune first(sim) from the pair-dedupe aggregate, so
        #   that probe measured a plan the real query never runs.
        #   Probe with a noop sink or at the real consumer, not count().
        pairs = (
            pairs.withColumn(
                "_isect",
                bitmap_intersect_count(
                    F.col("_bm1"),
                    F.col("_bm2"),
                    n_words if min_sim is None else None,
                ),
            )
            .withColumn("sim", _similarity_expr(config.similarity))
            .drop("_isect", "_bm1", "_bm2", "_n1", "_n2")
        )
        if min_sim is not None:
            pairs = pairs.where(F.col("sim") >= F.lit(min_sim))
        # a pair sharing k block keys appears k times with equal sim; the
        # dedupe is REQUIRED before mutual-best ranking (duplicate rows of
        # one pair could take rank 1 in the two windows independently and
        # lose the pair), and it shuffles only scalars. Provenance is the
        # hashed key (the string key never survives to the join sides).
        # Shape-dependent dedupe (same mechanism as setjoin.py): in the
        # sort-merge shape the join output is partitioned by block key,
        # so a pair's duplicates are cross-partition and the map-side
        # partial aggregate dedupes ~nothing — repartition(id1, id2)
        # runs both aggregate passes clustered instead. In the broadcast
        # shape the probe side is doc-ordered, duplicates are already
        # co-partitioned, and the map-side partial dedupes them before
        # any exchange — keep the plain groupBy there.
        if hint != "broadcast":
            pairs = pairs.repartition(F.col("id1"), F.col("id2"))
        return pairs.groupBy("id1", "id2").agg(
            F.min("_bk").alias("block_key_hash"), F.first("sim").alias("sim")
        )
    return (
        pairs.drop("_bm1", "_bm2", "_n1", "_n2")
        .groupBy("id1", "id2")
        .agg(F.min("_bk").alias("block_key_hash"))
    )
