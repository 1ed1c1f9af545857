"""Exact set-similarity self-join via prefix filtering (AllPairs/PPJoin).

The LOSSLESS counterpart of the MinHash-LSH near-dup path
(``operators/dedup.py``): returns every pair with Jaccard >= t, not a
banding-probability sample of them.  The reference's all-pairs compare
(reference ``src/pprl/matching.py`` similarity loop) is quadratic;
MinHash trades recall for scale; prefix filtering keeps EXACTNESS and
still prunes the candidate space, because two sets with Jaccard >= t
must share a token in their (small) rarest-token prefixes:

- canonical order: every doc's distinct tokens sorted by (global df,
  token) ascending — rarest first.  df comes from a map-side-combined
  ``groupBy(token).count()`` hash-joined back onto the exploded tokens
  (skew-safe: a hub token never sorts its posting list in one window
  task), then one row_number window over the doc partition.
- prefix: asymmetric (AllPairs).  The LARGER record of a pair probes
  with its first ``n - ceil(t*n) + 1`` tokens; the SMALLER record is
  indexed by only its first ``n - ceil(2t/(1+t)*n) + 1`` tokens
  (0.43n vs 0.6n at t=0.4).  Lossless: for a matching pair with
  n_small <= n_big the required overlap a = ceil(t/(1+t)*(n_big +
  n_small)) satisfies a >= ceil(t*n_big) (because n_small >= t*n_big)
  AND a >= ceil(2t/(1+t)*n_small) (because n_big >= n_small), and the
  FIRST common token in canonical order sits within position
  n - a + 1 on BOTH sides — so it lands in the big side's probing
  prefix and the small side's indexing prefix.  The join takes
  probe x index with a (n, id)-lexicographic role condition, so every
  unordered pair is considered exactly once with the correct roles.
  Prefixes select the LOW-df tokens by construction, so join blocks
  are naturally small (the skew story: hub tokens like stopwords fall
  out of prefixes for all but the shortest docs).
- length filter: min(n1,n2) >= t * max(n1,n2), else Jaccard < t.
- positional filter (PPJoin): a candidate generated at prefix
  positions (p1, p2) can overlap at most min(n1-p1, n2-p2) + 1; if
  that is below the required overlap ceil(t/(1+t) * (n1+n2)) the
  generation is pruned.  Losslessness: for a true match the FIRST
  common token (canonical order) always satisfies the bound, and a
  pair survives if ANY of its generations does.
- verify: join the distinct token arrays back for the candidate pairs
  only and test ``|A∩B| * den >= num * |A∪B|``.

Exactness contract: the threshold is converted to an exact rational
num/den, so every comparison (prefix length, length filter, positional
bound, final threshold) is INTEGER arithmetic — no float-boundary
drift between engines or between this and the naive join.  The
reported ``jaccard`` is one correctly-rounded int→double division.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def jaccard_join(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    threshold: float | str = 0.5,
    positional: bool = True,
    materialize: str = "checkpoint",
) -> DataFrame:
    """All pairs (id1 < id2) with exact token-set Jaccard >= threshold.

    ``df`` carries one row per doc with an array column of tokens
    (dupes are removed here).  Returns
    ``(id1, id2, n1, n2, intersection, jaccard)``.

    ``materialize`` cuts the FOUR evaluations a naive plan performs
    (prefix pipeline on both sides of the self-join, token arrays on
    both sides of the verify join) to ONE: the tokenized base and the
    ranked prefix table are materialized and every join probes the
    materialized frame.  Same checkpoint|persist|none escape hatch as
    the dedup operators (persist for cluster callers that need
    recoverable lineage, none when the caller already materialized).
    """
    from pprl_spark.operators.dedup import _materialize
    frac = Fraction(str(threshold))
    num, den = frac.numerator, frac.denominator
    if not 0 < frac <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold!r}")

    # Materialize BEFORE the n > 0 filter: filtering on a projected alias
    # pushes the predicate below the projection, re-evaluating the (often
    # expensive — shingle folds) token expression once for the filter and
    # once for the column. Post-checkpoint, size() reads a stored array.
    base = _materialize(
        df.select(
            F.col(id_col).alias("_id"), F.array_distinct(F.col(tokens_col)).alias("_tk")
        ),
        materialize,
    )
    base = base.withColumn("_n", F.size("_tk").cast("long")).filter(F.col("_n") > 0)

    ex = base.select("_id", "_n", F.explode("_tk").alias("_t"))
    # Token document frequency via map-side-combined aggregation + hash
    # join, NOT count() over a token-partitioned window: a hub token (a
    # stopword-grade shingle present in half the corpus) would put its
    # whole posting list into ONE window partition and sort it in a
    # single task, while the groupBy partial-aggregates map-side (the
    # shuffle carries one row per distinct token per map partition) and
    # the join back is AQE-skew-splittable. shuffle_hash on the tiny df
    # side avoids sort-merge's full sort of the exploded token table.
    tok_df = ex.groupBy("_t").agg(F.count("*").alias("_df"))
    ranked = ex.join(tok_df.hint("shuffle_hash"), "_t").withColumn(
        "_pos",
        F.row_number()
        .over(Window.partitionBy("_id").orderBy("_df", "_t"))
        .cast("long"),
    )
    # probing prefix n - ceil(t*n) + 1 in exact integers:
    # ceil(num*n/den) = (num*n + den - 1) DIV den
    prefix_len = F.expr(f"_n - ((_n * {num} + {den - 1}) DIV {den}) + 1")
    pref = _materialize(
        ranked.filter(F.col("_pos") <= prefix_len).select("_id", "_t", "_n", "_pos"),
        materialize,
    )
    # indexing prefix n - ceil(2t/(1+t)*n) + 1 (always <= probing
    # prefix, so it filters the materialized probe-prefix table):
    # ceil(2*num*n/(num+den)) = (2*num*n + num+den-1) DIV (num+den)
    index_len = F.expr(
        f"_n - ((_n * {2 * num} + {num + den - 1}) DIV {num + den}) + 1"
    )

    a = pref.select(
        F.col("_id").alias("_pid"),
        "_t",
        F.col("_n").alias("_pn"),
        F.col("_pos").alias("_pp"),
    )
    b = pref.filter(F.col("_pos") <= index_len).select(
        F.col("_id").alias("_iid"),
        "_t",
        F.col("_n").alias("_in"),
        F.col("_pos").alias("_ip"),
    )
    cand = (
        a.join(b, "_t")
        # role condition: the index side is the (n, id)-lexicographically
        # smaller record, so each unordered pair is generated once with
        # the larger record probing — the asymmetry that lets the index
        # prefix be shorter
        .filter(
            (F.col("_in") < F.col("_pn"))
            | ((F.col("_in") == F.col("_pn")) & (F.col("_iid") < F.col("_pid")))
        )
        # length filter (index side is the smaller): n_i >= t * n_p
        .filter(F.col("_in") * F.lit(den) >= F.col("_pn") * F.lit(num))
    )
    if positional:
        # ub = min(n_p-p_p, n_i-p_i) + 1 >= ceil(num*(n_p+n_i)/(num+den))
        ub = F.least(
            F.col("_pn") - F.col("_pp"), F.col("_in") - F.col("_ip")
        ) + F.lit(1)
        cand = cand.filter(
            ub * F.lit(num + den) >= (F.col("_pn") + F.col("_in")) * F.lit(num)
        )
    # Pair dedupe via an explicit hash repartition + clustered dedupe
    # instead of .distinct(): the join output is partitioned BY TOKEN, so
    # a pair's duplicate generations live in different partitions and the
    # map-side partial aggregate of a plain distinct dedupes ~nothing —
    # a pure-overhead hash build over 9M rows below the exchange.  With
    # repartition(id1, id2) the exchange carries the same slim rows but
    # the clustering requirement is already satisfied above it, so BOTH
    # aggregate passes run on clustered data and the below-exchange
    # partial disappears (measured at sf0.1: 2.2s -> 1.5s for the dedupe
    # stage).  Both key columns partition, so a hub document cannot skew
    # one partition.
    cand = cand.select(
        F.least("_pid", "_iid").alias("id1"),
        F.greatest("_pid", "_iid").alias("id2"),
    )
    cand = cand.repartition(F.col("id1"), F.col("id2")).dropDuplicates(
        ["id1", "id2"]
    )

    s1 = base.select(F.col("_id").alias("id1"), F.col("_tk").alias("_tk1"))
    s2 = base.select(F.col("_id").alias("id2"), F.col("_tk").alias("_tk2"))
    inter = F.size(F.array_intersect("_tk1", "_tk2")).cast("long")
    return (
        cand.join(s1, "id1")
        .join(s2, "id2")
        .withColumn("intersection", inter)
        .withColumn(
            "_union",
            (F.size("_tk1") + F.size("_tk2")).cast("long") - F.col("intersection"),
        )
        .filter(F.col("intersection") * F.lit(den) >= F.col("_union") * F.lit(num))
        .select(
            "id1",
            "id2",
            F.size("_tk1").cast("long").alias("n1"),
            F.size("_tk2").cast("long").alias("n2"),
            "intersection",
            (F.col("intersection").cast("double") / F.col("_union").cast("double")).alias(
                "jaccard"
            ),
        )
    )


def containment_join(
    probe: DataFrame,
    target: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    threshold: float | str = 0.5,
    materialize: str = "checkpoint",
) -> DataFrame:
    """Exact ASYMMETRIC containment join: every (probe, target) pair
    with |P∩T| / |P| >= threshold — "probe is mostly inside target".

    The quote/boilerplate/plagiarism shape Jaccard cannot express: a
    short passage inside a long document has tiny Jaccard but full
    containment. Exact prefix filtering still applies, one-sided: a
    probe needs overlap α = ceil(t·nP), so ANY nP−α+1 of its tokens
    include a shared one (pigeonhole — for any ordering), and only the
    probe's rarest-first prefix joins the target's inverted index.

    Scale shape: the target-side df is a map-side-combined token count
    left-joined onto the probe tokens (absent tokens coalesce to df 0),
    so probe tokens absent from the target rank rarest and generate
    zero candidates, and no hub token ever sorts its posting list in a
    single window task. The candidate
    join probes the target's FULL posting lists — that is inherent to
    containment (the target has no prefix), so hub-token postings are
    the cost driver; rarest-first probe prefixes keep hub tokens out of
    the join for all but the most common-word-only probes. Verification
    joins the distinct token arrays back for candidates only; the
    threshold comparison is integer-rational (``inter·den >= num·nP``),
    exactness-checked against the naive join in tests and the driver
    oracle.
    """
    frac = Fraction(str(threshold))
    num, den = frac.numerator, frac.denominator
    if not 0 < frac <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold!r}")
    from pprl_spark.operators.dedup import _materialize

    def _base(df: DataFrame) -> DataFrame:
        # materialize before the n > 0 filter — same pushdown-duplication
        # avoidance as jaccard_join's base
        mat = _materialize(
            df.select(
                F.col(id_col).alias("_id"),
                F.array_distinct(F.col(tokens_col)).alias("_tk"),
            ),
            materialize,
        )
        return mat.withColumn("_n", F.size("_tk").cast("long")).filter(
            F.col("_n") > 0
        )

    pb, tb = _base(probe), _base(target)
    t_ex = tb.select("_id", "_n", F.explode("_tk").alias("_t"))
    p_ex = pb.select("_id", "_n", F.explode("_tk").alias("_t"))
    # Target-side document frequency via map-side-combined aggregation +
    # LEFT hash join (probe tokens absent from the target coalesce to
    # df 0 -> rank rarest-first and generate zero candidates), replacing
    # the tagged-union conditional window: a hub token would sort its
    # whole posting list in one window task, while the groupBy partial-
    # aggregates map-side and the join back is AQE-skew-splittable.
    tdf = t_ex.groupBy("_t").agg(F.count("*").alias("_df"))
    # probe prefix: first nP - ceil(t*nP) + 1 tokens, rarest-in-target first
    ranked = (
        p_ex.join(tdf.hint("shuffle_hash"), "_t", "left")
        .withColumn("_df", F.coalesce("_df", F.lit(0)))
        .withColumn(
            "_pos",
            F.row_number()
            .over(Window.partitionBy("_id").orderBy("_df", "_t"))
            .cast("long"),
        )
    )
    prefix_len = F.expr(f"_n - ((_n * {num} + {den - 1}) DIV {den}) + 1")
    pref = ranked.filter(F.col("_pos") <= prefix_len)

    cand = (
        pref.select(F.col("_id").alias("probe_id"), "_t", F.col("_n").alias("n_probe"))
        .join(
            t_ex.select(
                F.col("_id").alias("target_id"), "_t", F.col("_n").alias("n_target")
            ),
            "_t",
        )
        # the target must be able to hold α common tokens: nT >= t*nP
        .filter(F.col("n_target") * F.lit(den) >= F.col("n_probe") * F.lit(num))
        .select("probe_id", "target_id")
        # same dedupe shape as jaccard_join: duplicates are cross-
        # partition (the join partitions by token), so one explicit
        # repartition + clustered dedupe beats partial+final distinct
        .repartition(F.col("probe_id"), F.col("target_id"))
        .dropDuplicates(["probe_id", "target_id"])
    )
    s1 = pb.select(F.col("_id").alias("probe_id"), F.col("_tk").alias("_tk1"))
    s2 = tb.select(F.col("_id").alias("target_id"), F.col("_tk").alias("_tk2"))
    inter = F.size(F.array_intersect("_tk1", "_tk2")).cast("long")
    return (
        cand.join(s1, "probe_id")
        .join(s2, "target_id")
        .withColumn("intersection", inter)
        .filter(
            F.col("intersection") * F.lit(den)
            >= F.size("_tk1").cast("long") * F.lit(num)
        )
        .select(
            "probe_id",
            "target_id",
            F.size("_tk1").cast("long").alias("n_probe"),
            F.size("_tk2").cast("long").alias("n_target"),
            "intersection",
            (
                F.col("intersection").cast("double")
                / F.size("_tk1").cast("double")
            ).alias("containment"),
        )
    )
