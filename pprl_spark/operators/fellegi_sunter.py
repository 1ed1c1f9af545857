"""Fellegi-Sunter probabilistic match weighting with unsupervised EM.

The classical record-linkage scoring model (Fellegi & Sunter 1969), in
the shape modern Spark linkage engines use (cf. the open-source Splink
project's EM approach): per-field agreement indicators over candidate
pairs, unsupervised EM over the *aggregated pattern table* to estimate
per-field m/u probabilities, and a log-likelihood-ratio match score.

The reference toolkit scores pairs by Bloom similarity alone
(`/root/reference/src/pprl/embedder/embedder.py` compare/score); this
operator extends the engine with calibrated per-field evidence weights —
the standard tool when fields differ in discriminating power.

Scale design — the EM never sees pairs:

1. :func:`agreement_vectors` adds 0/1 indicator columns to the candidate
   pair frame (pure codegen'd projection, zero shuffle, zero Python).
2. :func:`pattern_counts` aggregates pairs to at most ``2**k`` rows
   (map-side combined — the shuffle carries ≤ 2**k rows per partition
   however many pairs exist).
3. :func:`fs_em` runs EM on the driver over that tiny table with numpy —
   exact, deterministic, microseconds; 10^12 candidate pairs cost the
   same EM as 10^4 because only pattern frequencies enter the updates.
4. :func:`fs_weights_micro` converts m/u into **integer micro-ban**
   agreement/disagreement weights (``floor(1e6*log2(ratio))``). As with
   the unigram-surprisal stack, truncating to integers at the tiny
   parameter table makes every downstream pair score an exact integer
   sum — immune to libm ulp divergence and summation order, hence
   byte-reproducible by any SQL oracle.
5. :func:`fs_score` sums the per-field weight literals with a CASE
   projection — the weights are plan literals, so scoring adds no join.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def agreement_vectors(pairs: DataFrame, agreements: dict[str, Column]) -> DataFrame:
    """Add one 0/1 ``g_<field>`` column per named agreement predicate.

    ``agreements`` maps field name -> boolean Column over the pair frame
    (e.g. ``F.col("lang1") == F.col("lang2")``). Null-safe: nulls count
    as disagreement (F-S treats missingness as non-agreement by default).
    """
    out = pairs
    for name, cond in agreements.items():
        out = out.withColumn(
            f"g_{name}", F.coalesce(cond.cast("int"), F.lit(0)).cast("int")
        )
    return out


def pattern_counts(gamma: DataFrame, fields: list[str]) -> DataFrame:
    """Aggregate pairs to the (≤ 2**k)-row agreement-pattern table."""
    cols = [f"g_{f}" for f in fields]
    return gamma.groupBy(*cols).agg(F.count("*").alias("cnt"))


def fs_em(
    patterns: list[tuple[tuple[int, ...], int]],
    n_fields: int,
    iters: int = 50,
    init_lambda: float = 0.1,
    init_m: float = 0.9,
    init_u: float = 0.1,
) -> dict:
    """EM for the two-class conditional-independence F-S model.

    ``patterns``: [(gamma_vector, count), ...] — the collected pattern
    table. Returns {"lambda": float, "m": [k], "u": [k], "iters": int}.
    Deterministic: fixed iteration count, fixed init, float64 numpy on a
    table whose row order does not affect the (elementwise) updates'
    results beyond float summation order — the pattern list is sorted
    internally so the same counts always produce the same parameters.
    """
    import numpy as np

    pats = sorted(patterns)
    G = np.array([p for p, _ in pats], dtype=np.float64).reshape(len(pats), n_fields)
    c = np.array([n for _, n in pats], dtype=np.float64)
    lam = float(init_lambda)
    m = np.full(n_fields, float(init_m))
    u = np.full(n_fields, float(init_u))
    eps = 1e-12
    for _ in range(iters):
        # E-step in log space (k fields -> no underflow for k < 1000)
        log_pm = G @ np.log(m + eps) + (1 - G) @ np.log(1 - m + eps)
        log_pu = G @ np.log(u + eps) + (1 - G) @ np.log(1 - u + eps)
        wm = lam * np.exp(log_pm)
        wu = (1 - lam) * np.exp(log_pu)
        r = wm / (wm + wu)
        # M-step
        cr = c * r
        cu = c * (1 - r)
        lam = float(cr.sum() / c.sum())
        m = (cr @ G) / max(cr.sum(), eps)
        u = (cu @ G) / max(cu.sum(), eps)
        m = np.clip(m, eps, 1 - eps)
        u = np.clip(u, eps, 1 - eps)
    return {"lambda": lam, "m": m.tolist(), "u": u.tolist(), "iters": iters}


def fs_weights_micro(m: list[float], u: list[float]) -> list[tuple[int, int]]:
    """Per-field (agreement, disagreement) weights in integer micro-bans.

    agreement  = floor(1e6 * log2(m_i / u_i))
    disagreement = floor(1e6 * log2((1-m_i) / (1-u_i)))

    Integers at the parameter table -> every pair score is an exact
    integer sum (order-free, engine-free); the floor boundary is crossed
    only by a libm ulp on the k driver-side values, which the committed
    fixture freezes anyway.
    """
    out = []
    for mi, ui in zip(m, u):
        out.append(
            (
                math.floor(1e6 * math.log2(mi / ui)),
                math.floor(1e6 * math.log2((1.0 - mi) / (1.0 - ui))),
            )
        )
    return out


def fs_score(
    gamma: DataFrame, fields: list[str], weights: list[tuple[int, int]]
) -> DataFrame:
    """Add ``score_u``: Σ_i (g_i ? agree_w_i : disagree_w_i), integer.

    The weights are embedded as plan literals (CASE projection): scoring
    is whole-stage-codegen'd, adds no join and no shuffle on top of the
    candidate pair frame.
    """
    if len(fields) != len(weights):
        raise ValueError(f"{len(fields)} fields vs {len(weights)} weights")
    terms = [
        F.when(F.col(f"g_{f}") == 1, F.lit(int(aw))).otherwise(F.lit(int(dw)))
        for f, (aw, dw) in zip(fields, weights)
    ]
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return gamma.withColumn("score_u", total.cast("long"))


def fs_train(
    gamma: DataFrame, fields: list[str], iters: int = 50, **em_kwargs
) -> dict:
    """Aggregate patterns, run EM, return params + micro-ban weights.

    The only driver materialization is the ≤ 2**k-row pattern table.
    """
    rows = pattern_counts(gamma, fields).collect()
    pats = [
        (tuple(int(r[f"g_{f}"]) for f in fields), int(r["cnt"])) for r in rows
    ]
    params = fs_em(pats, len(fields), iters=iters, **em_kwargs)
    params["fields"] = list(fields)
    params["weights_u"] = fs_weights_micro(params["m"], params["u"])
    params["patterns"] = sorted(pats)
    return params
