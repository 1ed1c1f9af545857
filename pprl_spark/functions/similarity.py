"""String-similarity kernels: Jaro, Jaro-Winkler.

The north star scores candidate pairs with Dice/cosine over Bloom sets
(native, ``operators.candidates``) plus Jaro-Winkler on name fields for
tie-breaking. Spark has no built-in Jaro-Winkler, so this is a pure-Python
kernel (standard Winkler variant: prefix scaling p=0.1, max prefix 4,
applied unconditionally — matching DuckDB's ``jaro_winkler_similarity``,
which the oracle uses) wrapped in a vectorized pandas UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def jaro(s1: str, s2: str) -> float:
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0  # incl. ("","") -> 0.0, matching DuckDB
    if s1 == s2:
        return 1.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    flags1 = [False] * len1
    flags2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c:
                flags1[i] = flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[j]:
                j += 1
            if s1[i] != s2[j]:
                transpositions += 1
            j += 1
    t = transpositions // 2
    m = matches
    return (m / len1 + m / len2 + (m - t) / m) / 3.0


def jaro_winkler(
    s1: str,
    s2: str,
    scaling: float = 0.1,
    max_prefix: int = 4,
    boost_threshold: float = 0.7,
) -> float:
    """Classic Winkler variant: prefix boost only when jaro > 0.7
    (fuzz-verified bit-exact against DuckDB's jaro_winkler_similarity).
    """
    j = jaro(s1, s2)
    if j <= boost_threshold:
        return j
    prefix = 0
    for a, b in zip(s1[:max_prefix], s2[:max_prefix]):
        if a != b:
            break
        prefix += 1
    return j + prefix * scaling * (1.0 - j)


@F.pandas_udf(T.DoubleType())
def jaro_winkler_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
    return pd.Series(
        [
            jaro_winkler(a, b) if a is not None and b is not None else None
            for a, b in zip(s1, s2)
        ]
    )


def jaro_winkler_col(c1: Column | str, c2: Column | str) -> Column:
    a = F.col(c1) if isinstance(c1, str) else c1
    b = F.col(c2) if isinstance(c2, str) else c2
    return jaro_winkler_udf(a, b)
