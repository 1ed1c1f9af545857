"""Build the committed golden fixtures under fixtures/ (sf0.01 corpus).

Three artifacts back oracle rows that plain SQL cannot compute:

- ``metaphone_sf001.parquet`` — expected double-metaphone codes (golden
  output of ``pprl_metaphone``; DuckDB has no double-metaphone).
- ``assignment_sf001.parquet`` — expected per-block Hungarian matching
  (golden output of ``pprl_assignment``; DuckDB can't run assignment).
- ``scm_sf001.parquet`` — the trained soft-cosine matrix as sparse
  (i, j, val) triples, written by the ``pprl_scm_scored`` query itself;
  the oracle recomputes the quadratic form FROM this dump, so unlike the
  two goldens it checks the scoring math, not just reproducibility.

All three are deterministic (seeded generators, seeded training, exact
tie-breaks), so rebuilding on the same corpus is a no-op diff. Rerun after
any change to the metaphone kernel, the Hungarian/conflict-resolution
path, or the Bloom/blocking parameters::

    python tools/build_fixtures.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

import __spark_entry__ as entry
from pprl_spark.session import get_spark

SF = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark("fixtures", master="local[8]", shuffle_partitions=8)
    os.makedirs(entry.FIXTURES_DIR, exist_ok=True)
    qs = entry.queries()

    qs["pprl_metaphone"](spark, SF).toPandas().sort_values(
        ["doc_id", "code"]
    ).to_parquet(f"{entry.FIXTURES_DIR}/metaphone_sf001.parquet", index=False)
    print("metaphone golden written")

    qs["pprl_assignment"](spark, SF).toPandas().sort_values(
        ["id1", "id2"]
    ).to_parquet(f"{entry.FIXTURES_DIR}/assignment_sf001.parquet", index=False)
    print("assignment golden written")

    # side effect: trains + dumps the SCM fixture (skips if unchanged)
    n = qs["pprl_scm_scored"](spark, SF).count()
    print(f"scm fixture synced ({n} scored pairs)")
    spark.stop()


if __name__ == "__main__":
    main()
