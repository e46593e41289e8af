"""Regenerate pinned goldens for the driver queries that have no ANSI-SQL
oracle (UDF signatures / iterative CC): neardup_clusters, simhash_pairs,
minhash_sample_pairs.

The driver's CORRECTNESS gate compares each Spark query against a DuckDB
oracle SQL. These three are not SQL-expressible, so their oracle is a
PINNED GOLDEN: the deterministic sf0.01 output, stored as a single parquet
file under goldens/ and read back by the oracle SQL via read_parquet().
The goldens are NOT self-fulfilling rubber stamps — each query's semantics
are independently tested in pytest (recall/precision 1.0 vs a single-node
replica and planted truth for the flagship, scalar-reference bit-equality
for SimHash, seeded-sampler contracts for the sampler); the golden pins
that already-validated output so any regression (or nondeterminism) flips
the driver's hash check.

Run after any change that legitimately alters these outputs:

    python scripts/make_goldens.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.01"
GOLDEN_QUERIES = ["neardup_clusters", "simhash_pairs", "minhash_sample_pairs"]


def main() -> None:
    import __spark_entry__ as entrymod
    from deduplipy_spark.session import get_spark

    spark = get_spark("goldens", cores=8, shuffle_partitions=8)
    qs = entrymod.queries()
    outdir = os.path.join(REPO, "goldens")
    os.makedirs(outdir, exist_ok=True)
    for name in GOLDEN_QUERIES:
        pdf = qs[name](spark, SF_DIR).toPandas()
        path = os.path.join(outdir, f"{name}_sf0.01.parquet")
        pdf.to_parquet(path, index=False)
        print(f"{name}: {len(pdf)} rows -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
