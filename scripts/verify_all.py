"""Full local verify: entry() smoke + every queries() row vs its oracle_sql
(DuckDB) at sf0.01 — mimics the driver's CORRECTNESS gate (rows + schema +
sorted-value hash). One process, one Spark session. Exit 1 on any mismatch.
"""
from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as e
from deduplipy_spark.session import get_spark

SF_DIR = os.environ.get("VERIFY_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def value_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(list(pdf.columns), ignore_index=True)
    return hashlib.sha256(
        pdf.to_csv(index=False, float_format="%.9g").encode()
    ).hexdigest()[:16]


def main() -> int:
    spark = get_spark("verify", cores=int(os.environ.get("VERIFY_CPUS", "8")),
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"create view {t} as select * from read_parquet('{p}')")

    df = e.entry(spark)
    print(f"entry(): {df.count()} rows, schema={df.schema.simpleString()[:120]}")

    queries = e.queries()
    oracles = e.oracle_sql()
    fails = []
    for name, fn in queries.items():
        try:
            spdf = fn(spark, SF_DIR).toPandas()
            if name not in oracles:
                print(f"  {name:28s} rows={len(spdf):7d}  (no oracle: rows-only)")
                continue
            opdf = con.sql(oracles[name]).df()
            # normalize column order + dtypes like the driver (sort by name)
            ok_rows = len(spdf) == len(opdf)
            ok_cols = sorted(spdf.columns) == sorted(opdf.columns)
            ok_hash = ok_rows and ok_cols and value_hash(spdf) == value_hash(opdf)
            status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
            print(f"  {name:28s} rows={len(spdf):7d}/{len(opdf):7d} "
                  f"cols={'ok' if ok_cols else 'MISMATCH'} hash={'ok' if ok_hash else 'MISMATCH'} {status}")
            if status == "FAIL":
                fails.append(name)
        except Exception as ex:  # noqa: BLE001
            print(f"  {name:28s} ERROR: {ex}")
            fails.append(name)
    spark.stop()
    if fails:
        print("FAILURES:", fails)
        return 1
    print("all green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
