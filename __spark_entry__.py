"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries map SURVEY.md §2 operators onto the driver's TPC-H-ish tables
(documents plays the role of the code-file `files` table: doc_id≈file_id,
text≈content).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


# --------------------------------------------------------------------------
# queries: name -> (spark, sf_dir) -> DataFrame
# --------------------------------------------------------------------------

def q_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup groups via sha256 (SURVEY §2.2 project+distinct / exact pre-pass)."""
    docs = _docs(spark, sf_dir)
    return (
        docs.withColumn("content_sha", F.sha2(F.coalesce("text", F.lit("")), 256))
        .groupBy("content_sha")
        .agg(F.min("doc_id").alias("rep_id"), F.count(F.lit(1)).alias("group_size"))
        .select("content_sha", "rep_id", "group_size")
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001 (driver checks rows>0)."""
    return q_exact_dup_groups(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "exact_dup_groups": q_exact_dup_groups,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "exact_dup_groups": """
            SELECT sha256(coalesce(text, '')) AS content_sha,
                   min(doc_id) AS rep_id,
                   count(*) AS group_size
            FROM documents
            GROUP BY 1
        """,
    }
