"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries map SURVEY.md §2 operators onto the driver's TPC-H-ish tables
(documents plays the role of the code-file `files` table: doc_id≈file_id,
text≈content). Ops whose dataflow is iterative (connected components →
clustering) have no oracle entry → driver records rows-only checks.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from deduplipy_spark.config import EngineConfig
from deduplipy_spark.functions.blocking_rules import first_two_words
from deduplipy_spark.operators.blocking import RuleBlocker
from deduplipy_spark.plans.pipeline import DedupPipeline


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


DOC_CFG = EngineConfig(id_cols=("doc_id",), content_col="text")


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def q_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup groups via sha256 (SURVEY §2.2 project+distinct pre-pass)."""
    docs = _docs(spark, sf_dir)
    return (
        docs.withColumn("content_sha", F.sha2(F.coalesce("text", F.lit("")), 256))
        .groupBy("content_sha")
        .agg(F.min("doc_id").alias("rep_id"), F.count(F.lit(1)).alias("group_size"))
        .select("content_sha", "rep_id", "group_size")
    )


def q_exact_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-map left-join-back (SURVEY §2.3: deduplicator.py:208)."""
    docs = _docs(spark, sf_dir)
    w = Window.partitionBy("content_sha")
    return (
        docs.withColumn("content_sha", F.sha2(F.coalesce("text", F.lit("")), 256))
        .withColumn("cluster_id", F.min("doc_id").over(w))
        .select("doc_id", "content_sha", "cluster_id")
    )


def q_rule_pairs_first_two_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-blocking pair table (SURVEY §2.3 fingerprint self-join) with the
    first_two_words rule (blocking_rules.py:28-33)."""
    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("file_id"), F.col("text")
    )
    blocker = RuleBlocker({"text": [first_two_words]})
    cfg = EngineConfig(band_cap=100000)      # no capping: pure join semantics
    return blocker.pairs(docs, cfg, hashed=True).select("id_1", "id_2")


def q_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship block→score→cluster pipeline (no SQL oracle: iterative CC)."""
    docs = _docs(spark, sf_dir)
    out = DedupPipeline(spark, DOC_CFG).run(docs)
    return out.select("file_id", "content_sha", "cluster_id").orderBy("file_id")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship near-dup pipeline on /root/testdata/sf0.001."""
    return q_neardup_clusters(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "exact_dup_groups": q_exact_dup_groups,
        "exact_cluster_assign": q_exact_cluster_assign,
        "rule_pairs_first_two_words": q_rule_pairs_first_two_words,
        "neardup_clusters": q_neardup_clusters,
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
        "exact_cluster_assign": """
            SELECT doc_id,
                   sha256(coalesce(text, '')) AS content_sha,
                   min(doc_id) OVER (PARTITION BY sha256(coalesce(text, '')))
                       AS cluster_id
            FROM documents
        """,
        "rule_pairs_first_two_words": """
            WITH fp AS (
                SELECT doc_id,
                       array_to_string(
                           (string_split_regex(trim(text), '\\s+'))[1:2], ' ') AS f
                FROM documents
                WHERE length(trim(text)) > 0
            )
            SELECT a.doc_id AS id_1, b.doc_id AS id_2
            FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id
        """,
        # neardup_clusters: iterative connected components — not ANSI-SQL
        # expressible; driver records the weaker rows-only check.
    }
