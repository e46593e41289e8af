"""Exact duplicate detection — the M1 end-to-end slice.

Semantics mirror the reference's distinct-rows contract
(``deduplipy/deduplicator/deduplicator.py:183`` does
``X[col_names].drop_duplicates()`` so byte-identical rows collapse before any
pair scoring). We make that explicit and scale-safe: group rows by
``sha2(content, 256)`` and elect ``min(file_id)`` as the group representative.

Scale notes: a single hash-aggregate shuffle on ``content_sha`` (high
cardinality, near-uniform → no skew); partial aggregation is map-side; the
representative join back is an equi-join on the sha that AQE will broadcast
when the group table is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_groups(files: DataFrame) -> DataFrame:
    """(content_sha, rep_id, group_size) — one row per distinct content."""
    return files.groupBy("content_sha").agg(
        F.min("file_id").alias("rep_id"),
        F.count(F.lit(1)).alias("group_size"),
    )


def exact_clusters(files: DataFrame) -> DataFrame:
    """Assign every row an exact-dup cluster id (= min file_id of its sha group).

    Input must carry (file_id, content_sha) from ids.with_identity.
    """
    w = Window.partitionBy("content_sha")
    return files.withColumn("exact_cluster_id", F.min("file_id").over(w))


def representatives(files: DataFrame) -> DataFrame:
    """One representative row per distinct content — the near-dup pipeline input.

    Keeps original multiplicity recoverable via (content_sha -> members) later,
    unlike the reference which silently drops it (SURVEY.md §1.3.1).
    """
    w = Window.partitionBy("content_sha").orderBy("file_id")
    return (
        files.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
