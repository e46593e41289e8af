"""Deterministic row identity.

The reference assigns ``row_number = np.arange(len(df))`` at predict time
(``deduplipy/deduplicator/deduplicator.py:184``) — order-dependent and
unusable for resume. We derive ids from stable key columns instead:
``file_id = xxhash64(repo, path, commit)`` and ``content_sha =
sha2(content, 256)``, both Spark built-ins (JVM-side, codegen'd), so the
same input row gets the same id under any partitioning or parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def file_id_col(id_cols: tuple[str, ...] = ("repo", "path", "commit")) -> Column:
    """Deterministic 64-bit id from the natural key columns."""
    return F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in id_cols])


def content_sha_col(content_col: str = "content") -> Column:
    """Per-row invariant demanded by BASELINE.json: sha256 of content."""
    return F.sha2(F.coalesce(F.col(content_col), F.lit("")), 256)


def with_identity(
    df: DataFrame,
    id_cols: tuple[str, ...] = ("repo", "path", "commit"),
    content_col: str = "content",
) -> DataFrame:
    """Attach (file_id, content_sha, content_len); narrow, no shuffle."""
    return (
        df.withColumn("file_id", file_id_col(id_cols))
        .withColumn("content_sha", content_sha_col(content_col))
        .withColumn("content_len", F.length(F.coalesce(F.col(content_col), F.lit(""))))
    )
