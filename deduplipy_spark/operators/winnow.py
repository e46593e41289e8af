"""Winnowing document fingerprints (MOSS — Schleimer, Wilkerson, Aiken,
SIGMOD'03: "Winnowing: Local Algorithms for Document Fingerprinting").

The guarantee: any shared substring of length >= w + k - 1 between two
documents yields at least one SHARED selected fingerprint — the classic
plagiarism/code-clone detection primitive, complementing MinHash (global
similarity) with positional substring evidence.

Algorithm: hash every k-gram; over each window of `w` consecutive k-gram
hashes keep the MINIMUM; the document's fingerprint set is the distinct
selected hashes. Density ~= 2/(w+1) of all k-grams.

Execution shape: explode one (id, pos, gram_hash) row per k-gram, then a
SQL window ``min(h) OVER (PARTITION BY id ORDER BY pos ROWS CURRENT..w-1
FOLLOWING)`` and a distinct — each gram is hashed exactly ONCE. (A tempting
all-Column formulation — per-row gram array + nested ``transform`` taking
``array_min(slice(...))`` per window — recomputes the whole sha2 array per
window element because lambda bodies get no common-subexpression
elimination: measured O(n^2) hashing, minutes on a 5k-char doc.) The window
shuffle is keyed by doc id: no skew (one partition row-group per doc), and
the downstream match is the same (id, band_key)-shaped join every other
blocker uses (operators/pairs.candidate_pairs).

The hash is ``sha2(gram, 256)`` compared lexicographically — chosen because
the DuckDB oracle reproduces it exactly (``sha256()``); swap to
``xxhash64`` at 100 TB (8-byte keys instead of 64-char strings; same
selection structure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def winnow_fingerprints(df: DataFrame, k: int = 8, w: int = 4,
                        id_col: str = "file_id",
                        text_col: str = "content") -> DataFrame:
    """(id, fp) long table — one row per distinct selected fingerprint.

    Documents with fewer than w k-grams contribute one window spanning all
    their grams (so every non-empty doc with >= k chars fingerprints).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    ng = F.length(t) - k + 1
    grams = df.select(
        F.col(id_col).alias("id"),
        t.alias("_t"),
        ng.alias("ng"),
        F.explode(
            F.when(ng >= 1, F.sequence(F.lit(1), ng)).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("pos"),
    ).select(
        "id", "ng", "pos",
        F.sha2(F.substring(F.col("_t"), F.col("pos"), k), 256).alias("h"),
    )
    win = Window.partitionBy("id").orderBy("pos").rowsBetween(0, w - 1)
    selected = (
        grams.withColumn("fp", F.min("h").over(win))
        # full windows only — except short docs (ng < w), where the single
        # pos=1 window spans all available grams
        .where(F.col("pos") <= F.greatest(F.col("ng") - w + 1,
                                          F.least(F.col("ng"), F.lit(1))))
    )
    return selected.select("id", "fp").distinct()


def winnow_candidate_pairs(df: DataFrame, cfg, k: int = 8, w: int = 4,
                           id_col: str = "file_id",
                           text_col: str = "content") -> DataFrame:
    """Shared-fingerprint candidate pairs through the capped pair generator
    (any shared substring >= w+k-1 chars guarantees a candidate)."""
    from deduplipy_spark.operators.pairs import candidate_pairs

    bands = winnow_fingerprints(df, k, w, id_col, text_col).select(
        "id", F.xxhash64("fp", F.lit("winnow")).alias("band_key")
    )
    return candidate_pairs(bands, cfg)
