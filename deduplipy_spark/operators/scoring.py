"""Pair scoring: signature-estimated Jaccard + exact-match override.

Replaces the reference's learned string-metric scorer
(``deduplipy/deduplicator/deduplicator.py:112-122,192-197``): the north rule
substitutes MinHash-estimated Jaccard for the classifier probability. The
exact-equality override (all fields equal ⇒ score 1.0, ``deduplicator.py:
195-197``) is kept as a sha256 comparison.

Scale notes: candidates carry only ids; signatures join back via two equi
joins on id (sort-merge / shuffled-hash; AQE may broadcast the smaller side).
Score math is a pure Column expression (zip_with) — no Python on the pair
hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deduplipy_spark.config import EngineConfig
from deduplipy_spark.operators.minhash import estimated_jaccard_col


def score_pairs(candidates: DataFrame, signatures: DataFrame, cfg: EngineConfig,
                sha_override: bool = False) -> DataFrame:
    """(id_1, id_2, score) for pairs passing score_threshold.

    `signatures` must have (file_id, sig) — plus `content_sha` when
    `sha_override` is on. The flagship pipeline leaves sha_override off:
    its candidates pair per-sha REPRESENTATIVES, so two sides can never
    share a sha and the override would be dead weight (two 64-char columns
    through both signature shuffles). The reference's exact-equality
    override (deduplicator.py:195-197) survives at the facade level: the
    exact class collapses in the sha pre-pass (pipeline) or via column
    equality (learned path).
    """
    sha1 = [F.col("content_sha").alias("sha_1")] if sha_override else []
    sha2 = [F.col("content_sha").alias("sha_2")] if sha_override else []
    s1 = signatures.select(
        F.col("file_id").alias("id_1"), *sha1, F.col("sig").alias("sig_1")
    )
    s2 = signatures.select(
        F.col("file_id").alias("id_2"), *sha2, F.col("sig").alias("sig_2")
    )
    est = estimated_jaccard_col()
    score = (
        F.when(F.col("sha_1") == F.col("sha_2"), F.lit(1.0)).otherwise(est)
        if sha_override else est
    )
    scored = (
        candidates.join(s1, "id_1")
        .join(s2, "id_2")
        .withColumn("score", score)
        .select("id_1", "id_2", "score")
    )
    return scored.where(F.col("score") >= F.lit(cfg.score_threshold))


def score_histogram(scored: DataFrame, bin_width: float = 0.05) -> DataFrame:
    """Score diagnostics histogram (active_learning.py:97-109: np.histogram
    with bins 0..1 step 0.05) as a groupBy — (bin_low, n) rows."""
    nbins = int(round(1.0 / bin_width))
    b = F.least(F.floor(F.col("score") / bin_width), F.lit(nbins - 1))
    return (
        scored.groupBy(F.round(b * bin_width, 6).cast("double").alias("bin_low"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bin_low")
    )
