"""Incremental dedup via Structured Streaming.

The reference is strictly batch (SURVEY §2.12); this is the ours-only
extension the north star notes as the natural increment: LSH band tables are
incrementalizable — new files only need (a) exact-sha lookup against the
seen-sha table and (b) a band-key join against the accumulated band table.

Two modes:
- ``stream_exact_dedup``: watermarked streaming dropDuplicates on
  content_sha — first occurrence wins, late re-arrivals of the same sha are
  dropped within the watermark horizon. Pure built-ins.
- ``incremental_near_dup``: foreachBatch — each micro-batch computes
  signatures/bands for the NEW files only and joins them against the
  persisted band table (base index), appending matches + updated bands.
  This is the Iceberg-MERGE pattern, expressed on parquet dirs here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deduplipy_spark.config import EngineConfig
from deduplipy_spark.ids import with_identity
from deduplipy_spark.operators.minhash import band_keys, with_signatures


def stream_exact_dedup(
    spark: SparkSession, input_dir: str, schema: str,
    event_time_col: str = "event_time", watermark: str = "1 hour",
    id_cols: tuple[str, ...] = ("repo", "path", "commit"),
    content_col: str = "content",
):
    """readStream(files) -> identity -> watermark -> dropDuplicates(sha).

    Returns an unstarted streaming DataFrame; caller picks sink/trigger.
    """
    stream = spark.readStream.schema(schema).parquet(input_dir)
    ident = with_identity(stream, id_cols, content_col)
    return ident.withWatermark(event_time_col, watermark).dropDuplicates(
        ["content_sha"]
    )


class IncrementalNearDup:
    """foreachBatch handler maintaining a band index + match log on disk."""

    def __init__(self, spark: SparkSession, cfg: EngineConfig, state_dir: str) -> None:
        self.spark = spark
        self.cfg = cfg
        self.bands_path = os.path.join(state_dir, "bands")
        self.matches_path = os.path.join(state_dir, "matches")
        os.makedirs(state_dir, exist_ok=True)

    def _existing_bands(self) -> DataFrame | None:
        if os.path.exists(os.path.join(self.bands_path, "_SUCCESS")):
            return self.spark.read.parquet(self.bands_path)
        return None

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        cfg = self.cfg
        ident = with_identity(batch_df, cfg.id_cols, cfg.content_col)
        sigs = with_signatures(ident, cfg)
        new_bands = band_keys(sigs, cfg).localCheckpoint()
        old = self._existing_bands()
        if old is not None:
            matches = (
                new_bands.alias("n")
                .join(old.alias("o"), "band_key")
                .where(F.col("n.id") != F.col("o.id"))
                .select(
                    F.col("n.id").alias("new_id"),
                    F.col("o.id").alias("existing_id"),
                    F.lit(batch_id).alias("batch_id"),
                )
                .dropDuplicates(["new_id", "existing_id"])
            )
            matches.write.mode("append").parquet(self.matches_path)
        new_bands.write.mode("append" if old is not None else "overwrite").parquet(
            self.bands_path
        )

    def start(self, input_dir: str, schema: str, checkpoint: str,
              trigger_available_now: bool = True):
        stream = self.spark.readStream.schema(schema).parquet(input_dir)
        writer = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
        )
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
