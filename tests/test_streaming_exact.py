"""Watermarked streaming exact-dedup (streaming/incremental.py)."""

import os
import tempfile

import pandas as pd


def _write(spark, in_dir, repos, paths, contents, times):
    rows = pd.DataFrame(
        {
            "repo": repos,
            "path": paths,
            "commit": [f"c-{p}" for p in paths],
            "lang": ["py"] * len(repos),
            "content": contents,
            "event_time": pd.to_datetime(times),
        }
    )
    spark.createDataFrame(rows).write.mode("append").parquet(in_dir)


def test_stream_exact_dedup_drops_late_duplicates(spark):
    """First occurrence wins is a CROSS-batch guarantee (state store); within
    one micro-batch dropDuplicates keeps an arbitrary member, so the test
    feeds the duplicate in a later batch."""
    from deduplipy_spark.streaming.incremental import stream_exact_dedup

    tmp = tempfile.mkdtemp()
    in_dir = os.path.join(tmp, "in")
    out_dir = os.path.join(tmp, "out")
    ckpt = os.path.join(tmp, "ckpt")
    os.makedirs(in_dir)
    schema = ("repo string, path string, commit string, lang string, "
              "content string, event_time timestamp")

    def run_once():
        q = (
            stream_exact_dedup(spark, in_dir, schema)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        return spark.read.parquet(out_dir).toPandas()

    _write(spark, in_dir, ["r1", "r3"], ["a", "c"],
           ["same body", "unique body"],
           ["2026-01-01 10:00", "2026-01-01 10:10"])
    out1 = run_once()
    assert len(out1) == 2
    assert set(out1.content) == {"same body", "unique body"}

    # late re-arrival of 'same body' (within the 1h watermark): dropped, and
    # the batch-1 winner r1 stays the sole owner of that sha
    _write(spark, in_dir, ["r2"], ["b"], ["same body"], ["2026-01-01 10:05"])
    out2 = run_once()
    assert len(out2) == 2
    assert out2[out2.content == "same body"].repo.iloc[0] == "r1"
