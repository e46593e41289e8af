"""Watermarked streaming exact-dedup (streaming/incremental.py)."""

import os
import tempfile

import pandas as pd


def test_stream_exact_dedup_drops_late_duplicates(spark):
    from deduplipy_spark.streaming.incremental import stream_exact_dedup

    tmp = tempfile.mkdtemp()
    in_dir = os.path.join(tmp, "in")
    os.makedirs(in_dir)
    schema = ("repo string, path string, commit string, lang string, "
              "content string, event_time timestamp")
    rows = pd.DataFrame(
        {
            "repo": ["r1", "r2", "r3"],
            "path": ["a", "b", "c"],
            "commit": ["c1", "c2", "c3"],
            "lang": ["py"] * 3,
            "content": ["same body", "same body", "unique body"],
            "event_time": pd.to_datetime(
                ["2026-01-01 10:00", "2026-01-01 10:05", "2026-01-01 10:10"]
            ),
        }
    )
    spark.createDataFrame(rows).write.mode("append").parquet(in_dir)

    dedup = stream_exact_dedup(spark, in_dir, schema)
    q = (
        dedup.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = spark.sql("select * from dedup_out").toPandas()
    # the second arrival of 'same body' is dropped within the watermark
    assert len(out) == 2
    assert set(out.content) == {"same body", "unique body"}
    # first occurrence wins
    assert out[out.content == "same body"].repo.iloc[0] == "r1"
