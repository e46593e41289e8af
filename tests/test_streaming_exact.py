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


def test_stateful_exact_dedup_applyinpandaswithstate(spark):
    """Custom stateful operator (streaming/stateful.py): first-seen-wins is
    deterministic WITHIN a batch (earliest event_time, id tiebreak), and the
    per-sha state carries a duplicate counter across batches."""
    import pyspark.sql.functions as F

    from deduplipy_spark.ids import with_identity
    from deduplipy_spark.streaming.stateful import stateful_exact_dedup

    tmp = tempfile.mkdtemp()
    in_dir = os.path.join(tmp, "in")
    out_dir = os.path.join(tmp, "out")
    ckpt = os.path.join(tmp, "ckpt")
    os.makedirs(in_dir)
    schema = ("repo string, path string, commit string, lang string, "
              "content string, event_time timestamp")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(in_dir)
        ident = with_identity(stream).select(
            "content_sha", "file_id", "event_time", "repo", "path"
        )
        q = (
            stateful_exact_dedup(ident)
            .writeStream.format("parquet").option("path", out_dir)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out_dir).toPandas()

    # batch 1: three copies of one sha IN THE SAME BATCH, later-timestamped
    # row listed first to prove within-batch ordering; plus one unique
    _write(spark, in_dir,
           ["r-late", "r-early", "r-mid", "r-uniq"],
           ["a", "b", "c", "d"],
           ["same body", "same body", "same body", "unique body"],
           ["2026-01-01 11:00", "2026-01-01 09:00",
            "2026-01-01 10:00", "2026-01-01 10:30"])
    out1 = run_once()
    assert len(out1) == 2
    same = out1[out1.content_sha != out1[out1.repo == "r-uniq"].content_sha.iloc[0]]
    assert same.repo.iloc[0] == "r-early"       # earliest event won
    assert same.dups.iloc[0] == 2               # two duplicates shed

    # batch 2: another copy arrives -> suppressed (state), no new output row
    _write(spark, in_dir, ["r2"], ["e"], ["same body"], ["2026-01-02 09:00"])
    out2 = run_once()
    assert len(out2) == 2                       # unchanged output


class _FakeState:
    """Minimal GroupState stand-in to drive the timeout path (Spark invokes
    the function with an empty batch iterator and hasTimedOut=True)."""

    def __init__(self, timed_out=False, value=None):
        self.hasTimedOut = timed_out
        self._value = value
        self.removed = False
        self.updated = None

    @property
    def exists(self):
        return self._value is not None and not self.removed

    @property
    def get(self):
        return self._value

    def update(self, v):
        self.updated = v

    def remove(self):
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


def test_stateful_timeout_evicts_state_and_emits_nothing():
    """TTL expiry: empty batch iterator + hasTimedOut -> state removed,
    empty output, NO crash (pd.concat on zero frames would raise)."""
    from deduplipy_spark.streaming.stateful import _dedup_one_sha

    state = _FakeState(timed_out=True, value=(1, pd.Timestamp("2026-01-01"), 3))
    out = list(_dedup_one_sha(("sha",), iter([]), state))
    assert state.removed is True
    assert state.updated is None            # no refresh on the way out
    assert sum(len(df) for df in out) == 0
    # yielded frame carries the full output schema (Spark requires columns)
    assert list(out[0].columns) == [
        "content_sha", "file_id", "event_time", "repo", "path", "dups"]


def test_stateful_normal_path_still_updates_state():
    from deduplipy_spark.streaming.stateful import _dedup_one_sha

    batch = pd.DataFrame({
        "content_sha": ["s"], "file_id": [7],
        "event_time": [pd.Timestamp("2026-01-01")],
        "repo": ["r"], "path": ["p"],
    })
    state = _FakeState()
    out = pd.concat(list(_dedup_one_sha(("s",), iter([batch]), state)))
    assert len(out) == 1 and out.file_id.iloc[0] == 7
    assert state.updated == (7, pd.Timestamp("2026-01-01"), 0)
    assert state.timeout_ms == 24 * 3600 * 1000
