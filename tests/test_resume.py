"""F8: kill/resume — checkpointed run killed after `candidates` resumes to a
byte-identical `clusters` output; metrics table has one row per (stage,
partition); config change invalidates manifests."""

import json
import os
import tempfile

import pytest

from deduplipy_spark.config import EngineConfig
from deduplipy_spark.plans.pipeline import DedupPipeline
from deduplipy_spark.sources.datagen import gen_files
from deduplipy_spark.sources.io import MANIFEST, TableIO


def _clusters_pdf(out):
    return (
        out.select("file_id", "content_sha", "cluster_id")
        .orderBy("file_id")
        .toPandas()
    )


def test_kill_after_candidates_resume_identical(spark):
    tmp = tempfile.mkdtemp()
    cfg = EngineConfig(checkpoint_dir=tmp)
    files = gen_files(spark, 200, 20, partitions=4)

    first = _clusters_pdf(DedupPipeline(spark, cfg).run(files))

    # "kill after candidates": wipe manifests of every later stage
    for stage in ["scored_pairs", "components", "clusters_nd", "clusters"]:
        os.remove(os.path.join(tmp, stage, MANIFEST))
    # record mtimes of surviving stage data to prove they are NOT recomputed
    sig_manifest = os.path.join(tmp, "signatures", MANIFEST)
    mtime_before = os.path.getmtime(sig_manifest)

    second = _clusters_pdf(DedupPipeline(spark, cfg).run(files))
    assert first.equals(second)
    assert os.path.getmtime(sig_manifest) == mtime_before   # stage was skipped

    # metrics: one row per (stage, partition), row totals match manifests
    io = TableIO(spark, tmp, cfg.config_hash())
    m = io.read_metrics("signatures").toPandas()
    assert (m.groupby(["stage", "partition_id"]).size() == 1).all()
    man = json.load(open(sig_manifest))
    assert man["row_count"] == m.rows.sum()
    assert man["config_hash"] == cfg.config_hash()


def test_config_change_invalidates_checkpoints(spark):
    tmp = tempfile.mkdtemp()
    files = gen_files(spark, 100, 10, partitions=4)
    cfg1 = EngineConfig(checkpoint_dir=tmp)
    DedupPipeline(spark, cfg1).run(files).count()
    sig_manifest = os.path.join(tmp, "signatures", MANIFEST)
    mtime_before = os.path.getmtime(sig_manifest)

    cfg2 = EngineConfig(checkpoint_dir=tmp, shingle_k=9)   # semantic change
    assert cfg1.config_hash() != cfg2.config_hash()
    DedupPipeline(spark, cfg2).run(files).count()
    assert os.path.getmtime(sig_manifest) > mtime_before   # recomputed

    # parallelism-only change does NOT invalidate
    cfg3 = EngineConfig(checkpoint_dir=tmp, shingle_k=9, shuffle_partitions=8)
    assert cfg2.config_hash() == cfg3.config_hash()


def test_bucketed_bands_skip_pair_gen_shuffle(spark):
    """Explicit co-located layout: bands written bucketed+sorted by band_key
    feed the pair generator's window WITHOUT an Exchange (the persisted hash
    partitioning satisfies the window's distribution requirement)."""
    import tempfile

    from pyspark.sql import functions as F

    from deduplipy_spark.operators.pairs import candidate_pairs

    tmp = tempfile.mkdtemp()
    cfg = EngineConfig(band_cap=10)
    bands = spark.range(3000).select(
        F.col("id"), (F.col("id") % 500).alias("band_key")
    )
    io = TableIO(spark, tmp, cfg.config_hash())
    try:
        bucketed = io.write_bucketed("bands_bucketed", bands,
                                     bucket_cols=["band_key"],
                                     sort_cols=["band_key", "id"])
        pairs = candidate_pairs(bucketed, cfg)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        # plans print top-down: everything AFTER the Window line is its
        # input subtree — the bucketed scan must feed it with no Exchange
        assert "Window" in plan
        below_window = plan.split("Window", 1)[1]
        assert "Exchange" not in below_window, below_window
        # and the result is identical to the unbucketed path
        assert pairs.count() == candidate_pairs(bands, cfg).count()
    finally:
        spark.sql("drop table if exists dedup_bands_bucketed")


def test_save_intermediate_steps_dumps_every_stage(spark, tmp_path, monkeypatch):
    """save_intermediate_steps (reference blocking.py:132-133 debug dumps):
    stage tables land in ./deduplipy_intermediate_steps, fresh every run
    (no resume skip), without checkpoint_dir semantics."""
    import dataclasses
    import os

    monkeypatch.chdir(tmp_path)
    files = gen_files(spark, 100, 10, partitions=4)
    cfg = dataclasses.replace(EngineConfig(), save_intermediate_steps=True)
    out1 = DedupPipeline(spark, cfg).run(files)
    n1 = out1.count()
    dump = tmp_path / "deduplipy_intermediate_steps"
    stages = {p.name for p in dump.iterdir() if p.is_dir()}
    assert {"files_hashed", "signatures", "candidates", "scored_pairs",
            "components", "clusters"} <= stages
    # no-resume contract: a second run REWRITES (mtime advances)
    m = dump / "scored_pairs" / "_manifest.json"
    t1 = m.stat().st_mtime_ns
    DedupPipeline(spark, cfg).run(files).count()
    assert m.stat().st_mtime_ns > t1
    assert DedupPipeline(spark, cfg).run(files).count() == n1
