"""Per-stage isolation bench (guide §1.4): times each pipeline stage with a
noop sink so computation is measured, not the sink. NOT the driver contract —
bench.py stays the frozen measurement harness; this file exists so
OPTIMIZATION_r06.md can cite stage-level numbers.

Method: successive-prefix timing. For each prefix of the pipeline dataflow,
clear every cache and materialize the prefix with a noop write; the marginal
cost of stage k is t(prefix_k) - t(prefix_{k-1}). Each prefix is timed
best-of-N (default 2) to shave scheduler noise.

Usage: python bench_extra.py [sf|corpus|all] [--samples N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from deduplipy_spark.config import EngineConfig
from deduplipy_spark.plans.pipeline import DedupPipeline
from deduplipy_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_N = int(os.environ.get("BENCH_N", "50000"))
DATA_DIR = os.environ.get("BENCH_DATA_DIR", "/tmp/spark_graft_bench")
SAMPLES = int(os.environ.get("BENCH_EXTRA_SAMPLES", "2"))


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name: str, fn, samples: int = SAMPLES) -> float:
    best = float("inf")
    for _ in range(samples):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(name)
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    spark.sparkContext.setJobDescription(None)
    return round(best, 3)


def profile_pipeline(spark, files, cfg, label: str) -> dict[str, float]:
    """Successive-prefix stage profile of DedupPipeline's dataflow."""
    from deduplipy_spark.ids import with_identity
    from deduplipy_spark.operators.minhash import band_keys, with_signatures
    from deduplipy_spark.operators.pairs import candidate_pairs
    from deduplipy_spark.operators.scoring import score_pairs

    res: dict[str, float] = {}

    def build(upto: str):
        """Re-derive the pipeline dataflow (no persist) up to a stage."""
        f = files
        min_parts = spark.sparkContext.defaultParallelism * 2
        if f.rdd.getNumPartitions() < min_parts:
            f = f.repartition(min_parts)
        ident_full = with_identity(f, cfg.id_cols, cfg.content_col)
        ident = ident_full.select("file_id", "content_sha", "content_len",
                                  *cfg.id_cols)
        if upto == "ident":
            return ident
        rep_ids = ident.groupBy("content_sha").agg(
            F.min("file_id").alias("file_id"))
        if upto == "rep_ids":
            return rep_ids
        reps_full = ident_full.join(rep_ids.select("file_id"), "file_id", "semi")
        if upto == "reps_full":
            return reps_full.select("file_id", "content_len")
        sigs = with_signatures(reps_full, cfg)
        if upto == "sigs":
            return sigs
        bands = band_keys(sigs, cfg)
        if upto == "bands":
            return bands
        cands = candidate_pairs(bands, cfg, assume_distinct=True)
        if upto == "cands":
            return cands
        scored = score_pairs(cands, sigs, cfg)
        if upto == "scored":
            return scored
        raise ValueError(upto)

    prev = 0.0
    for stage in ["ident", "rep_ids", "reps_full", "sigs", "bands", "cands",
                  "scored"]:
        t = timed(spark, f"{label}:{stage}", lambda s=stage: noop(build(s)))
        res[stage] = round(t - prev, 3)
        res[f"_cum_{stage}"] = t
        prev = t

    def full():
        pipe = DedupPipeline(spark, cfg)
        pipe.run(files).count()
        pipe.close()

    t = timed(spark, f"{label}:full", full)
    res["cc+hac+assign (full-scored)"] = round(t - prev, 3)
    res["_cum_full"] = t
    return res


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("bench_extra", cores=CPUS)
    import bench

    corpus_path = bench.ensure_corpus(spark, BENCH_N)
    bench.warm_python_workers(spark)
    bench.warm_engine(spark)

    out: dict = {}
    if which in ("sf", "all"):
        docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        from __spark_entry__ import DOC_CFG

        out["q_neardup_sf"] = profile_pipeline(spark, docs, DOC_CFG, "sf")
    if which in ("corpus", "all"):
        files = spark.read.parquet(corpus_path)
        out["q_neardup_corpus"] = profile_pipeline(
            spark, files, EngineConfig(), "corpus")
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
