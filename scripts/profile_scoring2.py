"""Reproduce the exact pipeline scored_pairs plan and time sub-pieces."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from deduplipy_spark.config import EngineConfig
from deduplipy_spark.ids import with_identity
from deduplipy_spark.operators.minhash import band_keys, with_signatures
from deduplipy_spark.operators.pairs import candidate_pairs
from deduplipy_spark.operators.scoring import score_pairs
from deduplipy_spark.session import get_spark

N = int(os.environ.get("BENCH_N", "50000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark("profile", cores=CPUS, shuffle_partitions=CPUS)

import bench

corpus = bench.ensure_corpus(spark, N)
bench.warm_python_workers(spark)

cfg = EngineConfig()
files = spark.read.parquet(corpus)
min_parts = spark.sparkContext.defaultParallelism * 2
print("scan partitions:", files.rdd.getNumPartitions(), "min:", min_parts)
if files.rdd.getNumPartitions() < min_parts:
    files = files.repartition(min_parts)
ident_full = with_identity(files, cfg.id_cols, cfg.content_col)


def t(label, fn, n=2):
    best = 1e9
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    print(f"{label:34s} {best:.3f}s")


ident = ident_full.select("file_id", "content_sha", "content_len",
                          *cfg.id_cols, "lang").localCheckpoint()
rep_ids = ident.groupBy("content_sha").agg(
    F.min("file_id").alias("file_id")).localCheckpoint()
reps_full = ident_full.join(rep_ids.select("file_id"), "file_id", "semi")
t("sigs materialize (pipeline shape)",
  lambda: with_signatures(reps_full, cfg).localCheckpoint(), n=1)
sigs = with_signatures(reps_full, cfg).localCheckpoint()

bands = band_keys(sigs, cfg)
cands = candidate_pairs(bands, cfg)
t("cands.count (lazy pipeline plan)", lambda: cands.count())
t("scored lazy-cands .count",
  lambda: score_pairs(cands, sigs, cfg).count())
t("scored lazy-cands localCheckpoint",
  lambda: score_pairs(cands, sigs, cfg).localCheckpoint(), n=2)
score_pairs(cands, sigs, cfg).explain("formatted")
spark.stop()
