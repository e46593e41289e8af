"""Decompose scored_pairs cost; A/B alternative scoring join shapes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from deduplipy_spark.config import EngineConfig
from deduplipy_spark.ids import with_identity
from deduplipy_spark.operators.minhash import band_keys, estimated_jaccard_col, with_signatures
from deduplipy_spark.operators.pairs import candidate_pairs
from deduplipy_spark.session import get_spark

N = int(os.environ.get("BENCH_N", "50000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark("profile", cores=CPUS, shuffle_partitions=CPUS)

import bench

corpus = bench.ensure_corpus(spark, N)
bench.warm_python_workers(spark)

cfg = EngineConfig()
files = spark.read.parquet(corpus)
ident_full = with_identity(files, cfg.id_cols, cfg.content_col)
ident = ident_full.select("file_id", "content_sha").localCheckpoint()
rep_ids = ident.groupBy("content_sha").agg(F.min("file_id").alias("file_id"))
reps_full = ident_full.join(rep_ids.select("file_id"), "file_id", "semi")
sigs = with_signatures(reps_full, cfg).localCheckpoint()


def t(label, fn, n=3):
    best = 1e9
    for _ in range(n):
        t0 = time.monotonic()
        out = fn()
        best = min(best, time.monotonic() - t0)
    print(f"{label:28s} {best:.3f}s")
    return out


bands = t("bands+candidates", lambda: candidate_pairs(band_keys(sigs, cfg), cfg).localCheckpoint())
cands = bands

est = estimated_jaccard_col()


def score(j1="", j2=""):
    s1 = sigs.select(F.col("file_id").alias("id_1"), F.col("sig").alias("sig_1"))
    s2 = sigs.select(F.col("file_id").alias("id_2"), F.col("sig").alias("sig_2"))
    if j1:
        s1, s2 = s1.hint(j1), s2.hint(j2 or j1)
    return (
        cands.join(s1, "id_1").join(s2, "id_2")
        .withColumn("score", est)
        .select("id_1", "id_2", "score")
        .where(F.col("score") >= cfg.score_threshold)
    )


t("score default", lambda: score().count())
t("score shuffle_hash", lambda: score("shuffle_hash").count())
t("score broadcast sigs", lambda: score("broadcast").count())

# melt shape: explode pair -> single join -> re-group
def score_melt():
    p = cands.withColumn("pid", F.monotonically_increasing_id())
    m = p.select("pid", F.explode(F.array("id_1", "id_2")).alias("file_id"))
    j = m.join(sigs.hint("shuffle_hash"), "file_id")
    g = j.groupBy("pid").agg(
        F.min("file_id").alias("id_1"), F.max("file_id").alias("id_2"),
        F.min_by("sig", "file_id").alias("sig_1"),
        F.max_by("sig", "file_id").alias("sig_2"),
    )
    return g.withColumn("score", est).select("id_1", "id_2", "score").where(
        F.col("score") >= cfg.score_threshold)


t("score melt", lambda: score_melt().count())
print("n_cands:", cands.count())
d = score()
d.explain("formatted")
spark.stop()
