"""Replica-vs-Spark parity: the single-node replica (deduplipy_spark/
replica.py) that anchors the pinned goldens must reproduce the distributed
operators exactly on fresh synthetic data (not just on the pinned sf0.01
snapshot)."""
import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from deduplipy_spark.config import EngineConfig
from deduplipy_spark.replica import replica_minhash_sample, replica_simhash_pairs
from deduplipy_spark.sources.datagen import gen_files


def test_replica_simhash_pairs_matches_spark(spark):
    from deduplipy_spark.operators.simhash import simhash_pairs, with_simhash

    files = gen_files(spark, 150, 15, partitions=4)
    docs = files.select(
        F.xxhash64("repo", "path", "commit").alias("file_id"),
        F.col("content"),
    )
    got = (
        simhash_pairs(with_simhash(docs), EngineConfig(), max_hamming=10)
        .toPandas().sort_values(["id_1", "id_2"], ignore_index=True)
    )
    contents = dict(
        docs.select("file_id", "content").toPandas().itertuples(index=False)
    )
    want = replica_simhash_pairs(contents, EngineConfig(), max_hamming=10)
    pd.testing.assert_frame_equal(
        got.astype({"hamming": "int64"}), want.astype({"hamming": "int64"})
    )


def test_replica_minhash_sample_matches_spark(spark):
    from deduplipy_spark.ids import file_id_col
    from deduplipy_spark.operators.sampling import minhash_sample

    files = gen_files(spark, 150, 15, partitions=4)
    got = (
        minhash_sample(files, EngineConfig(), n_samples=40, min_sim=0.2)
        .toPandas().sort_values(["id_1", "id_2"], ignore_index=True)
    )
    ident = files.select(file_id_col().alias("file_id"), "content").toPandas()
    contents = dict(zip(ident.file_id, ident.content))

    def hash64_batch(pairs, seed):
        if not pairs:
            return []
        pdf = pd.DataFrame(pairs, columns=["id_1", "id_2"])
        return (
            spark.createDataFrame(pdf)
            .select(F.xxhash64("id_1", "id_2", F.lit(seed)).alias("h"))
            .toPandas().h.tolist()
        )

    want = replica_minhash_sample(contents, EngineConfig(), n_samples=40,
                                  min_sim=0.2, hash64_batch=hash64_batch)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
