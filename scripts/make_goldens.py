"""Regenerate pinned goldens for the driver queries that have no ANSI-SQL
oracle (UDF signatures / iterative CC / sha-seeded stubs):
neardup_clusters, simhash_pairs, minhash_sample_pairs, media_features.

The driver's CORRECTNESS gate compares each Spark query against a DuckDB
oracle SQL; these are not SQL-expressible, so their oracle is a PINNED
GOLDEN parquet under goldens/. The goldens are derived from the
SINGLE-NODE REPLICA (deduplipy_spark/replica.py: python-dict banding,
union-find, scalar kernels — no Spark dataflow), NOT from the Spark
queries themselves, so the gate is anchored outside the system under test.
Spark is used only to evaluate labeling functions the replica shares with
the engine by contract (xxhash64 row ids / sampler shuffle keys).

Run after any change that legitimately alters these outputs:

    python scripts/make_goldens.py
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.01"


def _docs_pdf() -> pd.DataFrame:
    return pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))


def _file_ids(spark, doc_ids) -> dict[int, int]:
    """doc_id -> engine file_id (xxhash64 label; labeling only)."""
    from pyspark.sql import functions as F

    pdf = (
        spark.createDataFrame(pd.DataFrame({"doc_id": list(doc_ids)}))
        .select(
            "doc_id",
            F.xxhash64(
                F.coalesce(F.col("doc_id").cast("string"), F.lit("\x00"))
            ).alias("file_id"),
        )
        .toPandas()
    )
    return dict(zip(pdf.doc_id, pdf.file_id))


def golden_neardup_clusters(spark) -> pd.DataFrame:
    from deduplipy_spark.replica import replica_clusters

    import __spark_entry__ as e

    docs = _docs_pdf()
    idmap = _file_ids(spark, docs.doc_id)
    local = pd.DataFrame({"row_idx": docs.doc_id, "content": docs.text})
    assign = replica_clusters(local, e.DOC_CFG, idmap)
    sha = {
        fid: hashlib.sha256((t or "").encode()).hexdigest()
        for fid, t in zip(docs.doc_id.map(idmap), docs.text)
    }
    out = pd.DataFrame(
        {
            "file_id": list(assign.keys()),
            "content_sha": [sha[f] for f in assign.keys()],
            "cluster_id": list(assign.values()),
        }
    ).sort_values("file_id", ignore_index=True)
    return out


def golden_simhash_pairs(spark) -> pd.DataFrame:
    from deduplipy_spark.config import EngineConfig
    from deduplipy_spark.replica import replica_simhash_pairs

    docs = _docs_pdf()
    contents = dict(zip(docs.doc_id, docs.text))
    return replica_simhash_pairs(contents, EngineConfig(), max_hamming=10)


def golden_minhash_sample_pairs(spark) -> pd.DataFrame:
    from pyspark.sql import functions as F

    from deduplipy_spark.replica import replica_minhash_sample

    import __spark_entry__ as e

    docs = _docs_pdf()
    idmap = _file_ids(spark, docs.doc_id)
    contents = {idmap[d]: t for d, t in zip(docs.doc_id, docs.text)}

    def hash64_batch(pairs, seed):
        if not pairs:
            return []
        pdf = pd.DataFrame(pairs, columns=["id_1", "id_2"])
        out = (
            spark.createDataFrame(pdf)
            .select(F.xxhash64("id_1", "id_2", F.lit(seed)).alias("h"))
            .toPandas()
        )
        return out.h.tolist()

    return replica_minhash_sample(contents, e.DOC_CFG, n_samples=100,
                                  min_sim=0.2, hash64_batch=hash64_batch)


def golden_media_features(spark) -> pd.DataFrame:
    """Independent re-derivation of the media stub-feature contract:
    payload = utf-8 text bytes, kind = doc_id % 3 cycle, sha via hashlib,
    feature via the documented sha-seeded Philox unit vector (re-implemented
    here on purpose — NOT imported from operators/multimodal.py)."""
    docs = _docs_pdf()
    kinds = ["image", "audio", "video"]
    rows = []
    for d, t in zip(docs.doc_id, docs.text):
        payload = (t or "").encode("utf-8")
        seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
        rng = np.random.Generator(np.random.Philox(seed))
        v = rng.standard_normal(32).astype(np.float32)
        v = v / np.linalg.norm(v)
        rows.append(
            (
                int(d),
                kinds[int(d) % 3],
                hashlib.sha256(payload).hexdigest(),
                32,
                round(float(np.sum(v.astype(np.float64))), 6),
            )
        )
    return pd.DataFrame(
        rows, columns=["file_id", "kind", "payload_sha", "feat_dim", "feat_sum"]
    )


GOLDENS = {
    "neardup_clusters": golden_neardup_clusters,
    "simhash_pairs": golden_simhash_pairs,
    "minhash_sample_pairs": golden_minhash_sample_pairs,
    "media_features": golden_media_features,
}


def main() -> None:
    from deduplipy_spark.session import get_spark

    spark = get_spark("goldens", cores=8, shuffle_partitions=8)
    outdir = os.path.join(REPO, "goldens")
    os.makedirs(outdir, exist_ok=True)
    for name, fn in GOLDENS.items():
        pdf = fn(spark)
        path = os.path.join(outdir, f"{name}_sf0.01.parquet")
        pdf.to_parquet(path, index=False)
        print(f"{name}: {len(pdf)} rows -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
