"""SimHash — token-level near-dup path (north rule's second signature).

64-bit SimHash (Charikar'02; Manku et al. WWW'07 for the banding trick):
tokens are hashed, each hash votes ±1 per bit position weighted by count,
fingerprint = sign vector. Hamming distance ≤ d ⟺ near-duplicate at token
level — complements char-shingle MinHash (which is edit-local, not
reorder-tolerant; SimHash survives token reordering better).

Banding: 64 bits split into 4×16-bit bands → any pair within hamming
distance 3 shares at least one exact band (pigeonhole) → equality join on
band keys, the same capped pair generator as MinHash/rules.

Vectorized: one pandas UDF; per batch, token hashing via the same mix64
pipeline as shingles; bit voting via unpackbits matrix ops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from deduplipy_spark.config import EngineConfig
from deduplipy_spark.operators.minhash import _mix64


def _token_hashes(text: str) -> np.ndarray:
    """64-bit hashes of whitespace tokens (with multiplicity)."""
    tokens = text.split()
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    # polynomial byte hash per token, vectorized over the concatenated buffer
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):          # tokens are short; loop is cheap
        b = np.frombuffer(t.encode("utf-8", "surrogatepass"), dtype=np.uint8)
        h = np.uint64(1469598103934665603)
        with np.errstate(over="ignore"):    # FNV-1a wraps mod 2^64 by design
            for byte in b.astype(np.uint64):
                h = (h ^ byte) * np.uint64(1099511628211)
        out[i] = h
    return _mix64(out)


def simhash_of_hashes(hashes: np.ndarray) -> int:
    """64-bit SimHash as a SIGNED int (Spark `long` reinterpretation)."""
    if hashes.shape[0] == 0:
        return 0
    bits = np.unpackbits(hashes.view(np.uint8).reshape(-1, 8), axis=1,
                         bitorder="little")          # (T, 64)
    # signed tally: uint arithmetic would wrap negatives to huge positives
    votes = bits.sum(axis=0).astype(np.int64) * 2 - hashes.shape[0]
    fp = 0
    for i in np.nonzero(votes > 0)[0]:
        fp |= 1 << int(i)
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def make_simhash_udf():
    # deferred: pandas_udf type parsing needs an active SparkSession
    @pandas_udf("long")
    def simhash_udf(content: pd.Series) -> pd.Series:
        return content.map(
            lambda s: simhash_of_hashes(_token_hashes(s if isinstance(s, str) else ""))
        )

    return simhash_udf


def with_simhash(df: DataFrame, content_col: str = "content") -> DataFrame:
    return df.withColumn("simhash", make_simhash_udf()(F.col(content_col)))


def simhash_bands(df: DataFrame, cfg: EngineConfig, id_col: str = "file_id") -> DataFrame:
    """(id, band_key): 4 bands of 16 bits via shiftright/mask — JVM-side."""
    n_bands = cfg.simhash_bits // cfg.simhash_band_bits
    mask = (1 << cfg.simhash_band_bits) - 1
    bands = [
        F.xxhash64(
            F.shiftright(F.col("simhash"), j * cfg.simhash_band_bits).bitwiseAND(mask),
            F.lit(1_000_000 + j),
        )
        for j in range(n_bands)
    ]
    return df.select(F.col(id_col).alias("id"), F.explode(F.array(*bands)).alias("band_key"))


def hamming_col(a: str = "simhash_1", b: str = "simhash_2"):
    return F.bit_count(F.col(a).bitwiseXOR(F.col(b)))


def simhash_pairs(df: DataFrame, cfg: EngineConfig, max_hamming: int = 3,
                  id_col: str = "file_id") -> DataFrame:
    """(id_1, id_2, hamming) pairs within max_hamming (guaranteed complete for
    max_hamming <= bands-1 by pigeonhole over 4x16 bands)."""
    from deduplipy_spark.operators.pairs import candidate_pairs

    hashed = df.select(F.col(id_col).alias("id"), "simhash").localCheckpoint()
    bands = simhash_bands(hashed.withColumnRenamed("id", id_col), cfg, id_col)
    pairs = candidate_pairs(bands, cfg)
    h1 = hashed.select(F.col("id").alias("id_1"), F.col("simhash").alias("simhash_1"))
    h2 = hashed.select(F.col("id").alias("id_2"), F.col("simhash").alias("simhash_2"))
    return (
        pairs.join(h1, "id_1").join(h2, "id_2")
        .withColumn("hamming", hamming_col())
        .where(F.col("hamming") <= max_hamming)
        .select("id_1", "id_2", "hamming")
    )
