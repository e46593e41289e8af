"""Engine configuration.

The reference keeps its knobs as loose constants (``deduplipy/config.py:1-9``:
ROW_ID / DEDUPLICATION_ID names, 999 max active-learning queries, SoftImpute
convergence 0.01, cluster/score thresholds as method kwargs,
``deduplipy/deduplicator/deduplicator.py:167``). Ours is a frozen dataclass so
that a single config hash keys every checkpoint manifest — the "identical
shingle/signature config" knob that the recall target is defined against.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field

# Kernel/format version folded into config_hash (ADVICE r4 #3): bump when a
# code change alters STAGE OUTPUTS for unchanged config values, so stage
# manifests written by older kernels stop resuming as 'done' with stale data.
#   v2: minhash_seed actually mixed into the OPH kernel (round 4) — seeded
#       'oph' signatures differ from every pre-round-4 checkpoint.
KERNEL_VERSION = 2


@dataclass(frozen=True)
class EngineConfig:
    # --- identity / input ---
    id_cols: tuple[str, ...] = ("repo", "path", "commit")
    content_col: str = "content"

    # --- shingling / MinHash / LSH (replaces learned blocking rules) ---
    # 16 bands x 8 rows -> LSH threshold (1/16)^(1/8) ~= 0.71: tuned for
    # code near-dup (structural boilerplate gives unrelated code files a
    # background Jaccard of ~0.15, which a looser 32x4 scheme lets through
    # at quadratic pair volume — measured: 3.1M spurious vs 59k real pairs
    # on the 100k synthetic corpus)
    shingle_k: int = 7              # char-shingle width
    num_perm: int = 128             # MinHash permutations = bands * rows_per_band
    bands: int = 16
    rows_per_band: int = 8
    minhash_seed: int = 42
    # signature kernel: "oph" = one-permutation hashing + rotation
    # densification (O(shingles) — the scale kernel, operators/minhash.py);
    # "perm" = classic k independent permutations (O(shingles*num_perm))
    minhash_scheme: str = "oph"

    # --- SimHash (token-level path) ---
    simhash_bits: int = 64
    simhash_band_bits: int = 16     # 4 bands of 16 bits -> hamming<=3 guarantee

    # --- pair generation / skew ---
    band_cap: int = 200             # max rows in a band's all-pairs expansion
    hot_band_star: bool = True      # overflow members get star edges to the
                                    # band min id: linear output, CC
                                    # connectivity never silently severed
    shuffle_partitions: int = 32

    # --- scoring / clustering (mirrors deduplicator.py:167 defaults) ---
    score_threshold: float = 0.1
    cluster_threshold: float = 0.5
    fill_missing: bool = True
    max_hac_size: int = 2000        # components above this: one-cluster short circuit
    softimpute_convergence: float = 0.01   # reference deduplipy/config.py:4
    max_cc_rounds: int = 50
    # execution-only (excluded from config_hash): below this edge count the
    # CC step runs driver-side union-find instead of the distributed loop
    # (measured: the distributed loop's fixed multi-round cost was 51s for
    # a 6.4M-edge graph at local[16] that the driver path handles in ~8s).
    # None (default) derives the cutoff from the ACTUAL driver heap at run
    # time — edges <= heap/512, i.e. ~25M at this repo's 12g driver, ~134M
    # at a 64g production driver (operators/components.py
    # auto_driver_max_edges); set an int to pin it, 0 to disable the
    # driver path entirely.
    driver_cc_max_edges: int | None = None

    # --- checkpointing ---
    checkpoint_dir: str | None = None
    # debug-dump mode (reference blocking.py:132-133): without a
    # checkpoint_dir, write every stage table fresh to
    # ./deduplipy_intermediate_steps — inspection dumps, no resume skip
    save_intermediate_steps: bool = False

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band != self.num_perm:
            raise ValueError(
                f"bands*rows_per_band ({self.bands}*{self.rows_per_band}) must equal "
                f"num_perm ({self.num_perm})"
            )
        if self.minhash_scheme not in ("perm", "oph"):
            raise ValueError(f"unknown minhash_scheme {self.minhash_scheme!r}")
        if self.minhash_scheme == "oph" and self.num_perm & (self.num_perm - 1):
            import warnings

            # the OPH kernel bins by the top bits of the shingle hash, so a
            # non-power-of-two num_perm leaves the slots above the largest
            # power of two permanently empty — always densified duplicates
            # of lower bins, inflating false-positive band collisions
            warnings.warn(
                f"minhash_scheme='oph' with num_perm={self.num_perm} (not a "
                f"power of two): slots above {1 << (self.num_perm.bit_length() - 1)} "
                f"carry no independent information; use a power-of-two "
                f"num_perm or minhash_scheme='perm' for this band geometry",
                stacklevel=2,
            )

    def config_hash(self) -> str:
        """Stable hash over semantic fields (checkpoint manifests key on this)."""
        d = asdict(self)
        d.pop("checkpoint_dir", None)       # location doesn't change semantics
        d.pop("save_intermediate_steps", None)
        d.pop("shuffle_partitions", None)   # parallelism must not change results
        d.pop("driver_cc_max_edges", None)  # execution strategy, not semantics
        d["_kernel_version"] = KERNEL_VERSION
        blob = json.dumps(d, sort_keys=True, default=str).encode()
        return hashlib.sha256(blob).hexdigest()[:16]

    @property
    def lsh_threshold(self) -> float:
        """Approximate Jaccard threshold of the (bands, rows) LSH scheme: (1/b)^(1/r)."""
        return (1.0 / self.bands) ** (1.0 / self.rows_per_band)


DEFAULT_CONFIG = EngineConfig()
