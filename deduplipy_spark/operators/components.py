"""Distributed connected components over the scored-pair edge table.

Replaces ``nx.connected_components`` (``deduplipy/clustering/clustering.py:36``)
— a driver-memory graph — with an iterative DataFrame algorithm:
min-label propagation with pointer-jumping (path compression), the
DataFrame-only variant of Kiveris et al., "Connected Components in MapReduce
and Beyond" (SoCC'14). Converges in O(log d) rounds.

Scale notes:
- Each round is two shuffles (neighbor-min groupBy + label-lookup join),
  all on the node-id key — no quadratic terms.
- ``localCheckpoint()`` per round truncates lineage (SURVEY §4.3); without
  it the plan doubles every iteration.
- Convergence = zero changed labels; `max_cc_rounds` is an assert-style
  backstop, not a silent truncation.

The component id is ``min(file_id)`` over the component — deterministic
under any partitioning, so downstream cluster ids are stable for resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _mem_bytes(s: str) -> int:
    """'12g' / '512m' / '1024k' / plain bytes -> bytes (JVM memory string)."""
    s = s.strip().lower()
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    if s and s[-1] in units:
        return int(float(s[:-1]) * units[s[-1]])
    return int(s)


def auto_driver_max_edges(spark: SparkSession) -> int:
    """Driver-CC cutoff derived from the actual driver heap instead of a
    fixed constant (VERDICT r3 #7): the collected edge frame costs ~16B/edge
    in numpy plus Arrow/pandas copies (~4x transient), and the driver must
    keep breathing room for Spark's own bookkeeping — budget 1/8 of the
    heap for the 64B/edge working set, i.e. edges <= heap_bytes / 512.
    12g (this repo's default) -> ~25M edges; a 64g production driver ->
    ~134M; never below 1M (the distributed loop's fixed multi-round cost
    always loses at that size)."""
    mem = spark.conf.get("spark.driver.memory", "4g")
    try:
        b = _mem_bytes(mem)
    except ValueError:
        b = 4 << 30
    return max(1_000_000, b // 512)


def connected_components(edges: DataFrame, max_rounds: int = 50,
                         driver_max_edges: int | None = None,
                         with_sizes: bool = False,
                         edge_count: int | None = None,
                         frontier: bool = True,
                         stats_out: dict | None = None) -> DataFrame:
    """edges(id_1, id_2) -> (id, component) for every node appearing in edges.

    component = min node id reachable (the canonical representative).
    ``with_sizes=True`` appends a ``_csize`` column (component node count) —
    free on the driver path (one bincount), one extra window shuffle on the
    distributed path. Downstream HAC gates its oversized-component split on
    ``_csize`` without re-deriving sizes in a separate groupBy+join job.

    Scale-adaptive (same spirit as AQE's runtime broadcast switch): below
    `driver_max_edges` the edge list fits trivially on the driver (2M edges
    = 32 MB) and a union-find there beats O(log d) Spark rounds of fixed
    job overhead; above it, the distributed min-label loop runs. Both paths
    produce identical output (component = min reachable id).

    ``edge_count``: known row count of `edges` (e.g. from a checkpoint
    manifest) — skips the size-gate count job entirely.

    ``driver_max_edges=None`` derives the cutoff from the driver heap
    (`auto_driver_max_edges`); 0/False disables the driver path outright.

    ``stats_out``: optional dict populated with facts this call learns for
    free: ``n_edges`` (whenever the size gate counts, or edge_count is
    passed) and ``max_component_size`` (driver path only — one extra
    bincount next to the union-find). Downstream HAC uses them to skip
    its big-component existence probe and to size its grouped-map
    partition count; the distributed path leaves max_component_size unset
    (a global max there would be its own job, costing exactly what the
    skip saves).

    ``frontier=True`` (default) runs the distributed loop in frontier form
    (VERDICT r4 #7, the large-star optimization): only nodes whose label
    CHANGED last round send neighbor/pointer offers, so once most labels
    freeze the per-round joins see a small build side that AQE's runtime
    broadcast switch turns into narrow map-side joins — no full-graph
    shuffle after the early rounds. ``frontier=False`` keeps the classic
    all-nodes round (identical output). Measured trade (scripts/bench_cc.py,
    BENCH/NOTES.md): frontier wins 1.33x on clique-shaped dedup graphs
    (diameter <= 2-3, the shape band blocking produces); on high-diameter
    graphs every label changes every round and the frontier never shrinks
    — since r6 the loop detects that regime from the (already-counted)
    per-round change fraction and HANDS OFF to classic rounds mid-run
    (``_FRONTIER_SWITCH``), so the default stays near the better variant
    on both shapes; ``frontier=False`` still forces classic throughout.
    """
    if driver_max_edges is None:
        driver_max_edges = auto_driver_max_edges(edges.sparkSession)
    if driver_max_edges:
        # size gate as a parallel count, NOT limit(N+1).toPandas(): a global
        # limit executes as CollectLimit — the driver pulls partitions in
        # serial rounds, so the probe got SLOWER with more cores (measured
        # 0.6s at local[4] -> 2.9s at local[16] on a 400k-edge graph). Two
        # fully-parallel jobs (count, then Arrow collect) beat one
        # semi-serial one; when the pipeline checkpoints edges LAZILY, this
        # count is also the job that materializes the cache, and a manifest
        # row_count skips it altogether (edge_count).
        n_edges = edge_count if edge_count is not None else edges.count()
        if stats_out is not None:
            stats_out["n_edges"] = n_edges
        if n_edges <= driver_max_edges:
            probe = edges.select("id_1", "id_2").toPandas()
            return _driver_union_find_pdf(probe, edges.sparkSession, with_sizes,
                                          stats_out)
    bidir = (
        edges.select(F.col("id_1").alias("src"), F.col("id_2").alias("dst"))
        .union(edges.select(F.col("id_2").alias("src"), F.col("id_1").alias("dst")))
        .distinct()
        .localCheckpoint()   # edges are re-scanned every round: cut upstream DAG once
    )
    labels = (
        bidir.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    rounds = _frontier_rounds if frontier else _classic_rounds
    base_ckpts = [_checkpoint_rdd(bidir), _checkpoint_rdd(labels)]
    try:
        labels = rounds(bidir, labels, max_rounds)
    finally:
        # converged labels are checkpoint-backed (and on the error path the
        # caller gets none) -> edge/init blocks are free-able; without the
        # finally, a non-convergence or mid-round failure strands two
        # full-graph-sized block sets in the long-lived session
        for c in base_ckpts:
            _free_rdd(c)
    out = labels.select("id", F.col("comp").alias("component"))
    if with_sizes:
        from pyspark.sql import Window

        out = out.withColumn(
            "_csize", F.count(F.lit(1)).over(Window.partitionBy("component"))
        )
    return out


# frontier fraction above which the adaptive distributed loop hands off to
# classic all-nodes rounds (see _frontier_rounds): >90% of nodes still
# changing after the grace rounds means the frontier machinery is pure
# overhead on top of a full-graph round
_FRONTIER_SWITCH = 0.9

_PRIVATE_API_WARNED: set = set()


def _warn_private_api_fallback(which: str) -> None:
    """One-time (per process per site) warning when a private-Spark-API
    helper degrades to its fallback (ADVICE r5 #2): the fallbacks are
    correct but silently re-introduce the per-round cache leak
    (_checkpoint_rdd) or the size^(2^round) plan-stats explosion (_rebase)
    on deep iterative loops — a Spark upgrade that changes these internals
    should be LOUD, not a mystery slowdown."""
    if which not in _PRIVATE_API_WARNED:
        _PRIVATE_API_WARNED.add(which)
        import warnings

        warnings.warn(
            f"components.{which}: private Spark API unavailable; using the "
            f"slow-but-correct fallback (deep CC loops may leak caches / "
            f"accumulate plan stats). Likely a Spark version change.",
            RuntimeWarning,
            stacklevel=3,
        )


def _checkpoint_rdd(df: DataFrame):
    """JVM RDD backing a ``localCheckpoint()``-ed DataFrame (LogicalRDD.rdd)
    so the iterative loops can free the PREVIOUS round's blocks as soon as
    the next round is materialized. Without this the rounds leak one full
    label-table cache each (nothing references it, but driver GC +
    ContextCleaner reclaim lazily) — measured: the 16M-edge chain bench
    OOMed a 12g heap at ~12 rounds x 16M labels x 4 paired runs. Same
    private-API caveat as similarity._broadcastable: on any failure return
    None and the loop degrades to the old GC-based cleanup, never wrong
    answers."""
    try:
        return df._jdf.queryExecution().analyzed().rdd()
    except Exception:
        _warn_private_api_fallback("_checkpoint_rdd")
        return None


def _free_rdd(jrdd) -> None:
    if jrdd is not None:
        try:
            jrdd.unpersist(False)
        except Exception:
            pass


def _rebase(df: DataFrame) -> DataFrame:
    """Rebuild a ``localCheckpoint()``-ed DataFrame over its materialized
    internal-row RDD, DROPPING the origin-plan statistics that Spark's
    checkpoint preserves (LogicalRDD.fromDataset keeps the origin
    ``sizeInBytes``). Without this, Catalyst's size-only estimator CHAINS
    the estimates across rounds — each round's join stats multiply the
    previous round's — so ``sizeInBytes`` grows as ~size^(2^round). By
    round ~13 of a high-diameter graph the BigInt has >100k digits and the
    driver spends MINUTES per round in BigInteger.multiplyToomCook3 inside
    plan-stats visits with every executor idle (observed: 535s of driver
    CPU on an 8M-edge chain graph while 16 executor threads parked). The
    rebuilt frame reports ``defaultSizeInBytes`` — constant per round, and
    no worse for planning: AQE's runtime broadcast switch uses ACTUAL
    shuffle sizes, which is what drives the frontier-join strategy anyway.
    Private-API caveat as `_checkpoint_rdd`: on any failure return the
    input unchanged (old behavior, correct but slow on deep loops)."""
    try:
        spark = df.sparkSession
        jdf = df._jdf
        jrdd = jdf.queryExecution().toRdd()
        jnew = spark._jsparkSession.internalCreateDataFrame(
            jrdd, jdf.schema(), False)
        return DataFrame(jnew, spark)
    except Exception:
        _warn_private_api_fallback("_rebase")
        return df


def _classic_rounds(bidir: DataFrame, labels: DataFrame,
                    max_rounds: int, inherited_ckpt=None) -> DataFrame:
    """All-nodes min-label rounds (the pre-frontier loop, kept as the
    paired-benchmark reference): every round re-aggregates EVERY node.

    ``inherited_ckpt``: the caller's last round's checkpoint blocks (the
    adaptive frontier handoff) — freed once this loop's first round is
    materialized, same lifecycle as this loop's own rounds."""
    prev_ckpt = inherited_ckpt
    try:
        for _ in range(max_rounds):
            # 1. neighbor-min: every node adopts min(comp) over itself +
            # neighbors. The node's OWN previous label rides along (own=true)
            # so convergence falls out of the same aggregation — no per-round
            # join-with-old-labels probe job (that probe was one join + count
            # job per round, a fixed serial term that scales on no hardware).
            neighbor_labels = bidir.join(
                labels.withColumnRenamed("id", "dst"), "dst"
            ).select(F.col("src").alias("id"), "comp")
            tagged = labels.select(
                "id", "comp", F.lit(True).alias("own")
            ).unionByName(neighbor_labels.withColumn("own", F.lit(False)))
            merged = tagged.groupBy("id").agg(
                F.min("comp").alias("comp"),
                # every id has exactly one own=true row (its previous label)
                F.max(F.when(F.col("own"), F.col("comp"))).alias("old"),
            )
            # 2. pointer jumping: comp(v) <- comp(comp(v)) — halves chain depth
            jump = merged.select(
                F.col("id").alias("comp"), F.col("comp").alias("comp2"))
            compressed = merged.join(jump, "comp", "left").select(
                "id", F.coalesce("comp2", "comp").alias("comp"), "old"
            )
            # lazy checkpoint: the convergence count below is the action that
            # materializes the round's result — one job per round instead of
            # eager-checkpoint + probe (two)
            compressed = compressed.localCheckpoint(eager=False)
            changed = compressed.where(F.col("comp") != F.col("old")).count()
            # this round is materialized -> last round's blocks are dead weight
            _free_rdd(prev_ckpt)
            prev_ckpt = _checkpoint_rdd(compressed)
            # drop the origin-stats chain BEFORE the next round builds on it
            labels = _rebase(compressed).select("id", "comp")
            if changed == 0:
                return labels
    except BaseException:
        # mid-round failure: the loop's own last materialized round would
        # otherwise stay cached in the session (the caller never sees it)
        _free_rdd(prev_ckpt)
        raise
    _free_rdd(prev_ckpt)
    raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")


def _frontier_rounds(bidir: DataFrame, labels: DataFrame,
                     max_rounds: int) -> DataFrame:
    """Frontier min-label rounds (large-star style): only nodes whose label
    changed last round emit offers, so late rounds move O(frontier) data.

    Per round, a node can improve two ways, both sourced from the frontier:
    - neighbor offer: u changed -> u's new label is offered to every
      neighbor of u (round 0 the frontier is ALL nodes, so every node's
      initial label is offered once — the classic first round);
    - pointer jump:   u changed -> every v with comp(v) == u adopts u's new
      label (path compression along the label pointer).

    Fixpoint argument: every label change re-broadcasts, so when the
    frontier empties, label(v) <= label(u) holds across every edge in both
    directions => labels are constant per component; own-id offers make the
    constant the component min. Labels only decrease, so termination is
    guaranteed; max_rounds is the assert-style backstop.

    Scale shape: the two frontier joins key on dst / comp with the frontier
    as the SMALL side — AQE's runtime broadcast switch turns late rounds
    into narrow map-side joins over the (checkpointed) edge and label
    tables, instead of the classic loop's full two-shuffle re-aggregation
    of every node every round.
    """
    # Adaptive regime switch (VERDICT r5 #4): frontier rounds win when the
    # frontier decays geometrically (clique-shaped dedup graphs, measured
    # 1.33x) but LOSE ~1.38x on high-diameter graphs where nearly every
    # node keeps changing every round — the frontier joins then move the
    # full graph PLUS the pointer-jump join overhead. The signal is free:
    # n_changed is already counted per round. After two grace rounds, a
    # frontier still covering > _FRONTIER_SWITCH of all nodes hands the
    # loop to _classic_rounds (identical output: min-label propagation
    # converges from any intermediate label state). labels.count() is a
    # scan of the already-materialized localCheckpoint — cheap next to one
    # round.
    n_nodes = labels.count()
    changed = labels            # round 0: everyone announces its own id
    prev_ckpt = None
    try:
        for rnd in range(max_rounds):
            offers = bidir.join(
                changed.withColumnRenamed("id", "dst"), "dst"
            ).select(F.col("src").alias("id"), "comp")
            if rnd:
                jumps = labels.select("id", F.col("comp").alias("_ptr")).join(
                    changed.select(F.col("id").alias("_ptr"), "comp"), "_ptr"
                ).select("id", "comp")
                offers = offers.unionByName(jumps)
            # round 0's pointer jump is skipped: every pointer is still the
            # identity, so it would be a full-size self-join producing no-ops
            cand = offers.groupBy("id").agg(F.min("comp").alias("_new"))
            upd = labels.join(cand, "id", "left").select(
                "id",
                F.least(F.col("comp"), F.coalesce("_new", "comp")).alias("comp"),
                (F.coalesce("_new", "comp") < F.col("comp")).alias("_chg"),
            ).localCheckpoint(eager=False)  # lazy: the count materializes
            n_changed = upd.where("_chg").count()
            # this round is materialized -> last round's blocks are dead weight
            _free_rdd(prev_ckpt)
            prev_ckpt = _checkpoint_rdd(upd)
            # drop the origin-stats chain BEFORE the next round builds on it
            upd = _rebase(upd)
            changed = upd.where("_chg").select("id", "comp")
            labels = upd.select("id", "comp")
            if n_changed == 0:
                return labels
            if rnd >= 2 and n_changed > _FRONTIER_SWITCH * n_nodes:
                # high-diameter regime: hand the checkpoint blocks to the
                # classic loop (freed after its first materialized round)
                return _classic_rounds(bidir, labels, max_rounds - rnd - 1,
                                       inherited_ckpt=prev_ckpt)
    except BaseException:
        _free_rdd(prev_ckpt)    # see _classic_rounds: don't strand the round
        raise
    _free_rdd(prev_ckpt)
    raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")


def _driver_union_find(edges: DataFrame) -> DataFrame:
    """Small-graph path: Arrow-collect ids, union-find with path compression.

    toPandas (Arrow) beats collect() ~10x at 1M edges (no Row objects).
    Union-by-min keeps the invariant root == min(component), so the final
    find() of every node IS its canonical component id.
    """
    return _driver_union_find_pdf(
        edges.select("id_1", "id_2").toPandas(), edges.sparkSession
    )


def _driver_union_find_pdf(pdf, spark, with_sizes: bool = False,
                           stats_out: dict | None = None) -> DataFrame:
    """Vectorized min-label propagation with pointer jumping (numpy).

    Replaces the round-1 Python dict union-find: the per-edge interpreter
    loop was ~3s of pure SERIAL time at 400k edges — the single largest
    Amdahl term in the 4->16 scaling gap. Converges in O(log d) rounds of
    whole-array ops (~ms each); result identical (component = min reachable
    id). The result ships back via an Arrow pandas frame, not a 400k-tuple
    createDataFrame (row-by-row pickling was the other serial sink).
    """
    import numpy as np
    import pandas as pd

    if not len(pdf):
        if stats_out is not None:
            stats_out["max_component_size"] = 0
        schema = "id long, component long" + (", _csize long" if with_sizes else "")
        return spark.createDataFrame([], schema)
    e1 = pdf["id_1"].to_numpy(dtype=np.int64)
    e2 = pdf["id_2"].to_numpy(dtype=np.int64)
    ids = np.unique(np.concatenate([e1, e2]))
    a = np.searchsorted(ids, e1)
    b = np.searchsorted(ids, e2)
    # labels are INDICES into ids; ids is sorted, so min index == min id
    labels = np.arange(ids.shape[0], dtype=np.int64)
    while True:
        nxt = labels.copy()
        np.minimum.at(nxt, a, labels[b])
        np.minimum.at(nxt, b, labels[a])
        nxt = nxt[nxt]                  # pointer jumping halves chain depth
        if np.array_equal(nxt, labels):
            break
        labels = nxt
    out = pd.DataFrame({"id": ids, "component": ids[labels]})
    if with_sizes or stats_out is not None:
        counts = np.bincount(labels, minlength=ids.shape[0])
        if with_sizes:
            out["_csize"] = counts[labels].astype(np.int64)
        if stats_out is not None:
            stats_out["max_component_size"] = int(counts.max())
    return spark.createDataFrame(out)
