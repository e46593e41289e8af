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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, max_rounds: int = 50,
                         driver_max_edges: int = 2_000_000) -> DataFrame:
    """edges(id_1, id_2) -> (id, component) for every node appearing in edges.

    component = min node id reachable (the canonical representative).

    Scale-adaptive (same spirit as AQE's runtime broadcast switch): below
    `driver_max_edges` the edge list fits trivially on the driver (2M edges
    = 32 MB) and a union-find there beats O(log d) Spark rounds of fixed
    job overhead; above it, the distributed min-label loop runs. Both paths
    produce identical output (component = min reachable id).
    """
    if driver_max_edges:
        # probe and collect in ONE action: pull at most N+1 edges; if the
        # limit wasn't hit, these rows ARE the whole graph (round 1 spent a
        # separate limit().count() job before collecting the same rows)
        probe = edges.select("id_1", "id_2").limit(driver_max_edges + 1).toPandas()
        if len(probe) <= driver_max_edges:
            return _driver_union_find_pdf(probe, edges.sparkSession)
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
    for _ in range(max_rounds):
        # 1. neighbor-min: every node adopts min(comp) over itself + neighbors
        neighbor_labels = bidir.join(
            labels.withColumnRenamed("id", "dst"), "dst"
        ).select(F.col("src").alias("id"), "comp")
        merged = (
            labels.unionByName(neighbor_labels)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
        )
        # 2. pointer jumping: comp(v) <- comp(comp(v)) — halves chain depth
        jump = merged.select(F.col("id").alias("comp"), F.col("comp").alias("comp2"))
        compressed = merged.join(jump, "comp", "left").select(
            "id", F.coalesce("comp2", "comp").alias("comp")
        )
        compressed = compressed.localCheckpoint()
        changed = (
            compressed.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = compressed
        if changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")
    return labels.select("id", F.col("comp").alias("component"))


def _driver_union_find(edges: DataFrame) -> DataFrame:
    """Small-graph path: Arrow-collect ids, union-find with path compression.

    toPandas (Arrow) beats collect() ~10x at 1M edges (no Row objects).
    Union-by-min keeps the invariant root == min(component), so the final
    find() of every node IS its canonical component id.
    """
    return _driver_union_find_pdf(
        edges.select("id_1", "id_2").toPandas(), edges.sparkSession
    )


def _driver_union_find_pdf(pdf, spark) -> DataFrame:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:        # path compression
            parent[x], x = root, parent[x]
        return root

    for a0, b0 in zip(pdf["id_1"].to_numpy(), pdf["id_2"].to_numpy()):
        a, b = find(int(a0)), find(int(b0))
        if a != b:
            if a < b:                   # canonical: smaller id wins the root
                parent[b] = a
            else:
                parent[a] = b
    out = [(node, find(node)) for node in parent]
    return spark.createDataFrame(out, "id long, component long")
