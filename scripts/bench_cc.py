"""Microbench: distributed connected-components round cost (VERDICT r4 #7).

Two synthetic shapes at ~16-32M edges, driver path disabled so the
distributed loop runs:

- "lsh":    the realistic dedup graph — many small cliques (low diameter,
            converges in ~3 rounds); frontier gains are bounded here.
- "chain":  long paths (high diameter, many rounds); the worst case the
            frontier optimization targets — after round 1 only the active
            wavefront should move data.

Usage: python scripts/bench_cc.py [n_edges] [shape ...]
Prints one JSON line per shape with wall seconds + rounds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from deduplipy_spark.operators.components import (
    _checkpoint_rdd,
    connected_components,
)
from deduplipy_spark.session import get_spark


def edges_lsh(spark, n_edges: int):
    """Cliques of 8 (star-encoded: 7 edges per clique of 8 nodes)."""
    n_cliques = n_edges // 7
    return (
        spark.range(n_cliques * 7)
        .select(
            (F.col("id") / 7).cast("long").alias("c"),
            (F.col("id") % 7).alias("m"),
        )
        .select(
            (F.col("c") * 8).alias("id_1"),
            (F.col("c") * 8 + F.col("m") + 1).alias("id_2"),
        )
    )


def edges_chain(spark, n_edges: int, chain_len: int = 4096):
    """Paths of `chain_len` nodes -> diameter stresses round count."""
    n_chains = n_edges // (chain_len - 1)
    n = n_chains * (chain_len - 1)
    return (
        spark.range(n)
        .select(
            ((F.col("id") / (chain_len - 1)).cast("long") * chain_len
             + F.col("id") % (chain_len - 1)).alias("id_1"),
        )
        .select("id_1", (F.col("id_1") + 1).alias("id_2"))
    )


def _drop_finished_caches(spark, keep) -> None:
    """Free the finished run's final-label checkpoint blocks (the rounds
    free their own intermediates since round 5, but the RETURNED labels
    stay cached for the caller — here 4 paired runs x 16M rows would
    accumulate). Keeps only the shared input's blocks."""
    jrdd = _checkpoint_rdd(keep)
    if jrdd is None:
        # can't identify the input's blocks -> skip cleanup rather than
        # unpersist the unrecoverable localCheckpoint'd input with the rest
        return
    keep_id = jrdd.id()
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jmap.keys()):
            if rid != keep_id:
                jmap[rid].unpersist(False)
    except Exception:
        pass


def _steal() -> int:
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except (OSError, IndexError, ValueError):
        return 0


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    shapes = sys.argv[2:] or ["lsh", "chain"]
    spark = get_spark("bench-cc", cores=16)
    for shape in shapes:
        e = (edges_lsh if shape == "lsh" else edges_chain)(spark, n_edges)
        e = e.repartition(32).localCheckpoint()     # input cost excluded
        n = e.count()
        res = {}
        # PAIRED protocol: interleave the two variants in one process,
        # best-of-2 each — single-sample cross-process numbers on this
        # multi-tenant host are not comparable (BENCH/NOTES.md)
        for attempt in range(2):
            for frontier in (True, False):
                key = "frontier" if frontier else "classic"
                s0, t0 = _steal(), time.monotonic()
                out = connected_components(e, driver_max_edges=0,
                                           frontier=frontier)
                n_comp = out.select("component").distinct().count()
                dt = time.monotonic() - t0
                _drop_finished_caches(spark, keep=e)
                prev = res.get(key)
                if prev is None or dt < prev["wall_sec"]:
                    res[key] = {"wall_sec": round(dt, 2),
                                "steal": _steal() - s0,
                                "components": n_comp}
        print(json.dumps({"shape": shape, "edges": n, **res}), flush=True)
        assert res["frontier"]["components"] == res["classic"]["components"]
    spark.stop()


if __name__ == "__main__":
    main()
