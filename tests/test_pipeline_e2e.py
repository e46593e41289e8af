"""End-to-end: Spark pipeline vs a single-node reference replica at identical
shingle/signature config (the recall≥0.99 gate of BASELINE.json), plus the
planted-truth sanity check and the sha256 invariant.

The reference itself cannot run in this env (scipy/fancyimpute/modAL absent —
SURVEY §7), so the replica re-executes the same semantics single-node:
python-dict banding, union-find components, the numpy HAC verified against
the reference's clustering goldens in tests/test_clustering.py.
"""

import numpy as np
import pandas as pd
import pytest

from deduplipy_spark.config import EngineConfig
from deduplipy_spark.ids import with_identity
from deduplipy_spark.operators.agglomerate import hierarchical_cluster_component
from deduplipy_spark.operators.minhash import (
    _perm_params,
    shingle_hashes,
    signature_of_hashes,
)
from deduplipy_spark.plans.pipeline import DedupPipeline
from deduplipy_spark.sources.datagen import gen_files, gen_pandas

N_FILES, N_CLUSTERS, MEMBERS = 400, 40, 5


def replica_clusters(pdf: pd.DataFrame, cfg: EngineConfig,
                     id_of_idx: dict[int, int]) -> dict[int, int]:
    """Single-node block→score→cluster at identical config.

    Node ids = the engine's deterministic file_ids (same labels as the Spark
    run): with quantized MinHash scores, HAC tie-breaking is order-sensitive,
    so comparing the distributed dataflow against single-node semantics
    requires identical node ordering — exactly the "identical config"
    proviso of the north rule. Returns {file_id: cluster_id}.
    """
    import hashlib

    pdf = pdf.copy()
    pdf["fid"] = pdf.row_idx.map(id_of_idx)
    pdf["sha"] = pdf.content.map(lambda s: hashlib.sha256(s.encode()).hexdigest())
    reps = pdf.groupby("sha", as_index=False).agg(rep=("fid", "min"))
    rep_rows = pdf.merge(reps, left_on="sha", right_on="sha")
    rep_only = rep_rows[rep_rows.fid == rep_rows.rep]

    a, b = _perm_params(cfg.num_perm, cfg.minhash_seed)
    sigs = {
        int(r.fid): signature_of_hashes(shingle_hashes(r.content, cfg.shingle_k), a, b)
        for r in rep_only.itertuples()
    }
    # banding by tuple of band slice (same grouping semantics as the hashed key)
    buckets: dict[tuple, list[int]] = {}
    for rid, sig in sigs.items():
        for j in range(cfg.bands):
            key = (j, tuple(sig[j * cfg.rows_per_band : (j + 1) * cfg.rows_per_band]))
            buckets.setdefault(key, []).append(rid)
    pairs = set()
    for key, ids in buckets.items():
        ids = sorted(ids)
        head = ids[: cfg.band_cap]
        for i in range(len(head)):
            for j in range(i + 1, len(head)):
                pairs.add((head[i], head[j]))
        if cfg.hot_band_star:
            for y in ids[cfg.band_cap:]:        # star overflow edges
                pairs.add((ids[0], y))
    scored = {
        p: float((sigs[p[0]] == sigs[p[1]]).mean())
        for p in pairs
    }
    scored = {p: s for p, s in scored.items() if s >= cfg.score_threshold}

    # union-find components
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in scored:
        a1, b1 = find(p[0]), find(p[1])
        if a1 != b1:
            parent[max(a1, b1)] = min(a1, b1)
    comps: dict[int, list[int]] = {}
    for node in parent:
        comps.setdefault(find(node), []).append(node)

    clusters: dict[int, int] = {}
    for root, nodes in comps.items():
        nodes = np.array(sorted(nodes))
        edges = pd.DataFrame(
            [(p[0], p[1], s) for p, s in scored.items()
             if p[0] in set(nodes) and p[1] in set(nodes)],
            columns=["id_1", "id_2", "score"],
        )
        labels = hierarchical_cluster_component(
            nodes, edges, cfg.cluster_threshold, cfg.fill_missing,
            cfg.softimpute_convergence,
        )
        for n, l in zip(nodes, labels):
            clusters[int(n)] = int(l)
    # singleton reps
    for rid in sigs:
        clusters.setdefault(rid, rid)
    # exact members inherit their rep's cluster
    out = {}
    rep_by_fid = rep_rows.set_index("fid").rep.to_dict()
    for fid, rep in rep_by_fid.items():
        out[int(fid)] = clusters[int(rep)]
    return out


def dup_pairs(assign: dict[int, int]) -> set[tuple[int, int]]:
    from collections import defaultdict

    groups = defaultdict(list)
    for k, v in assign.items():
        groups[v].append(k)
    pairs = set()
    for members in groups.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.add((members[i], members[j]))
    return pairs


@pytest.fixture(scope="module")
def run(spark):
    cfg = EngineConfig()
    files = gen_files(spark, N_FILES, N_CLUSTERS, MEMBERS, partitions=8)
    out = DedupPipeline(spark, cfg).run(files)
    spark_pdf = out.toPandas()
    idmap = (
        with_identity(files).select("file_id", "row_idx", "truth_cluster").toPandas()
    )
    merged = spark_pdf.merge(idmap, on="file_id")
    local = gen_pandas(N_FILES, N_CLUSTERS, MEMBERS)
    id_of_idx = dict(zip(idmap.row_idx, idmap.file_id))
    repl = replica_clusters(local, cfg, id_of_idx)
    return merged, repl


def test_recall_vs_reference_replica(run):
    merged, repl = run
    spark_assign = dict(zip(merged.file_id, merged.cluster_id))
    assert len(spark_assign) == N_FILES
    rp, sp = dup_pairs(repl), dup_pairs(spark_assign)
    assert rp, "replica found no duplicate pairs — test is vacuous"
    recall = len(rp & sp) / len(rp)
    precision = len(rp & sp) / max(len(sp), 1)
    assert recall >= 0.99, (len(rp), len(sp), len(rp & sp))
    assert precision >= 0.99, (len(rp), len(sp), len(rp & sp))


def test_truth_recall_sanity(run):
    merged, _ = run
    spark_assign = dict(zip(merged.row_idx, merged.cluster_id))
    truth_assign = dict(zip(merged.row_idx, merged.truth_cluster))
    tp = {p for p in dup_pairs(truth_assign) if p[0] < N_CLUSTERS * MEMBERS}
    sp = dup_pairs(spark_assign)
    recall = len(tp & sp) / len(tp)
    # planted mutations are small; the default config should catch nearly all
    assert recall >= 0.9, recall


def test_sha_invariant_and_exact_collapse(run):
    merged, _ = run
    # exact copies (members 0,1 of each planted cluster) share a cluster id
    for c in range(N_CLUSTERS):
        a = merged[merged.row_idx == c * MEMBERS].cluster_id.iloc[0]
        b = merged[merged.row_idx == c * MEMBERS + 1].cluster_id.iloc[0]
        assert a == b
    # output carries content_sha for every row (invariant checked vs input)
    assert merged.content_sha.notna().all()
