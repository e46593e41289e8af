"""Winnowing fingerprints (operators/winnow.py) — MOSS guarantee tests."""

import random

import pyspark.sql.functions as F

from deduplipy_spark.config import EngineConfig
from deduplipy_spark.operators.winnow import (
    winnow_candidate_pairs,
    winnow_fingerprints,
)

K, W = 8, 4


def test_winnow_edge_cases(spark):
    rows = [(0, ""), (1, "short"), (2, "x" * 7), (3, "x" * 8), (4, "x" * 9),
            (5, None)]
    df = spark.createDataFrame(rows, "file_id long, content string")
    out = winnow_fingerprints(df, K, W).toPandas()
    by_id = out.groupby("id").size().to_dict()
    assert 0 not in by_id and 1 not in by_id and 2 not in by_id  # < k chars
    assert 5 not in by_id                                        # null
    assert by_id[3] == 1          # exactly one k-gram -> one fingerprint
    assert by_id[4] == 1          # 2 identical grams ("x"*8) -> 1 distinct


def test_winnow_shared_substring_guarantee(spark):
    """Any shared substring of length >= w + k - 1 must yield at least one
    shared fingerprint (Schleimer et al., SIGMOD'03, Theorem in §3)."""
    rng = random.Random(13)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 "
    shared = "".join(rng.choice(alphabet) for _ in range(K + W - 1))
    rows = []
    for i in range(20):
        pre = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 200)))
        post = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 200)))
        rows.append((i, pre + shared + post))
    df = spark.createDataFrame(rows, "file_id long, content string")
    fps = winnow_fingerprints(df, K, W).toPandas()
    sets = {i: set(g.fp) for i, g in fps.groupby("id")}
    for i in range(20):
        for j in range(i + 1, 20):
            assert sets[i] & sets[j], (i, j)
    # and the pair generator surfaces every such pair as a candidate
    pairs = winnow_candidate_pairs(df, EngineConfig(band_cap=100)).count()
    assert pairs == 20 * 19 / 2


def _winnow_reference(text: str, k: int = K, w: int = W) -> set:
    """Independent single-node re-derivation (hashlib): hash every k-gram,
    sliding-window min, distinct — the exact contract the Spark dataflow
    (and the DuckDB oracle) must reproduce."""
    import hashlib

    if text is None:
        text = ""
    ng = len(text) - k + 1
    if ng < 1:
        return set()
    hs = [hashlib.sha256(text[i:i + k].encode()).hexdigest()
          for i in range(ng)]
    nsel = max(ng - w + 1, min(ng, 1))
    return {min(hs[i:i + w]) for i in range(nsel)}


def test_winnow_matches_reference(spark):
    """r6 narrow rewrite (per-doc array kernel, zero shuffle) must emit
    exactly the fingerprints of the independent hashlib re-derivation,
    including the short-doc single-window edge cases."""
    import random

    rng = random.Random(99)
    alphabet = "abcdefgh \n"
    rows = [(0, ""), (1, None), (2, "x" * (K - 1)), (3, "x" * K),
            (4, "abcdefghij"[:K + W - 2]),      # 1 < ng < w
            (5, "abcdefghijk"),                 # ng == w
            (6, "".join(rng.choice(alphabet) for _ in range(500))),
            (7, "".join(rng.choice(alphabet) for _ in range(37)))]
    df = spark.createDataFrame(rows, "file_id long, content string")
    got = winnow_fingerprints(df, K, W).toPandas()
    sets = {i: set(g.fp) for i, g in got.groupby("id")}
    for i, text in rows:
        assert sets.get(i, set()) == _winnow_reference(text), i


def test_winnow_plan_is_narrow(spark):
    """Regression gate for the r6 plan shape: the k-gram sha2 array must be
    materialized ONCE in a Project below the Generate (if an optimizer
    change inlines it into the window-min lambda, every window recomputes
    the whole array — the O(n^2) pathology), and the only Exchange allowed
    is the defensive round-robin input repartition — no hash exchange, no
    Window, no per-gram explode survives."""
    df = spark.createDataFrame([(0, "abcdefghijklmnop")],
                               "file_id long, content string")
    plan = spark._jvm.PythonSQLUtils.explainString(
        winnow_fingerprints(df, K, W)._jdf.queryExecution(), "formatted")
    assert plan.count("sha2(") == 1, plan
    assert "Window" not in plan, plan
    assert "hashpartitioning" not in plan, plan
    assert plan.count("Exchange") <= 2, plan   # tree + detail of the one
    # round-robin repartition (absent when the input is well-partitioned)


def test_winnow_density(spark):
    """Selected fraction of k-grams ~ 2/(w+1) on random text."""
    rng = random.Random(3)
    text = "".join(rng.choice("abcdefghij") for _ in range(5000))
    df = spark.createDataFrame([(0, text)], "file_id long, content string")
    n_fp = winnow_fingerprints(df, K, W).count()
    n_grams = len(text) - K + 1
    frac = n_fp / n_grams
    assert 0.2 < frac < 0.6, frac    # 2/(w+1) = 0.4 +/- slack
