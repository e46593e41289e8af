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


def test_winnow_density(spark):
    """Selected fraction of k-grams ~ 2/(w+1) on random text."""
    rng = random.Random(3)
    text = "".join(rng.choice("abcdefghij") for _ in range(5000))
    df = spark.createDataFrame([(0, text)], "file_id long, content string")
    n_fp = winnow_fingerprints(df, K, W).count()
    n_grams = len(text) - K + 1
    frac = n_fp / n_grams
    assert 0.2 < frac < 0.6, frac    # 2/(w+1) = 0.4 +/- slack
