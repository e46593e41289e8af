"""F4 blocking goldens (reference tests/test_blocking/test_blocking.py:17-41).

The reference fits rule selection on 5 labeled pairs and ends up with rules
[first_three_letters (idx 0 after selection), first_four_letters (idx 1)] —
its golden transform output pairs (0,1),(2,3),(7,8) with fingerprints
'fri:0','fra:0','fre:0' and 'ahme:1' present in the melt. We replay with the
same selected rules.
"""

from deduplipy_spark.config import EngineConfig
from deduplipy_spark.functions.blocking_rules import (
    first_four_letters,
    first_three_letters,
)
from deduplipy_spark.operators.blocking import RuleBlocker

NAMES = ["frits", "frits h", "frank", "frank h", "stan", "stijn", "ahmet", "fred",
         "frederik"]


def test_fingerprint_golden(spark):
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(NAMES)], "file_id long, name string"
    )
    blocker = RuleBlocker({"name": [first_three_letters, first_four_letters]})
    fp = blocker.fingerprint(df).toPandas()
    got = set(map(tuple, fp.itertuples(index=False)))
    assert (0, "fri:0") in got
    assert (4, "sta:0") in got
    assert (6, "ahme:1") in got


def test_pairs_golden(spark):
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(NAMES)], "file_id long, name string"
    )
    blocker = RuleBlocker({"name": [first_three_letters, first_four_letters]})
    pairs = blocker.pairs(df, EngineConfig(), hashed=False).toPandas()
    got = set(zip(pairs.id_1, pairs.id_2))
    # golden pairs from the reference test (plus whatever 4-letter adds — the
    # reference's selected-rule set produces exactly these three)
    assert {(0, 1), (2, 3), (7, 8)} <= got
    assert (4, 5) not in got          # stan/stijn share only 'st'
    assert (0, 2) not in got          # fri vs fra
