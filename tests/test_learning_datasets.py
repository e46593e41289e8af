"""Optional learned scorer (pyspark.ml) + demo dataset loaders."""

import pyspark.sql.functions as F
import pytest

from deduplipy_spark.operators.learning import PairClassifier
from deduplipy_spark.sources.datasets import load_data, read_table


def test_pair_classifier_learns_separation(spark):
    # synthetic feature vectors: matches near [0.9], non-matches near [0.1]
    import random

    rng = random.Random(4)
    rows = [([rng.uniform(0.7, 1.0), rng.uniform(0.6, 1.0)], 1.0) for _ in range(60)]
    rows += [([rng.uniform(0.0, 0.3), rng.uniform(0.0, 0.4)], 0.0) for _ in range(240)]
    df = spark.createDataFrame(rows, "similarities array<double>, y double")
    clf = PairClassifier().fit(df)
    scored = clf.predict_proba(df).toPandas()
    hi = scored[scored.y == 1.0].score
    lo = scored[scored.y == 0.0].score
    assert hi.min() > 0.5 > lo.max()


def test_pair_classifier_single_class_noop(spark):
    df = spark.createDataFrame([([0.9, 0.8], 1.0)] * 5,
                               "similarities array<double>, y double")
    clf = PairClassifier().fit(df)
    out = clf.predict_proba(df).toPandas()
    assert (out.score == 1.0).all()


def test_voters_loader_contract(spark):
    df = load_data(spark, "voters")
    assert df.columns == ["name", "suburb", "postcode"]
    assert df.count() == 1746
    # deterministic across calls
    a = df.toPandas()
    b = load_data(spark, "voters").toPandas()
    assert a.equals(b)


def test_stoxx_and_dispatch(spark):
    df = load_data(spark, "stoxx50")
    assert df.columns == ["name"]
    assert df.count() == 45
    with pytest.raises(ValueError):
        load_data(spark, "nope")


def test_read_table_csv(spark, tmp_path):
    p = str(tmp_path / "t.csv")
    with open(p, "w") as f:
        f.write("a,b\n1,x\n2,y\n")
    df = read_table(spark, p, fmt="csv")
    assert df.count() == 2 and df.columns == ["a", "b"]
