"""Mixed 50/50 sampler + score histogram + custom metric wrapper."""

import pyspark.sql.functions as F

from deduplipy_spark.config import EngineConfig
from deduplipy_spark.functions.string_metrics import wrap_metric
from deduplipy_spark.operators.sampling import mixed_sample
from deduplipy_spark.operators.scoring import score_histogram


def test_mixed_sample_contract(spark):
    from deduplipy_spark.sources.datagen import gen_files

    df = gen_files(spark, 200, 20, partitions=4)
    out = mixed_sample(df, EngineConfig(), ["repo", "path"], n_samples=60).toPandas()
    assert 0 < len(out) <= 60
    assert out.synthetic_perfect_match.sum() == 3
    assert not out.duplicated(["repo_1", "path_1", "repo_2", "path_2"]).any()


def test_score_histogram(spark):
    rows = [(i, i + 1, s) for i, s in enumerate([0.02, 0.07, 0.12, 0.5, 0.99, 1.0])]
    df = spark.createDataFrame(rows, "id_1 long, id_2 long, score double")
    h = score_histogram(df).toPandas()
    got = dict(zip(h.bin_low.round(2), h.n))
    assert got[0.0] == 1          # 0.02
    assert got[0.05] == 1         # 0.07
    assert got[0.10] == 1
    assert got[0.95] == 2         # 0.99 and 1.0 (top bin inclusive, np.histogram-style)
    assert h.n.sum() == 6


def test_wrap_metric_custom_callable(spark):
    same_first_char = lambda a, b: 1.0 if (a[:1] == b[:1] and a) else 0.0
    df = spark.createDataFrame([("abc", "axe"), ("abc", "zzz"), ("", "")],
                               "x_1 string, x_2 string")
    out = df.select(wrap_metric(same_first_char)("x_1", "x_2").alias("m")).toPandas()
    assert list(out.m) == [1.0, 0.0, 0.0]
