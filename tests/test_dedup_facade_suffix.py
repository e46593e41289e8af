"""Deduplicator facade API + suffix containment pass."""

import pyspark.sql.functions as F

from deduplipy_spark.config import EngineConfig
from deduplipy_spark.deduplicator import Deduplicator
from deduplipy_spark.operators.suffix import containment_pairs, prefix_band_keys
from deduplipy_spark.operators.pairs import candidate_pairs


def test_deduplicator_facade(spark):
    from deduplipy_spark.sources.datagen import gen_files

    files = gen_files(spark, 100, 10, partitions=4)
    dd = Deduplicator(config=EngineConfig())
    out = dd.predict(files)
    assert "deduplication_id" in out.columns
    assert out.count() == 100
    # exact copies share deduplication_id
    pdf = out.join(
        files.select("repo", "path", "commit"), ["repo", "path", "commit"]
    ).toPandas()
    assert pdf.deduplication_id.nunique() < 100


def test_deduplicator_fit_selects_rules(spark):
    pairs = spark.createDataFrame(
        [("frits", "frits h"), ("frank", "frank h"), ("ahmet", "ahmet"),
         ("fred", "frederik")],
        "name_1 string, name_2 string",
    )
    dd = Deduplicator(col_names=["name"]).fit(pairs)
    assert dd.rules_selected


def test_containment_detects_substring(spark):
    base = "\n".join(f"line {i} of the original file body" for i in range(50))
    container = "// vendored header\n" + base + "\n// trailer"
    other = "\n".join(f"unrelated {i}" for i in range(50))
    files = spark.createDataFrame(
        [(1, base), (2, container), (3, other)], "file_id long, content string"
    )
    cands = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], "id_1 long, id_2 long")
    out = containment_pairs(cands, files).toPandas()
    got = {(r.id_1, r.id_2): r.containment for r in out.itertuples()}
    assert got.get((1, 2)) == 1.0
    assert (1, 3) not in got and (2, 3) not in got


def test_prefix_band_blocking_finds_append_containment(spark):
    base = "x" * 500
    files = spark.createDataFrame(
        [(1, base), (2, base + "appended tail"), (3, "z" * 500)],
        "file_id long, content string",
    )
    bands = prefix_band_keys(files, k=64)
    cands = candidate_pairs(bands, EngineConfig())
    out = containment_pairs(cands, files).toPandas()
    assert {(1, 2)} == set(zip(out.id_1, out.id_2))


def test_deduplicator_save_load(tmp_path):
    from deduplipy_spark.config import EngineConfig

    dd = Deduplicator(col_names=["content"],
                      config=EngineConfig(shingle_k=9, bands=8, rows_per_band=16))
    dd.rules_selected = [("content", 3)]
    p = str(tmp_path / "model.json")
    dd.save(p)
    dd2 = Deduplicator.load(p)
    assert dd2.cfg.config_hash() == dd.cfg.config_hash()
    assert dd2.cfg.shingle_k == 9
    assert dd2.rules_selected == [("content", 3)]


def test_partial_containment_prefix_suffix_bound(spark):
    """min_containment < 1: the vectorized common-prefix+suffix bound, in
    CHARACTER units (incl. non-ASCII), must match a scalar re-derivation."""
    a = "def héllo():\n    pass\nXX_DIVERGENT_MIDDLE\n# shared trailer é"
    b = "def héllo():\n    pass\nYY_OTHER_CENTER_123\n# shared trailer é"
    files = spark.createDataFrame(
        [(1, a), (2, b), (3, "zzz nothing alike")],
        "file_id long, content string",
    )
    cands = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_1 long, id_2 long")
    out = containment_pairs(cands, files, min_containment=0.3).toPandas()
    # scalar reference for the (1,2) pair
    n = min(len(a), len(b))
    p = next((i for i in range(n) if a[i] != b[i]), n)
    s = next((i for i in range(n - p) if a[-1 - i] != b[-1 - i]), n - p)
    want = round(min((p + s) / min(len(a), len(b)), 1.0), 6)
    got = dict(zip(zip(out.id_1, out.id_2), out.containment))
    assert got.get((1, 2)) == want and want > 0.3
    assert (1, 3) not in got
