"""Per-stage wall-clock profile of the corpus pipeline (diagnostic only)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deduplipy_spark.config import EngineConfig
from deduplipy_spark.plans.pipeline import DedupPipeline
from deduplipy_spark.session import get_spark

N = int(os.environ.get("BENCH_N", "50000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

spark = get_spark("profile", cores=CPUS, shuffle_partitions=CPUS)

import bench

corpus = bench.ensure_corpus(spark, N)
bench.warm_python_workers(spark)

files = spark.read.parquet(corpus)
cfg = EngineConfig()
if os.environ.get("PROFILE_WARM", "1") == "1":
    DedupPipeline(spark, cfg).run(files).count()   # warm codegen/JIT paths
pipe = DedupPipeline(spark, cfg)

orig = pipe._stage
times = {}


def timed(name, fn, **kw):
    t0 = time.monotonic()
    out = orig(name, fn, **kw)
    times[name] = round(time.monotonic() - t0, 3)
    return out


pipe._stage = timed
for rep in range(3):
    times.clear()
    t0 = time.monotonic()
    res = pipe.run(files)
    t_build = time.monotonic() - t0
    t0 = time.monotonic()
    n = res.count()
    t_final = time.monotonic() - t0
    print("stages:", times)
    print(f"build={t_build:.3f}s final_count={t_final:.3f}s rows={n}")
spark.stop()
