"""SparkSession factory tuned for the dedup workload.

Local-mode settings mirror what we would set cluster-side: AQE on (post-shuffle
coalesce + skew-join splitting), Arrow for all pandas UDF exchange, and a
shuffle-partition count sized to cores (overridable per EngineConfig).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "deduplipy-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cores
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        # session default: one shuffle task per core. DedupPipeline.run
        # re-sizes this per input (~16MB of input per shuffle partition,
        # clamped to [1x, 4x] cores): the optimum is data-dependent — a
        # 400k-file corpus at local[8] ran 21% faster with 2 waves, while
        # the same 2x setting cost 16% on a 50k corpus at local[32].
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # UDF-heavy scans: python work per byte is ~100x a columnar scan's,
        # so split files much finer than the 128MB default or a compressed
        # corpus yields fewer scan partitions than cores (measured: 240MB
        # parquet -> 2 tasks -> signature stage pinned to 2 cores). 8m keeps
        # a 64-file/270MB corpus at one split per file, which lets the
        # pipeline skip its defensive full-content repartition (a flat ~4s
        # shuffle floor) at every local[N] level.
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m")
        # id-only build sides (rep ids, cluster maps) are worth broadcasting
        # well past the 10m default — avoids shuffling 512B signature rows
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # shuffled-hash over sort-merge: every big join here is an id
        # equi-join whose per-partition build side is bounded (sigs ~50MB
        # per partition at 1.6M files), and sorting the 512B signature rows
        # was the superlinear term — measured 1.6M-file pipeline 78.6s ->
        # 61.8s with this flag. AQE still broadcasts/handles skew on top.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # modest heap: local-mode shuffle+checkpoint live in tmpfs below, and
        # an oversized JVM competes with tmpfs + 32 python workers for RAM
        # (measured: 48g heap ran 1.8x SLOWER than 12g on the 1.6M bench)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "12g"))
        # The full pipeline generates >100 distinct whole-stage-codegen
        # classes per run; the default 100-entry compiled-class cache
        # thrashes and every run re-pays ~4s of Janino compilation
        # (measured: repeat pipeline runs 9.5s -> 5.6s with this bump).
        # Compiled classes are small; 5000 entries is a few tens of MB.
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    # Shuffle/spill to tmpfs when available: the sandbox disk sustains only
    # ~110 MB/s, which serializes multi-GB shuffles and caps scaling beyond
    # ~8 cores. (On a real cluster this is per-node NVMe — plentiful and
    # parallel across executors.)
    shm = os.environ.get("SPARK_LOCAL_DIRS_OVERRIDE", "/dev/shm/spark-local")
    try:
        os.makedirs(shm, exist_ok=True)
        builder = builder.config("spark.local.dir", shm)
    except OSError:
        pass
    return builder.getOrCreate()
