"""Per-partition lineage + metrics (north rule: every stage observable).

The reference has no metrics at all (its one perf artifact is a code
comment). Here every checkpointed stage records:
- manifest: stage, config_hash, row_count, custom metrics (e.g. band skew)
- metrics table: one row per (stage, partition_id) with rows/bytes —
  written beside the stage data as ``<stage>/_metrics`` parquet.

Collection is a single extra pass with ``mapInPandas`` over the stage
output (TaskContext gives the partition id); at 100 TB this is a cheap
column-pruned scan of the just-written parquet, not a recompute.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def partition_stats(df: DataFrame, stage: str) -> DataFrame:
    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        rows = 0
        nbytes = 0
        for pdf in batches:
            rows += len(pdf)
            nbytes += int(pdf.memory_usage(deep=True).sum())
        ctx = TaskContext.get()
        yield pd.DataFrame(
            [{
                "stage": stage,
                "partition_id": ctx.partitionId() if ctx else -1,
                "rows": rows,
                "bytes": nbytes,
            }]
        )

    return df.mapInPandas(stats, "stage string, partition_id int, rows long, bytes long")
