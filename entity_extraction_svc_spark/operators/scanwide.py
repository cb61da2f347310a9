"""Scale-adaptive scan widening for compute-heavy narrow stages.

A small parquet table scans as one or two input splits
(``spark.sql.files.maxPartitionBytes`` = 128 MB; the sf1.0 documents table
is 5.7 MB), so every row-local stage fused onto the scan — Python batch
passes, higher-order shingle expressions, per-row hashing — runs on one or
two cores while the rest of the machine idles.  Measured at sf1.0 on
local[32]: the minhash signature pass dropped 7.9s -> 1.2s and the ngram
shingle-set pass 3.8s -> 0.9s from widening alone.

``widen_scan`` round-robin repartitions ONLY when the source has fewer
partitions than the session's parallelism, so at cluster scale (where a
scan already yields >= cores splits) it is a no-op and no exchange is
added.  Round-robin repartition is deterministic (Spark sorts before
repartitioning, SPARK-23207) and the callers are row-local maps or
aggregations whose results are partitioning-independent, so outputs are
bit-identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_scan(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism when its
    current plan yields fewer partitions; identity otherwise."""
    sc = df.sparkSession.sparkContext
    target = int(min_parts or sc.defaultParallelism)
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:
        return df
    if cur < target:
        return df.repartition(target)
    return df
