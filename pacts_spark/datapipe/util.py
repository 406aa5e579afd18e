"""Shared datapipe plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ensure_scan_parallelism(df: DataFrame, id_col: str) -> DataFrame:
    """Raise the partition count of a narrow input to the session's core
    count when the upstream scan under-partitions it.

    At 100 TB a parquet scan is split every ``maxPartitionBytes`` (128 MB)
    and this is a no-op (we never add a shuffle to an already-parallel
    scan). But a small table that fits in ONE file arrives as ONE
    partition, and any expensive fused projection downstream (winnowing
    or simhash per-gram md5s, minhash's k permutations) then runs on a
    single core with no shuffle anywhere for AQE to re-plan. The
    repartition doubles as the exchange barrier a shared expensive array
    needs anyway (CollapseProject re-inlines a shared projection across
    consumers — round-4 lesson).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, F.col(id_col))
