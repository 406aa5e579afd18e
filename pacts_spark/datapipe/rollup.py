"""Hypertable-style multi-resolution time rollup (the continuous-
aggregate cascade): aggregate raw events ONCE at the finest bucket,
then derive every coarser resolution from the previous level's
partials — counts and integer-cent sums/mins/maxes are all mergeable,
so the hour pass reads minute rows (~corpus/60) and the day pass reads
hour rows; the raw table is scanned exactly once and the only
corpus-sized shuffle is the (type, minute-bucket) exchange.

Cross-engine rules: buckets are integer-µs epoch values computed with
BIGINT modulo arithmetic (``us - us % width`` — no double-division
floor risk at bucket boundaries); the measure is quantized to integer
cents (``round(value*100)`` BIGINT) so sums are order-independent and
hash-stable (the repo's micro-unit idiom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_RESOLUTIONS: tuple[tuple[str, int], ...] = (
    ("minute", 60),
    ("hour", 3600),
    ("day", 86400),
)


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    resolutions: tuple[tuple[str, int], ...] = DEFAULT_RESOLUTIONS,
) -> DataFrame:
    """One row per (resolution, event_type, bucket): n_events,
    cents_sum, cents_min, cents_max (all BIGINT; bucket_us is the
    inclusive bucket start in epoch µs). ``resolutions`` must be ordered
    finest→coarsest with each width a multiple of the previous (the
    cascade re-buckets partials, so non-nesting widths would misassign
    boundary rows)."""
    for (_, a), (_, b) in zip(resolutions, resolutions[1:]):
        if b % a != 0:
            raise ValueError(f"resolutions must nest: {b}s not a multiple of {a}s")

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # quantize only QUANTIZABLE measures: NaN / ±Inf / |v| > 9e15 would
    # crash the BIGINT cast in both engines (poisoned-fixture
    # regression) — such rows keep their n_events count but contribute
    # NULL cents (sum/min/max skip NULLs identically in Spark and
    # DuckDB; an all-bad bucket yields NULL aggregates in both). The
    # 9e15 bound keeps |cents| < 2^63; the twin states the SAME CASE.
    v = F.col(value_col).cast("double")
    cents = F.when(
        ~F.isnan(v) & (F.abs(v) <= F.lit(9.0e15)),
        F.round(v * F.lit(100.0)).cast("long"),
    )
    fine_name, fine_secs = resolutions[0]
    fine_w = F.lit(int(fine_secs) * 1_000_000).cast("long")

    base = df.select(
        F.col(type_col).alias("event_type"),
        (us - us % fine_w).alias("bucket_us"),
        cents.alias("__c"),
    )
    level = base.groupBy("event_type", "bucket_us").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("__c").alias("cents_sum"),
        F.min("__c").alias("cents_min"),
        F.max("__c").alias("cents_max"),
    )
    out = level.withColumn("resolution", F.lit(fine_name))
    for name, secs in resolutions[1:]:
        w = F.lit(int(secs) * 1_000_000).cast("long")
        level = (
            level.select(
                "event_type",
                (F.col("bucket_us") - F.col("bucket_us") % w).alias("bucket_us"),
                "n_events",
                "cents_sum",
                "cents_min",
                "cents_max",
            )
            .groupBy("event_type", "bucket_us")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("cents_sum").alias("cents_sum"),
                F.min("cents_min").alias("cents_min"),
                F.max("cents_max").alias("cents_max"),
            )
        )
        out = out.unionByName(level.withColumn("resolution", F.lit(name)))
    return out.select(
        "resolution",
        "event_type",
        "bucket_us",
        F.col("n_events").cast("long").alias("n_events"),
        "cents_sum",
        "cents_min",
        "cents_max",
    )
