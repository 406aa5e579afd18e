"""Timestamp-gap quantiles per conversation — north_star mandate.

Scales up the reference's header-timestamp contract (auto-stamped now(),
Header.java:43; header.rs:30) to a monotonicity + cadence check: the gap
between consecutive turns of a conversation, summarized by quantiles.

Scale design: ``lag`` over ``Window.partitionBy(conv_id).orderBy(turn_idx)``
shuffles once on conv_id. A whale conversation makes one fat window
partition — unavoidable for exact per-conv ordering, but the window
computes lag in a single streaming pass (no buffering of the whole
partition for lag-1). Quantiles: ``percentile_approx`` (t-digest-style
mergeable sketch, built-in — constant memory, one extra tiny shuffle) for
the 100 TB path; ``exact=True`` uses ``percentile`` for oracle-comparable
runs. Negative gaps double as the out-of-order-turn violation signal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ts_gaps(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-turn gap (seconds) to the previous turn of the same conversation;
    first turn of each conversation has NULL gap."""
    w = Window.partitionBy(conv_col).orderBy(order_col, ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    # cast-to-double keeps sub-second precision (unix_timestamp truncates);
    # NTZ → TIMESTAMP first (session tz is UTC, so the epoch matches
    # DuckDB's epoch() on the same NTZ value)
    as_sec = lambda c: c.cast("timestamp").cast("double")  # noqa: E731
    return df.withColumn("gap_seconds", as_sec(F.col(ts_col)) - as_sec(prev))


def gap_quantiles(
    df: DataFrame,
    partition_col: Column | str | None = None,
    quantiles: list[float] = (0.5, 0.9, 0.99),
    exact: bool = False,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap quantiles (+ min/max/negative-gap count) per partition."""
    gaps = ts_gaps(df, conv_col, order_col, ts_col).filter(
        F.col("gap_seconds").isNotNull()
    )
    qlist = list(quantiles)
    if exact:
        qcol = F.expr(f"percentile(gap_seconds, array({', '.join(map(str, qlist))}))")
    else:
        qcol = F.percentile_approx("gap_seconds", qlist, 10000)
    aggs = [
        F.round(qcol[i], 6).alias(f"p{int(q * 100)}") for i, q in enumerate(qlist)
    ] + [
        F.min("gap_seconds").alias("min_gap"),
        F.max("gap_seconds").alias("max_gap"),
        F.sum((F.col("gap_seconds") < 0).cast("long")).alias("n_negative_gaps"),
        F.count(F.lit(1)).alias("n_gaps"),
    ]
    if partition_col is None:
        return gaps.agg(*aggs).withColumn("part", F.lit("__all__"))
    pcol = F.col(partition_col) if isinstance(partition_col, str) else partition_col
    return gaps.groupBy(pcol.alias("part")).agg(*aggs)
