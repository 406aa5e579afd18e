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
    w = Window.partitionBy(conv_col).orderBy(
        # NULLS LAST pinned (Spark defaults nulls-first, DuckDB twin
        # nulls-last — unpinned NULL keys shift every lag)
        F.col(order_col).asc_nulls_last(), F.col(ts_col).asc_nulls_last()
    )
    prev = F.lag(F.col(ts_col)).over(w)
    # cast-to-double keeps sub-second precision (unix_timestamp truncates);
    # NTZ → TIMESTAMP first (session tz is UTC, so the epoch matches
    # DuckDB's epoch() on the same NTZ value)
    as_sec = lambda c: c.cast("timestamp").cast("double")  # noqa: E731
    return df.withColumn("gap_seconds", as_sec(F.col(ts_col)) - as_sec(prev))


class TDigest:
    """Minimal deterministic t-digest (merging variant, k1-style size
    bound): mergeable centroid sketch for quantiles over unbounded
    streams. Public-knowledge algorithm (Dunning & Ertl, "Computing
    extremely accurate quantiles using t-digests").

    Determinism: input buffers are sorted before compression and
    compression is a single left-to-right pass, so the same multiset of
    values always yields the same centroids regardless of arrival order.
    """

    __slots__ = ("delta", "means", "weights")

    def __init__(self, delta: int = 100):
        self.delta = delta
        self.means: list[float] = []
        self.weights: list[float] = []

    def add_sorted(self, values, weights=None) -> None:
        if weights is None:
            weights = [1.0] * len(values)
        merged_m = []
        merged_w = []
        i = j = 0
        while i < len(self.means) or j < len(values):
            if j >= len(values) or (
                i < len(self.means) and self.means[i] <= values[j]
            ):
                merged_m.append(self.means[i]); merged_w.append(self.weights[i]); i += 1
            else:
                merged_m.append(float(values[j])); merged_w.append(float(weights[j])); j += 1
        self._compress(merged_m, merged_w)

    def merge(self, other: "TDigest") -> "TDigest":
        self.add_sorted(other.means, other.weights)
        return self

    def _compress(self, means, weights) -> None:
        total = sum(weights)
        if not means:
            self.means, self.weights = [], []
            return
        out_m = [means[0]]
        out_w = [weights[0]]
        cum = 0.0
        for m, w in zip(means[1:], weights[1:]):
            q0 = cum / total
            q2 = (cum + out_w[-1] + w) / total
            # k1 size bound approximation: centroid may absorb while the
            # spanned quantile range stays under 1/delta scaled by 4q(1-q)
            limit = 4.0 * total * max(q0, 1e-12) * max(1.0 - q2, 1e-12) / self.delta
            if out_w[-1] + w <= max(limit, 1.0):
                out_m[-1] = (out_m[-1] * out_w[-1] + m * w) / (out_w[-1] + w)
                out_w[-1] += w
            else:
                cum += out_w[-1]
                out_m.append(m)
                out_w.append(w)
        self.means, self.weights = out_m, out_w

    def quantile(self, q: float) -> float:
        if not self.means:
            return float("nan")
        total = sum(self.weights)
        target = q * total
        cum = 0.0
        for i, w in enumerate(self.weights):
            if cum + w >= target:
                return self.means[i]
            cum += w
        return self.means[-1]


def gap_quantiles_tdigest(
    df: DataFrame,
    partition_col: Column | str | None = None,
    quantiles: list[float] = (0.5, 0.9, 0.99),
    delta: int = 200,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
) -> DataFrame:
    """t-digest gap quantiles per partition via applyInPandas — the
    custom-sketch path the north_star names explicitly.

    Sandbox shape: one grouped Arrow batch per partition builds one
    digest. At 100 TB the same TDigest.merge makes it a two-level
    treeAggregate: per-task partial digests → merged per partition (the
    class is mergeable and deterministic); Spark's built-in
    percentile_approx (used by :func:`gap_quantiles`) is the JVM-side
    equivalent and remains the default hot path.
    """
    import pandas as pd

    gaps = ts_gaps(df, conv_col, order_col, ts_col).filter(
        F.col("gap_seconds").isNotNull()
    )
    if partition_col is None:
        gaps = gaps.withColumn("part", F.lit("__all__"))
    else:
        pcol = (
            F.col(partition_col) if isinstance(partition_col, str) else partition_col
        )
        gaps = gaps.withColumn("part", pcol.cast("string"))
    qlist = list(quantiles)

    def digest(pdf: pd.DataFrame) -> pd.DataFrame:
        td = TDigest(delta=delta)
        td.add_sorted(sorted(pdf["gap_seconds"].tolist()))
        row = [pdf["part"].iloc[0]] + [
            round(td.quantile(q), 6) for q in qlist
        ] + [len(pdf)]
        cols = ["part"] + [f"p{int(q * 100)}" for q in qlist] + ["n_gaps"]
        return pd.DataFrame([row], columns=cols)

    schema = (
        "part string, "
        + ", ".join(f"p{int(q * 100)} double" for q in qlist)
        + ", n_gaps long"
    )
    return gaps.select("part", "gap_seconds").groupBy("part").applyInPandas(
        digest, schema
    )


def gap_quantiles_discrete(
    df: DataFrame,
    partition_col: Column | str | None = None,
    quantile_fracs: list[tuple[int, int]] = ((1, 2), (9, 10), (99, 100)),
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
) -> DataFrame:
    """Exact DISCRETE gap quantiles in integer microseconds — the
    oracle-parity variant: every output column is a long, so the value
    serialization is bit-identical across engines (no float interpolation,
    no double rounding; CLAUDE.md invariant: prefer int outputs).

    Quantile q = num/den picks the element at rank ceil(q*n) computed in
    pure integer arithmetic ((num*n + den - 1) div den) over a per-part
    rank window. Two shuffles (conv window for lag, part window for rank);
    the approx :func:`gap_quantiles` remains the 100 TB hot path — this is
    the exact verifier.
    """
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    w = Window.partitionBy(conv_col).orderBy(
        # NULLS LAST pinned (Spark defaults nulls-first, DuckDB twin
        # nulls-last — unpinned NULL keys shift every lag)
        F.col(order_col).asc_nulls_last(), F.col(ts_col).asc_nulls_last()
    )
    gaps = df.withColumn(
        "gap_us", us(F.col(ts_col)) - F.lag(us(F.col(ts_col))).over(w)
    ).filter(F.col("gap_us").isNotNull())
    if partition_col is None:
        gaps = gaps.withColumn("part", F.lit("__all__"))
    else:
        pcol = F.col(partition_col) if isinstance(partition_col, str) else partition_col
        gaps = gaps.withColumn("part", pcol)
    pw = Window.partitionBy("part")
    ranked = gaps.select(
        "part",
        "gap_us",
        F.row_number().over(pw.orderBy("gap_us")).alias("rn"),
        F.count(F.lit(1)).over(pw).alias("n"),
    )
    aggs = [
        F.max(
            F.when(
                F.col("rn") == F.expr(f"({num} * n + {den} - 1) div {den}"),
                F.col("gap_us"),
            )
        ).alias(f"p{num * 100 // den}_us")
        for num, den in quantile_fracs
    ] + [
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        F.sum((F.col("gap_us") < 0).cast("long")).alias("n_negative_gaps"),
        F.count(F.lit(1)).alias("n_gaps"),
    ]
    return ranked.groupBy("part").agg(*aggs)


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
