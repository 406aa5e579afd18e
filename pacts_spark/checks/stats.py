"""Per-column statistics checks (north_star: null-rate, min/max, distinct).

Generalizes the reference's required-field check (Validator.java:118-128)
from a per-row verdict to per-partition column health metrics.

Scale design: one ``groupBy(partition)`` pass computes ALL per-column
aggregates in a single shuffle — partial aggregation (map-side combine)
means the shuffle carries one row per (mapper, partition), not per input
row. ``approx_count_distinct`` is an HLL sketch (mergeable, constant
memory); ``exact=True`` swaps in ``count_distinct`` for oracle-comparable
small-scale runs. At 100 TB the HLL path is the only sane one — rsd=0.01
costs ~24 KB per sketch regardless of cardinality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def column_stats(
    df: DataFrame,
    columns: list[str],
    partition_col: Column | str | None = None,
    exact_distinct: bool = False,
    rsd: float = 0.01,
) -> DataFrame:
    """Long-form stats: one output row per (partition, column) with
    null_ppm (integer parts-per-million null rate), n_nulls, n_rows,
    n_distinct; min/max as strings (heterogeneous column types in one
    long-form table).

    Single scan + single shuffle for all columns: per-column aggregates are
    computed wide (one groupBy), then unpivoted with ``stack`` — Catalyst
    keeps it one exchange.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"))
        aggs.append(
            (
                F.count_distinct(F.col(c))
                if exact_distinct
                else F.approx_count_distinct(c, rsd)
            ).alias(f"__distinct_{c}")
        )
        aggs.append(F.min(F.col(c).cast("string")).alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c).cast("string")).alias(f"__max_{c}"))

    if partition_col is None:
        wide = df.agg(*aggs).withColumn("part", F.lit("__all__"))
    else:
        pcol = F.col(partition_col) if isinstance(partition_col, str) else partition_col
        wide = df.groupBy(pcol.alias("part")).agg(*aggs)

    stack_args: list[str] = []
    for c in columns:
        stack_args.append(f"'{c}', `__nulls_{c}`, `__distinct_{c}`, `__min_{c}`, `__max_{c}`")
    stacked = wide.select(
        "part",
        "n_rows",
        F.expr(
            f"stack({len(columns)}, "
            + ", ".join(stack_args)
            + ") as (column, n_nulls, n_distinct, min_value, max_value)"
        ),
    )
    # null rate as integer parts-per-million (long): exact cross-engine
    # representation — float rates serialize differently between engines
    # (CLAUDE.md invariant: prefer int/string outputs)
    return stacked.select(
        "part",
        "column",
        "n_rows",
        "n_nulls",
        F.expr("n_nulls * 1000000 div n_rows").alias("null_ppm"),
        "n_distinct",
        "min_value",
        "max_value",
    )
