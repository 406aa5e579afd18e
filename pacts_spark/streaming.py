"""Structured Streaming validation: the AMQP consume-validate path
re-expressed (TestListener.handleMessage, java/src/test/.../TestListener.java:33-57;
produce side SpringBootMessageTest.java:54-78).

The reference consumes JSON envelope bytes from RabbitMQ, parses,
validates, and projects fields. Spark-first equivalent: any streaming
source (file/kafka/rate) → ``from_json`` envelope parse →
the SAME compiled validation projection used in batch (the compiler is
source-agnostic: a Column tree doesn't care whether the plan is batch or
micro-batch) → fork valid rows to the sink and violations to the
violations sink via ``foreachBatch``.

Late/out-of-order turns: watermark on ``ts`` bounds state for any
windowed aggregation (per-partition verdict over event-time windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pacts_spark.engine import PactsEngine


def validate_stream(
    engine: PactsEngine,
    stream: DataFrame,
    category: str,
    name: str,
    json_col: str | None = None,
) -> DataFrame:
    """Attach the compiled validation projection to a streaming DataFrame.
    Identical semantics to the batch path — same compiler output."""
    return engine.validate_data(stream, category, name, json_col=json_col)


def windowed_verdicts(
    validated: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-event-time-window pass/fail verdict with bounded state:
    watermark drops turns later than ``watermark``; the aggregation state
    per window is a handful of counters (streaming-safe partial aggs)."""
    return (
        validated.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"))
        .agg(
            F.every("valid").alias("pass"),
            F.sum(F.size("errors")).alias("n_violations"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "pass",
            "n_violations",
            "n_rows",
        )
    )


def fork_sinks(
    validated: DataFrame,
    valid_path: str,
    violations_path: str,
    checkpoint_dir: str,
    key_cols: list[str] = ("conv_id", "turn_idx"),
):
    """writeStream.foreachBatch gate: valid rows → output table, violations
    → violations table (the streaming analogue of sendValidatedData's
    valid/invalid fork, PactsService.java:106-122).

    Exactly-once: each micro-batch writes into its own ``batch_id=N``
    partition with DYNAMIC partition overwrite — a replayed batch (failure
    between sink write and checkpoint commit) overwrites exactly its own
    partition instead of appending duplicates, making the sink idempotent
    per batch id. (On Iceberg this becomes REPLACE WHERE batch_id = N.)"""

    def sink(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            (
                batch.filter(F.col("valid"))
                .drop("errors", "valid", "error_message")
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(valid_path)
            )
            (
                batch.filter(~F.col("valid"))
                .select(*key_cols, F.posexplode("errors").alias("error_idx", "violation"))
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(violations_path)
            )
        finally:
            batch.unpersist()

    return (
        validated.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
