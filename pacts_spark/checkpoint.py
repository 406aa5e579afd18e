"""Checkpointed resume: per-partition lineage + metrics manifest.

Lifts the reference's schema-cache idea (parse once, skip on hit —
SchemaLoader.java:82-95) from schemas to RUN STATE: a manifest table keyed
by table partition records (status, metrics, run_id, lineage); a restarted
run anti-joins its partition list against the manifest and processes only
pending partitions (north_star: "interrupted runs resume skipping
validated partitions").

Storage: this sandbox has no Iceberg jars, so the manifest is an
append-only parquet directory — each ``record()`` writes new files (atomic
at file granularity; readers take the LATEST status per partition by
``finished_seq``). In production this is an Iceberg table::

    CREATE TABLE catalog.db.validation_manifest (
      part string, status string, n_rows bigint, n_violations bigint,
      pass boolean, run_id string, lineage string, finished_seq bigint)
    USING iceberg PARTITIONED BY (run_id)

and ``record()`` becomes a MERGE INTO (idempotent upsert); the engine code
is unchanged — only the reader/writer format string differs.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = (
    "part string, status string, n_rows long, n_violations long, "
    "pass boolean, run_id string, lineage string, finished_seq long"
)


class ValidationManifest:
    def __init__(self, path: str | Path) -> None:
        self.path = str(path)

    def _exists(self) -> bool:
        p = Path(self.path)
        return p.exists() and any(p.glob("*.parquet"))

    def read(self, spark: SparkSession) -> DataFrame:
        if not self._exists():
            return spark.createDataFrame([], MANIFEST_SCHEMA)
        return spark.read.schema(MANIFEST_SCHEMA).parquet(self.path)

    def validated_parts(self, spark: SparkSession) -> DataFrame:
        """Latest-status-wins per partition; only 'validated' survive."""
        m = self.read(spark)
        latest = m.groupBy("part").agg(F.max("finished_seq").alias("finished_seq"))
        return (
            m.join(latest, ["part", "finished_seq"])
            .filter(F.col("status") == "validated")
            .select("part")
            .distinct()
        )

    def filter_pending(
        self, spark: SparkSession, df: DataFrame, part_expr
    ) -> DataFrame:
        """Drop rows of already-validated partitions. The manifest side is
        tiny (one row per partition) → broadcast anti-join, zero shuffle of
        the fact side. On Iceberg the same predicate becomes partition
        pruning at the scan (``WHERE part NOT IN (...)`` over partition
        metadata — no data files of validated partitions are even opened)."""
        done = F.broadcast(self.validated_parts(spark))
        # manifest parts are strings; normalize the tag so DATE-typed
        # partition expressions join correctly
        tagged = df.withColumn("__part", part_expr.cast("string"))
        return (
            tagged.join(done, tagged["__part"] == done["part"], "left_anti")
            .drop("__part")
        )

    def record(
        self,
        verdicts: DataFrame,
        run_id: str,
        seq: int,
        lineage: str = "",
        status_col: str = "pass",
    ) -> None:
        """Append per-partition outcomes. ``seq`` is a caller-supplied
        monotone sequence (injected, never now() — SURVEY.md §7(d));
        latest-seq-wins on read makes re-recording idempotent."""
        out = verdicts.select(
            F.col("part").cast("string").alias("part"),
            F.when(F.col(status_col), F.lit("validated"))
            .otherwise(F.lit("failed"))
            .alias("status"),
            F.col("n_rows").cast("long"),
            F.col("n_violations").cast("long"),
            F.col(status_col).alias("pass"),
            F.lit(run_id).alias("run_id"),
            F.lit(lineage).alias("lineage"),
            F.lit(seq).cast("long").alias("finished_seq"),
        )
        out.write.mode("append").parquet(self.path)
