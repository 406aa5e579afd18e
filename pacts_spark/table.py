"""Table-format adapter: the three Iceberg touchpoints behind ONE seam.

The north_star runs over an Iceberg transcripts table; this sandbox has no
Iceberg runtime, so the engine ships a parquet implementation with the
SAME three operations Iceberg provides, and an Iceberg adapter whose
methods issue the real statements but refuse loudly when the runtime is
absent. Swapping formats in production is a constructor choice
(``get_adapter("iceberg")``), not a rewrite:

1. **Partition-pruned resume scan** (`scan_pending`) — exclude
   already-validated partitions AT THE SOURCE. Parquet: a static NOT-IN
   predicate over the physical partition column lands in the scan's
   ``PartitionFilters`` (pruned directories are never even listed —
   pinned by tests/test_plan_shapes.py). Iceberg: the same predicate is
   evaluated against partition metadata (manifest files), no data file of
   a validated partition is opened.
2. **REPLACE-WHERE idempotent write** (`replace_where`) — overwrite
   exactly the partitions present in the incoming frame. Parquet: dynamic
   partition overwrite (what fork_sinks' exactly-once batch_id sink and
   the runner rely on). Iceberg: ``overwritePartitions()`` (dynamic
   REPLACE WHERE), atomic at snapshot granularity.
3. **Manifest upsert** (`manifest_upsert`) — record per-partition
   verdicts idempotently. Parquet: append + latest-``finished_seq``-wins
   on read (pacts_spark.checkpoint.ValidationManifest — re-recording a
   partition is harmless). Iceberg: a real ``MERGE INTO`` keyed on
   (part, run_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pacts_spark.checkpoint import ValidationManifest

# above this many validated partitions the static NOT-IN literal list
# stops being sensible plan text; fall back to the broadcast anti-join
# (still tiny: one row per partition). 10 years of daily partitions fits.
MAX_STATIC_PRUNE_PARTS = 5000


class ParquetTableAdapter:
    """Default adapter over (optionally hive-partitioned) parquet."""

    format = "parquet"

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        """``table`` is a path (contains '/' or endswith .parquet) or a
        catalog identifier — the rule jobs/validate_job.py documents."""
        if "/" in table or table.endswith(".parquet"):
            return spark.read.parquet(table)
        return spark.read.table(table)

    def scan_pending(
        self,
        spark: SparkSession,
        table: str,
        manifest: ValidationManifest,
        part_col: str = "part",
    ) -> DataFrame:
        """Resume scan skipping validated partitions AT THE SOURCE.

        When ``part_col`` is a physical partition column of the table, the
        NOT-IN predicate becomes a PartitionFilter: directories of
        validated partitions are pruned during file listing, so a resumed
        run's I/O is proportional to PENDING data only — the property that
        makes resume useful at 100 TB (the broadcast anti-join fallback
        still reads every file and drops rows after decode).
        """
        df = self.read(spark, table)
        done_df = manifest.validated_parts(spark)
        if part_col in df.columns:
            done = [r.part for r in done_df.collect()]  # 1 row per partition
            if not done:
                return df
            if len(done) <= MAX_STATIC_PRUNE_PARTS:
                # NULL-safe: `~isin` is NULL for a NULL partition value
                # (e.g. __HIVE_DEFAULT_PARTITION__ → NULL after cast),
                # which would silently drop those rows from a resumed
                # scan while the anti-join branch keeps them — keep NULL
                # partitions pending in both branches
                pc = F.col(part_col).cast("string")
                return df.filter(pc.isNull() | ~pc.isin(done))
            return df.join(
                F.broadcast(done_df.withColumnRenamed("part", "__done")),
                df[part_col].cast("string") == F.col("__done"),
                "left_anti",
            )
        # table not physically partitioned by part_col: the caller derives
        # partitions (day_part on ts) — row-level anti-join is all there is
        return manifest.filter_pending(spark, df, F.col("ts").cast("date"))

    def replace_where(
        self, df: DataFrame, table: str, part_cols: list[str]
    ) -> None:
        """Idempotent partition-scoped overwrite: replaces exactly the
        ``part_cols`` partitions present in ``df`` (a replayed write —
        retry, streaming batch redelivery — converges instead of
        duplicating)."""
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*part_cols)
            .parquet(table)
        )

    def manifest_upsert(
        self,
        verdicts: DataFrame,
        manifest: ValidationManifest,
        run_id: str,
        seq: int,
        lineage: str = "",
    ) -> None:
        manifest.record(verdicts, run_id=run_id, seq=seq, lineage=lineage)


class IcebergTableAdapter:
    """Iceberg implementation of the same seam. Methods issue the real
    Iceberg statements; construction-time probe refuses loudly when the
    runtime is not on the classpath (this sandbox), so a misconfigured
    cluster fails at wiring time, not mid-run."""

    format = "iceberg"

    def __init__(self, spark: SparkSession) -> None:
        from pacts_spark.session import jvm_class_present

        # probe SPARK's classloader, not the system one: runtime-added
        # jars are invisible to a bare Class.forName (review finding)
        if not jvm_class_present(
            spark, "org.apache.iceberg.spark.source.SparkTable"
        ):
            raise RuntimeError(
                "Iceberg runtime not on the classpath; add the "
                "iceberg-spark-runtime jar and a catalog config "
                "(spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog)"
            )
        self._spark = spark

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.table(table)

    def scan_pending(
        self,
        spark: SparkSession,
        table: str,
        manifest: ValidationManifest,
        part_col: str = "part",
    ) -> DataFrame:
        df = self.read(spark, table)
        done = [r.part for r in manifest.validated_parts(spark).collect()]
        if not done:
            return df
        # Iceberg evaluates this predicate against partition metadata in
        # the manifest files — validated partitions' data files never open
        return df.filter(~F.col(part_col).cast("string").isin(done))

    def replace_where(
        self, df: DataFrame, table: str, part_cols: list[str]
    ) -> None:
        # dynamic REPLACE WHERE: atomically replaces the partitions present
        # in df (snapshot-isolated; concurrent readers see old-or-new)
        df.writeTo(table).overwritePartitions()

    def manifest_upsert(
        self,
        verdicts: DataFrame,
        manifest: ValidationManifest,
        run_id: str,
        seq: int,
        lineage: str = "",
    ) -> None:
        """Real upsert keyed (part, run_id): MERGE INTO the manifest
        TABLE (``manifest.path`` is a catalog identifier here)."""
        verdicts.createOrReplaceTempView("__pacts_manifest_delta")
        self._spark.sql(
            f"""
            MERGE INTO {manifest.path} t
            USING (
              SELECT CAST(part AS STRING) AS part,
                     CASE WHEN pass THEN 'validated' ELSE 'failed' END AS status,
                     CAST(n_rows AS BIGINT) AS n_rows,
                     CAST(n_violations AS BIGINT) AS n_violations,
                     pass, '{run_id}' AS run_id, '{lineage}' AS lineage,
                     CAST({seq} AS BIGINT) AS finished_seq
              FROM __pacts_manifest_delta
            ) s
            ON t.part = s.part AND t.run_id = s.run_id
            WHEN MATCHED AND s.finished_seq >= t.finished_seq THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *
            """
        )


def get_adapter(fmt: str, spark: SparkSession | None = None):
    if fmt == "parquet":
        return ParquetTableAdapter()
    if fmt == "iceberg":
        if spark is None:
            raise ValueError("iceberg adapter needs the SparkSession (probe)")
        return IcebergTableAdapter(spark)
    raise ValueError(f"unknown table format: {fmt!r}")
