"""ValidationRun — the end-to-end pipeline (SURVEY.md §3.3 Spark lifecycle).

source scan (pending partitions only) → fused row-check projection →
fork: violations (explode, stable order) / per-partition verdicts →
engine checks (uniqueness, referential, drift, gaps, stats) →
combined per-partition verdict → manifest record.

One scan feeds everything; shuffles: uniqueness groupBy (salted),
verdict/histogram groupBys (partition-keyed, AQE-coalesced), the lag
window (conv-keyed). RI joins are broadcast. At 100 TB each stage's
shuffle carries aggregates, not rows — the only row-volume movement is
the window for ts-gaps and the violations sort, both keyed to stay skew-
safe (salting + repartitionByRange).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pacts_spark.checkpoint import ValidationManifest
from pacts_spark.checks import (
    category_histogram,
    column_stats,
    drift_scores,
    gap_quantiles,
    ri_violations,
    uniqueness_violations,
)
from pacts_spark.engine import PactsEngine


@dataclass
class RunResult:
    validated: DataFrame
    violations: DataFrame
    verdicts: DataFrame
    stats: DataFrame
    drift: DataFrame
    gaps: DataFrame
    extras: dict = field(default_factory=dict)


def day_part(ts_col: str = "ts") -> Column:
    """days(ts) partition expression (FIXTURES.md §1 partitioning)."""
    return F.to_date(F.col(ts_col)).cast("string")


class ValidationRun:
    def __init__(
        self,
        engine: PactsEngine,
        manifest: ValidationManifest | None = None,
        category: str = "transcripts",
        name: str = "turn",
    ) -> None:
        self.engine = engine
        self.manifest = manifest
        self.category = category
        self.name = name

    def run(
        self,
        spark: SparkSession,
        transcripts: DataFrame,
        conversations: DataFrame | None = None,
        tools: DataFrame | None = None,
        baseline_role_hist: DataFrame | None = None,
        run_id: str = "run-0",
        seq: int = 0,
    ) -> RunResult:
        part = day_part()

        if self.manifest is not None:
            transcripts = self.manifest.filter_pending(spark, transcripts, part)

        # ---- row-level schema checks (one fused projection, no shuffle)
        validated = self.engine.validate_data(transcripts, self.category, self.name)

        # ---- violations fork: row checks + engine checks, unioned in one
        #      (conv_id, turn_idx, check, violation) shape
        row_viol = self.engine.explode_violations(
            validated, ["conv_id", "turn_idx"], extra_cols=[part.alias("part")]
        ).select(
            "conv_id", "turn_idx", "part",
            F.lit("schema").alias("check"), "violation",
        )

        uniq = uniqueness_violations(
            transcripts, ["conv_id", "turn_idx"], salt_col="text"
        ).select(
            "conv_id", "turn_idx", part.alias("part"),
            F.lit("uniqueness").alias("check"), "violation",
        )

        viol_parts = [row_viol, uniq]
        if conversations is not None:
            viol_parts.append(
                ri_violations(transcripts, conversations, "conv_id").select(
                    "conv_id", "turn_idx", part.alias("part"),
                    F.lit("referential_conv").alias("check"), "violation",
                )
            )
        if tools is not None:
            viol_parts.append(
                ri_violations(transcripts, tools, "tool").select(
                    "conv_id", "turn_idx", part.alias("part"),
                    F.lit("referential_tool").alias("check"), "violation",
                )
            )
        violations = viol_parts[0]
        for v in viol_parts[1:]:
            violations = violations.unionByName(v)
        violations = violations.repartitionByRange(
            "conv_id", "turn_idx"
        ).sortWithinPartitions("conv_id", "turn_idx", "check", "violation")

        # ---- per-partition verdict: row verdicts + per-check counts
        row_verd = self.engine.partition_verdicts(validated, part)
        extra_counts = (
            violations.filter(F.col("check") != "schema")
            .groupBy("part")
            .agg(F.count(F.lit(1)).alias("n_check_violations"))
        )
        verdicts = (
            row_verd.join(extra_counts, "part", "left")
            .fillna(0, subset=["n_check_violations"])
            .withColumn(
                "n_violations", F.col("n_violations") + F.col("n_check_violations")
            )
            .withColumn("pass", F.col("pass") & (F.col("n_check_violations") == 0))
            .drop("n_check_violations")
        )

        # ---- metrics
        stats = column_stats(
            transcripts,
            ["conv_id", "turn_idx", "role", "text", "tool"],
            partition_col=part,
        )
        role_hist = category_histogram(transcripts, "role", part)
        baseline = (
            baseline_role_hist
            if baseline_role_hist is not None
            else category_histogram(transcripts, "role")
        )
        drift = drift_scores(role_hist, baseline)
        gaps = gap_quantiles(transcripts, partition_col=part)

        if self.manifest is not None:
            self.manifest.record(verdicts, run_id=run_id, seq=seq)

        return RunResult(
            validated=validated,
            violations=violations,
            verdicts=verdicts,
            stats=stats,
            drift=drift,
            gaps=gaps,
        )
