"""End-to-end ValidationRun + checkpoint/resume tests (SURVEY.md §5.2(4))."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pacts_spark.checkpoint import ValidationManifest
from pacts_spark.runner import ValidationRun, day_part
from pacts_spark.transcripts import (
    conversations_dim,
    tools_dim,
    transcripts_from_events,
)


@pytest.fixture(scope="module")
def transcripts(spark, events_small):
    return transcripts_from_events(events_small).cache()


def test_full_run_shapes(spark, engine, events_small, transcripts):
    run = ValidationRun(engine)
    res = run.run(
        spark,
        transcripts,
        conversations=conversations_dim(events_small),
        tools=tools_dim(spark),
    )
    verd = res.verdicts.collect()
    assert len(verd) > 0
    assert set(res.verdicts.columns) == {
        "part", "pass", "n_violations", "n_invalid_rows", "n_rows"}
    # injected violations must surface in every check family
    checks = {r.check for r in res.violations.select("check").distinct().collect()}
    assert checks == {"schema", "uniqueness", "referential_conv", "referential_tool"}
    # totals line up: verdict counts == violations table counts
    n_viol = res.violations.count()
    assert sum(r.n_violations for r in verd) == n_viol
    assert res.drift.count() == res.verdicts.count()
    assert res.gaps.count() == res.verdicts.count()


def test_violations_are_ordered_and_exact(spark, engine, transcripts):
    run = ValidationRun(engine)
    res = run.run(spark, transcripts)
    rows = res.violations.filter(F.col("check") == "schema").limit(5).collect()
    assert all(r.violation == "Required field missing: text" for r in rows)
    full = [
        (r.conv_id, r.turn_idx)
        for r in res.violations.toLocalIterator()
    ]
    assert full == sorted(full)  # global (conv_id, turn_idx) order


def test_resume_skips_validated_partitions(spark, engine, transcripts, tmp_path):
    manifest = ValidationManifest(tmp_path / "manifest")
    parts = [str(r.p) for r in transcripts.select(day_part().alias("p")).distinct().collect()]
    parts.sort()
    half = set(parts[: len(parts) // 2])

    # run 1 over only the first half of partitions; the caller records to
    # the manifest AFTER the run's outputs are (notionally) persisted —
    # run() itself never records (crash-safe resume ordering)
    first = transcripts.filter(day_part().cast("string").isin(list(half)))
    run = ValidationRun(engine, manifest=manifest)
    res1 = run.run(spark, first)
    manifest.record(res1.verdicts, run_id="run-1", seq=1)

    done = {r.part for r in manifest.validated_parts(spark).collect()}
    # partitions with any violation are 'failed', clean ones 'validated';
    # with injected violations most days fail — force-mark them validated to
    # exercise the skip path
    verd = manifest.read(spark)
    all_first = verd.select("part").distinct()
    manifest.record(
        all_first.withColumn("pass", F.lit(True))
        .withColumn("n_rows", F.lit(0))
        .withColumn("n_violations", F.lit(0)),
        run_id="run-1b",
        seq=2,
    )
    done = {r.part for r in manifest.validated_parts(spark).collect()}
    assert done == half

    # run 2 over everything: must process ONLY the second half
    pending = manifest.filter_pending(spark, transcripts, day_part())
    seen = {str(r.p) for r in pending.select(day_part().alias("p")).distinct().collect()}
    assert seen == set(parts) - half

    res2 = run.run(spark, transcripts)
    parts2 = {str(r.part) for r in res2.verdicts.select("part").collect()}
    assert parts2 == set(parts) - half


def test_manifest_latest_seq_wins(spark, tmp_path):
    m = ValidationManifest(tmp_path / "m2")
    verd = spark.createDataFrame(
        [("2025-01-01", False, 10, 5)], "part string, pass boolean, n_rows long, n_violations long"
    )
    m.record(verd, run_id="a", seq=1)
    assert m.validated_parts(spark).count() == 0
    verd2 = verd.withColumn("pass", F.lit(True))
    m.record(verd2, run_id="b", seq=2)
    assert {r.part for r in m.validated_parts(spark).collect()} == {"2025-01-01"}


def test_run_and_write(spark, engine, transcripts, tmp_path):
    from pacts_spark.transcripts import tools_dim

    run = ValidationRun(engine, manifest=ValidationManifest(tmp_path / "m3"))
    out = run.run_and_write(
        spark, transcripts, str(tmp_path / "out"), tools=tools_dim(spark),
        run_id="rw-1", seq=1,
    )
    vio = spark.read.parquet(out["violations_path"])
    verd = spark.read.parquet(out["verdicts_path"])
    assert vio.count() > 0
    assert set(verd.columns) == {"part", "n_rows", "n_violations", "n_invalid_rows", "pass"}
    # verdict totals must agree with the written violations
    tot_v = verd.agg(F.sum("n_violations")).collect()[0][0]
    assert tot_v == vio.count()
    # equivalence with the lazy run(): same per-part violation counts
    res = ValidationRun(engine).run(spark, transcripts, tools=tools_dim(spark))
    lazy_counts = {
        str(r.part): r.n_violations for r in res.verdicts.collect()
    }
    written_counts = {str(r.part): r.n_violations for r in verd.collect()}
    assert lazy_counts == written_counts


def test_run_sequence_checks_opt_in(spark, engine, transcripts):
    res = ValidationRun(engine).run(spark, transcripts, sequence_checks=True)
    seq = res.violations.filter(F.col("check") == "sequence")
    n = seq.count()
    assert n > 0  # the derived fixture injects gaps/regressions by design
    kinds = {r.violation.split(" ")[0] for r in seq.limit(200).collect()}
    assert kinds <= {"Missing", "Timestamp", "Role"}
    # default-off keeps existing outputs byte-stable
    res_off = ValidationRun(engine).run(spark, transcripts)
    assert res_off.violations.filter(F.col("check") == "sequence").count() == 0


def test_run_shape_checks_opt_in(spark, engine, transcripts):
    res = ValidationRun(engine).run(
        spark, transcripts, shape_checks=True,
        shape_kwargs={"close_roles": ("assistant",), "min_turns": 5},
    )
    sh = res.violations.filter(F.col("check") == "shape")
    rows = sh.limit(500).collect()
    assert rows  # fixture conversations don't all end with assistant
    assert all(r.violation.startswith("Conversation") for r in rows)
    assert all(r.part is not None for r in rows)  # anchor part carried
    # default-off keeps existing outputs byte-stable
    res_off = ValidationRun(engine).run(spark, transcripts)
    assert res_off.violations.filter(F.col("check") == "shape").count() == 0
