"""Structured Streaming validation tests: file-source micro-batches through
the same compiled validation as batch; windowed verdicts with watermark."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F


def test_stream_validation_matches_batch(spark, engine, tmp_path):
    src = tmp_path / "src"
    out_valid = tmp_path / "valid"
    out_viol = tmp_path / "viol"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    rows = [
        {"conv_id": "c1", "turn_idx": 1, "slot": 1, "material": "P", "amount": 2.0},
        {"conv_id": "c1", "turn_idx": 2, "slot": None, "material": "P", "amount": 2.0},
        {"conv_id": "c2", "turn_idx": 1, "slot": 3, "material": None, "amount": None},
    ]
    (src / "batch0.json").write_text("\n".join(json.dumps(r) for r in rows))

    schema = (
        "conv_id string, turn_idx int, slot int, material string, amount double"
    )
    stream = spark.readStream.schema(schema).json(str(src))
    assert stream.isStreaming

    from pacts_spark.streaming import fork_sinks, validate_stream

    validated = validate_stream(engine, stream, "inventory", "inventory_item")
    q = fork_sinks(
        validated, str(out_valid), str(out_viol), str(ckpt)
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)

    valid = spark.read.parquet(str(out_valid))
    viol = spark.read.parquet(str(out_viol))
    assert valid.count() == 1
    got = {(r.conv_id, r.turn_idx, r.violation) for r in viol.collect()}
    assert got == {
        ("c1", 2, "Required field missing: slot"),
        ("c2", 1, "Required field missing: material"),
        ("c2", 1, "Required field missing: amount"),
    }


def test_windowed_verdicts_batch_semantics(spark, engine):
    # windowed_verdicts is streaming-safe but semantics are testable on a
    # batch frame (same expressions)
    from pacts_spark.streaming import windowed_verdicts

    df = spark.createDataFrame(
        [
            ("c1", 1, "m", 2.0, 0),
            ("c1", None, "m", 2.0, 600),
            ("c2", 3, "m", 4.0, 7200),
        ],
        "conv_id string, slot int, material string, amount double, epoch long",
    ).select("*", F.timestamp_seconds("epoch").alias("ts"))
    validated = engine.validate_data(df, "inventory", "inventory_item")
    out = windowed_verdicts(validated, window="1 hour").orderBy("window_start").collect()
    assert len(out) == 2
    assert out[0]["pass"] is False and out[0].n_violations == 1
    assert out[1]["pass"] is True


def test_stream_restart_resumes_exactly_once(spark, engine, tmp_path):
    """Stop the stream, add data, restart from the SAME checkpoint: the
    restarted query must process only the new files, and re-delivery into
    the batch_id-partitioned sink must not duplicate earlier rows."""
    import json

    src = tmp_path / "src2"
    out_valid = tmp_path / "valid2"
    out_viol = tmp_path / "viol2"
    ckpt = tmp_path / "ckpt2"
    src.mkdir()

    def write_batch(name, rows):
        (src / name).write_text("\n".join(json.dumps(r) for r in rows))

    schema = "conv_id string, turn_idx int, slot int, material string, amount double"
    from pacts_spark.streaming import fork_sinks, validate_stream

    def run_available():
        stream = spark.readStream.schema(schema).json(str(src))
        validated = validate_stream(engine, stream, "inventory", "inventory_item")
        q = fork_sinks(
            validated, str(out_valid), str(out_viol), str(ckpt)
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    write_batch("b0.json", [
        {"conv_id": "c1", "turn_idx": 1, "slot": 1, "material": "P", "amount": 1.0},
        {"conv_id": "c1", "turn_idx": 2, "slot": None, "material": "P", "amount": 1.0},
    ])
    run_available()
    assert spark.read.parquet(str(out_valid)).count() == 1

    # second run with one NEW file — restart from checkpoint
    write_batch("b1.json", [
        {"conv_id": "c2", "turn_idx": 1, "slot": 2, "material": "Q", "amount": 2.0},
    ])
    run_available()
    valid = spark.read.parquet(str(out_valid))
    assert valid.count() == 2  # no re-processing of b0
    assert {r.conv_id for r in valid.collect()} == {"c1", "c2"}
    # batch ids are distinct partitions (idempotence unit)
    assert valid.select("batch_id").distinct().count() == 2
    # third run with NO new data: nothing changes
    run_available()
    assert spark.read.parquet(str(out_valid)).count() == 2
