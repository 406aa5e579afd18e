"""Envelope wire-format serde + end-to-end envelope validation
(PactsService.parseEnvelope/toJson parity, PactsService.java:127-136)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from pacts_spark.model import envelope_json, parse_envelopes


def test_parse_envelopes_roundtrip(spark):
    wire = {
        "header": {
            "schema_version": "v1",
            "schema_category": "inventory",
            "schema_name": "inventory_item",
            "timestamp": "2026-01-01T00:00:00Z",
            "content_type": "application/json",
        },
        "data": {"slot": 1, "material": "Paper", "amount": 2},
        "metadata": {"trace": "abc"},
    }
    df = spark.createDataFrame([(json.dumps(wire),)], "value string")
    parsed = parse_envelopes(df).collect()[0]
    assert parsed.header.schema_category == "inventory"
    assert parsed.header.schema_version == "v1"
    assert json.loads(parsed.data) == wire["data"]
    assert dict(parsed.metadata) == {"trace": "abc"}


def test_parse_then_validate_envelopes(spark, engine):
    good = {
        "header": {
            "schema_version": "v1",
            "schema_category": "inventory",
            "schema_name": "inventory_item",
        },
        "data": {"slot": 1, "material": "P", "amount": 2},
    }
    bad = {
        "header": {
            "schema_version": "v1",
            "schema_category": "inventory",
            "schema_name": "inventory_item",
        },
        "data": {"slot": "one", "material": "P", "amount": 2},
    }
    df = spark.createDataFrame(
        [(json.dumps(good),), (json.dumps(bad),)], "value string"
    )
    out = engine.validate_envelopes(parse_envelopes(df)).collect()
    assert out[0].valid
    assert list(out[1].errors) == ["Invalid type for field 'slot'. Expected: integer"]


def test_envelope_json_produces_parseable_wire(spark):
    df = spark.createDataFrame([('{"slot": 1}', )], "payload string")
    wire = df.select(
        envelope_json(
            F.col("payload"),
            version="v1",
            category="inventory",
            name="inventory_item",
            run_ts="2026-01-01T00:00:00Z",
            metadata=F.create_map(F.lit("k"), F.lit("v")),
        ).alias("value")
    )
    raw = wire.collect()[0].value
    obj = json.loads(raw)
    assert obj["header"]["schema_version"] == "v1"
    assert obj["header"]["timestamp"] == "2026-01-01T00:00:00Z"
    assert obj["header"]["content_type"] == "application/json"
    assert obj["data"] == {"slot": 1}
    assert obj["metadata"] == {"k": "v"}
    # and it parses back through the reader
    back = parse_envelopes(wire).collect()[0]
    assert back.header.schema_name == "inventory_item"
    assert json.loads(back.data) == {"slot": 1}
