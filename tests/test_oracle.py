"""Golden-semantics tests of the differential oracle itself, ported 1:1 from
the reference test suite (SURVEY.md §5.1; FIXTURES.md §4). If these fail the
oracle is wrong and every differential test downstream is meaningless."""

from __future__ import annotations

import json
from pathlib import Path

from pacts_spark import errors as E
from pacts_spark.oracle import validate_data, validate_envelope

REPO = Path(__file__).resolve().parent.parent
INV_ITEM = json.loads(
    (REPO / "schemas/bees/v1/inventory/inventory_item.json").read_text()
)
SCHEMAS = {"inventory/inventory_item": INV_ITEM}


def test_valid_payload():
    # rust/src/lib.rs:62-84 happy path {slot, material, amount}
    r = validate_data({"slot": 1, "material": "Paper", "amount": 2}, INV_ITEM)
    assert r.valid and r.errors == []
    assert r.error_message == "Validation successful"


def test_missing_required_ordered():
    # FIXTURES.md §4: required[] order material, amount (schema-array order)
    r = validate_data({"slot": 1}, INV_ITEM)
    assert r.errors == [
        "Required field missing: material",
        "Required field missing: amount",
    ]


def test_wrong_property_type():
    r = validate_data({"slot": "one", "material": "x", "amount": 2}, INV_ITEM)
    assert r.errors == ["Invalid type for field 'slot'. Expected: integer"]


def test_float_is_not_integer():
    # Jackson isIntegralNumber: 5.0 rejected (SURVEY.md §1.2)
    r = validate_data({"slot": 5.0, "material": "x", "amount": 2}, INV_ITEM)
    assert r.errors == ["Invalid type for field 'slot'. Expected: integer"]


def test_bool_is_not_integer_or_number():
    r = validate_data({"slot": True, "material": "x", "amount": False}, INV_ITEM)
    assert r.errors == [
        "Invalid type for field 'slot'. Expected: integer",
        "Invalid type for field 'amount'. Expected: number",
    ]


def test_array_payload_vs_object_schema():
    # FIXTURES.md §4: all required missing + top-level type error, in order
    r = validate_data([], INV_ITEM)
    assert r.errors == [
        "Required field missing: slot",
        "Required field missing: material",
        "Required field missing: amount",
        "Invalid type. Expected: object",
    ]


def test_explicit_null_passes_required_fails_type():
    # Validator.java:123 has() → present; then type check fails (SURVEY §7b)
    r = validate_data({"slot": 1, "material": None, "amount": 2}, INV_ITEM)
    assert r.errors == ["Invalid type for field 'material'. Expected: string"]


def test_nested_not_recursed():
    # SpringBootMessageTest.java:192-231: deep nbt_data only checked as 'object'
    payload = {
        "slot": 1,
        "material": "DIAMOND_SWORD",
        "amount": 1,
        "nbt_data": {"display": {"Name": {"deep": [1, {"x": None}]}}},
        "enchantment_data": [{"id": "sharpness", "lvl": 5}],
    }
    r = validate_data(payload, INV_ITEM)
    assert r.valid


def test_unknown_type_name_passes():
    # Validator.java:106-107: default -> true
    schema = {"type": "object", "properties": {"x": {"type": "uuid"}}, "required": []}
    assert validate_data({"x": 123}, schema).valid


def test_integer_accepts_int_for_number():
    r = validate_data({"slot": 1, "material": "x", "amount": 7}, INV_ITEM)
    assert r.valid


def test_header_required():
    # Validator.java:43-46; rust lib.rs:124-141 asserts exactly one error
    r = validate_envelope(None, {"slot": 1}, SCHEMAS)
    assert r.errors == ["Header is required"]
    r2 = validate_envelope(
        {"schema_category": "", "schema_name": "", "schema_version": ""},
        {},
        SCHEMAS,
    )
    assert r2.errors == ["Header is required"]


def test_coordinate_errors_and_not_found():
    h = {"schema_category": "cat", "schema_name": "name", "schema_version": "v1"}
    r = validate_envelope(h, {}, SCHEMAS)
    assert r.errors == ["Schema not found: cat/name"]
    h2 = {"schema_category": "inventory", "schema_name": "inventory_item",
          "schema_version": None}
    r2 = validate_envelope(h2, {"slot": 1, "material": "x", "amount": 1}, SCHEMAS)
    assert r2.errors == ["Schema version is required in header"]


def test_error_message_joining():
    # rust/src/lib.rs:152-161: "Error 1; Error 2"
    from pacts_spark.oracle import ValidationResult

    r = ValidationResult(valid=False, errors=["Error 1", "Error 2"])
    assert r.error_message == "Error 1; Error 2"


def test_validation_failed_wrapper():
    assert E.validation_failed("Required field missing: x") == (
        "Validation failed: Required field missing: x"
    )


def test_json_validator_twin_parity_on_poisoned_props(spark, tmp_path):
    """Regression (round 5 poisoned-fixture sweep): the
    validate_events_json twin must replay the validator STRUCTURALLY —
    NULL props (= JSON null payload), non-JSON strings (engine embeds
    Python's char-0 parser message), explicit-null fields (has()
    semantics: present but wrong type), non-integral k — instead of
    assuming the clean fixture's '{"k": n}' shape. Runs engine and the
    ACTUAL twin SQL side by side on a poisoned mini-corpus."""
    import duckdb

    import __spark_entry__ as entrymod

    props = [
        None,                               # JSON null payload
        "",                                 # non-JSON: char-0 parser error
        "not json",                         # non-JSON
        '{"turn_idx": 2}',                  # object, k and v absent
        '{"k": null}',                      # k PRESENT as explicit null
        '{"k": 9.5, "v": 1}',               # k present, non-integral
        '{"k": "3", "v": 1}',               # k present, string
        '{"k": 2, "v": 1}',                 # fully valid
        "[1, 2]",                           # top-level array
        "5",                                # top-level scalar
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(props)], "event_id long, props string"
    )
    got = {
        r.event_id: (r.valid, r.error_message)
        for r in entrymod._engine()
        .validate_data(df, "events", "props_check", json_col="props")
        .select("event_id", "valid", "error_message")
        .collect()
    }

    pq = str(tmp_path / "ev.parquet")
    df.write.parquet(pq)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    oracle = {
        int(r[0]): (bool(r[1]), r[2])
        for r in con.execute(
            entrymod.oracle_sql()["validate_events_json"]
        ).fetchall()
    }
    assert got == oracle
    # pin the load-bearing strings once, so a twin rewrite can't drift
    assert got[4] == (
        False,
        "Required field missing: v; Invalid type for field 'k'. Expected: integer",
    )
    assert got[7] == (True, "Validation successful")
    assert got[9][1] == (
        "Required field missing: k; Required field missing: v; "
        "Invalid type. Expected: object"
    )
