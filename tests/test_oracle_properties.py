"""Property-based tests (hypothesis) of the oracle's reference semantics —
invariants that must hold for ANY schema/payload, derived from the
reference's validator structure (Validator.java:191-201)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pacts_spark.oracle import json_type_matches, validate_data

json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**31), max_value=2**31),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=20),
)
json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=8), children, max_size=4),
    ),
    max_leaves=10,
)
type_names = st.sampled_from(
    ["object", "array", "string", "number", "integer", "boolean", "null", "uuid", ""]
)
schemas = st.fixed_dictionaries(
    {},
    optional={
        "type": type_names,
        "required": st.lists(st.text(max_size=8), max_size=5),
        "properties": st.dictionaries(
            st.text(max_size=8),
            st.fixed_dictionaries({}, optional={"type": type_names}),
            max_size=5,
        ),
    },
)


@settings(max_examples=300, deadline=None)
@given(data=json_values, schema=schemas)
def test_error_order_follows_schema_order(data, schema):
    r = validate_data(data, schema)
    errs = r.errors
    assert r.valid == (not errs)
    # errors partition into: required block, then ≤1 top-type, then props block
    req_msgs = [f"Required field missing: {f}" for f in schema.get("required", [])]
    got_req = [e for e in errs if e.startswith("Required field missing: ")]
    assert got_req == [m for m in req_msgs if m in got_req]  # schema order kept
    top = [e for e in errs if e.startswith("Invalid type. ")]
    assert len(top) <= 1
    # block ordering: required* , top?, field-type*
    kinds = [
        0 if e.startswith("Required field missing: ")
        else 1 if e.startswith("Invalid type. ")
        else 2
        for e in errs
    ]
    assert kinds == sorted(kinds)


@settings(max_examples=300, deadline=None)
@given(data=json_values, schema=schemas)
def test_absent_properties_never_produce_type_errors(data, schema):
    r = validate_data(data, schema)
    if not isinstance(data, dict):
        # property checks run only on dict payloads (Validator.java:154-161)
        assert not any(e.startswith("Invalid type for field") for e in r.errors)
        return
    props = schema.get("properties", {})
    for e in r.errors:
        if e.startswith("Invalid type for field '"):
            # Recover the field name against the schema's own property names —
            # split("'")[1] breaks on names containing a quote (e.g. "'").
            matches = [
                p
                for p, ps in props.items()
                if e == f"Invalid type for field '{p}'. Expected: {ps.get('type')}"
            ]
            assert matches  # error corresponds to some schema property
            assert any(p in data for p in matches)  # only PRESENT fields error


def test_quote_named_field_regression():
    """Hypothesis counterexample from round 3: a property literally named "'".

    Payload {"'": None} with schema property "'" of type object: the field IS
    present (JSON null -> has() passes) and null is not an object, so the
    engine/oracle correctly emit the type error (Validator.java:154-176)."""
    r = validate_data({"'": None}, {"type": "object", "properties": {"'": {"type": "object"}}})
    assert r.errors == ["Invalid type for field '''. Expected: object"]


@settings(max_examples=200, deadline=None)
@given(data=json_values)
def test_unknown_and_empty_type_names_always_pass(data):
    assert json_type_matches(data, "uuid")
    assert json_type_matches(data, "")
    r = validate_data(
        {"x": data}, {"type": "object", "properties": {"x": {"type": "uuid"}}}
    )
    assert r.valid


@settings(max_examples=200, deadline=None)
@given(data=json_values)
def test_exactly_one_json_type_matches(data):
    # the 7 canonical names are mutually exclusive and exhaustive
    names = ["object", "array", "string", "number", "integer", "boolean", "null"]
    hits = [n for n in names if json_type_matches(data, n)]
    if isinstance(data, bool):
        assert hits == ["boolean"]
    elif isinstance(data, int):
        assert hits == ["number", "integer"]
    elif isinstance(data, float):
        assert hits == ["number"]
    else:
        assert len(hits) == 1


@settings(max_examples=200, deadline=None)
@given(
    data=st.dictionaries(st.text(max_size=6), json_values, max_size=5),
    req=st.lists(st.text(max_size=6), max_size=5),
)
def test_explicit_null_passes_required(data, req):
    schema = {"type": "object", "required": req}
    r = validate_data(data, schema)
    missing = {e.split(": ", 1)[1] for e in r.errors}
    for f in req:
        # present (even as None) → never in missing set (has() semantics)
        assert (f in missing) == (f not in data)
