"""Smoke tests of the driver contract module."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert df.columns == ["conv_id", "turn_idx", "part", "check_name", "violation"] or (
        "violation" in df.columns
    )
    assert len(rows) > 0


def test_queries_and_oracles_consistent():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every oracled query has a non-empty SQL string
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())
    # every query is oracled (round 2: sketch queries gained exact twins)
    assert set(qs) == set(oracles)
