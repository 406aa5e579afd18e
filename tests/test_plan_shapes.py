"""Physical-plan regression guards for the 100 TB properties.

PLANS.md documents the plans the engine is designed to produce; these
tests PIN the load-bearing shapes so a refactor cannot silently
reintroduce a scale-killer:

- no CartesianProduct anywhere in the driver-contract queries (the one
  deliberate cross join — drift's parts x categories grid — broadcasts
  an aggregate-sized side and must never degrade to a cartesian);
- the row validator against a MATERIALIZED table is scan -> projection
  with zero exchanges (the whole-corpus fast path);
- referential integrity is a broadcast LEFT ANTI hash join (never a
  shuffle join on the fact side);
- column stats compute every column's aggregates in ONE shuffle;
- the validator's scan is column-pruned to the columns the schema
  actually checks.

Plan text comes from queryExecution().executedPlan() BEFORE execution
(AQE's initial plan) — these are static properties of the compiled
plan, not runtime measurements.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from tests.conftest import SF_SMALL


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# queries whose construction executes Spark jobs (iterative/materializing
# operators): their RESULT plan is a scan of checkpointed labels, so the
# cartesian guard below would inspect the wrong thing anyway — and
# building them per-test is slow. They are covered by their own tests.
_CONSTRUCTION_EXECUTES = {"dedup_clusters_documents", "conversation_state_finals"}


def test_no_cartesian_product_in_any_contract_query(spark):
    bad = {}
    for name, fn in entry.queries().items():
        if name in _CONSTRUCTION_EXECUTES:
            continue
        plan = _plan(fn(spark, str(SF_SMALL)))
        if "CartesianProduct" in plan:
            bad[name] = plan
    assert not bad, f"cartesian products in: {sorted(bad)}"


def test_validator_is_scan_project_only_on_materialized_table(
    spark, engine, tmp_path
):
    """Against a materialized transcripts table (the production shape —
    the window shuffle in the contract queries belongs to the test
    fixture's events->transcripts derivation, not the validator), the
    compiled row validator must be scan -> codegen projection: NO
    exchange, NO Python."""
    path = str(tmp_path / "turns")
    entry._transcripts(spark, str(SF_SMALL)).write.parquet(path)
    t = spark.read.parquet(path)
    validated = engine.validate_data(t, "transcripts", "turn")
    plan = _plan(validated)
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan


def test_ri_check_is_broadcast_anti_join(spark):
    from pacts_spark.checks import ri_violations

    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    plan = _plan(
        ri_violations(
            orders, cust, "o_custkey", "c_custkey",
            select_cols=["o_orderkey", "o_custkey"],
        )
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_colstats_all_columns_in_one_shuffle(spark):
    from pacts_spark.checks import column_stats

    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    plan = _plan(
        column_stats(
            li,
            ["l_orderkey", "l_partkey", "l_returnflag"],
            partition_col="l_linestatus",
        )
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_validator_scan_is_column_pruned(spark, engine):
    """The orders check schema touches 5 of the table's 6 columns;
    o_orderpriority must not be read (ReadSchema pruning — at 100 TB an
    unpruned scan is the difference between reading checked columns and
    reading everything)."""
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    reg_engine = entry._engine()
    validated = reg_engine.validate_data(orders, "tpch", "orders_check").select(
        "o_orderkey", "valid", "error_message"
    )
    plan = _plan(validated)
    assert "o_orderpriority" not in plan, plan
    assert "o_orderdate" not in plan, plan


def test_df_cap_broadcasts_hot_set_not_kept_set(spark):
    """The df-cap inverted indexes (n-gram Jaccard, winnow overlap) must
    broadcast only the small HOT set (df > cap, boilerplate by
    construction) as a LeftAnti removal — never the corpus-sized kept
    set. A BroadcastHashJoin with Inner join type on the shingle /
    fingerprint key is exactly the 100 TB driver-OOM plan this guards
    against."""
    from pacts_spark.datapipe.dedup import ngram_jaccard_pairs
    from pacts_spark.datapipe.textstats import winnow_overlap_pairs

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    for q in (
        ngram_jaccard_pairs(docs),
        winnow_overlap_pairs(docs),
    ):
        # assert on the optimized LOGICAL plan's explicit hints: at tiny
        # SF Catalyst's stats-based planner broadcasts the small self-join
        # sides too, which is size-driven and correct — the scale defect
        # is an explicit broadcast() HINT, which forces the broadcast
        # regardless of estimated size.
        plan = q._jdf.queryExecution().optimizedPlan().toString()
        hinted = [
            ln
            for ln in plan.splitlines()
            if "strategy=broadcast" in ln
            and ("shingle" in ln or "fingerprint" in ln)
        ]
        assert hinted, plan  # the hot-set anti-join must carry the hint
        for ln in hinted:
            assert "Join LeftAnti" in ln, plan


def test_resume_scan_prunes_partitions_at_source(spark, tmp_path):
    """Iceberg-seam contract (table adapter): a RESUMED read over a
    physically partitioned table must carry the validated-partition
    exclusion as a PartitionFilter on the scan — directories of validated
    partitions are pruned at file listing, so resume I/O is proportional
    to PENDING data (the row-level anti-join fallback would still read
    and decode every file)."""
    from pacts_spark.checkpoint import ValidationManifest
    from pacts_spark.table import ParquetTableAdapter

    df = spark.createDataFrame(
        [("c1", 1, "2026-01-01"), ("c2", 1, "2026-01-02"), ("c3", 2, "2026-01-02")],
        "conv_id string, turn_idx int, part string",
    )
    tbl = str(tmp_path / "transcripts_parted")
    df.write.partitionBy("part").parquet(tbl)

    manifest = ValidationManifest(str(tmp_path / "manifest"))
    manifest.record(
        spark.createDataFrame(
            [("2026-01-01", 1, 0, True)],
            "part string, n_rows long, n_violations long, pass boolean",
        ),
        run_id="r1",
        seq=1,
    )

    pending = ParquetTableAdapter().scan_pending(spark, tbl, manifest)
    plan = _plan(pending)
    scan_lines = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert scan_lines, plan
    # the exclusion must sit in PartitionFilters (source pruning), and the
    # post-scan side must NOT re-filter (no Filter node above the scan)
    assert "PartitionFilters: [" in plan, plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "2026-01-01" in pf, plan
    # hive partition inference types `part` as DATE — stringify to compare
    assert {str(r.part) for r in pending.select("part").distinct().collect()} == {
        "2026-01-02"
    }
    # validated part recorded as FAILED later (higher seq) becomes pending again
    manifest.record(
        spark.createDataFrame(
            [("2026-01-01", 1, 5, False)],
            "part string, n_rows long, n_violations long, pass boolean",
        ),
        run_id="r2",
        seq=2,
    )
    again = ParquetTableAdapter().scan_pending(spark, tbl, manifest)
    assert {str(r.part) for r in again.select("part").distinct().collect()} == {
        "2026-01-01",
        "2026-01-02",
    }


def test_iceberg_adapter_refuses_without_runtime(spark):
    """The Iceberg adapter must fail at WIRING time (clear RuntimeError)
    when the runtime jar is absent — not mid-run with a Py4J stack."""
    import pytest as _pytest

    from pacts_spark.table import get_adapter

    with _pytest.raises(RuntimeError, match="Iceberg runtime"):
        get_adapter("iceberg", spark)
    with _pytest.raises(ValueError, match="unknown table format"):
        get_adapter("csv")


def test_healthy_vector_gate_is_a_scan_level_filter(spark, tmp_path):
    """The gate must compile to ONE codegen'd Filter directly over the
    parquet scan — size/forall/exists in the scan's DataFilters, the
    isnotnull residual pushed to the reader, and NO exchange/UDF between
    scan and filter (at 100 TB the gate must ride the scan, not a
    shuffle)."""
    from pacts_spark.datapipe.similarity import healthy_vectors

    pq = str(tmp_path / "emb.parquet")
    spark.createDataFrame(
        [(1, [0.5] * 4), (2, None)], "vec_id long, embedding array<double>"
    ).write.parquet(pq)
    df = spark.read.parquet(pq)
    plan = (
        healthy_vectors(df, dim=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scan_filter = [
        ln for ln in plan.splitlines() if "Filter" in ln and "Scan" not in ln
    ]
    assert len(scan_filter) == 1, plan          # exactly one Filter node
    assert "Exchange" not in plan, plan         # no shuffle for a row filter
    assert "Python" not in plan, plan           # pure Column, no UDF
    lower = plan.lower()
    assert "isnotnull(embedding" in lower, plan # null test reaches the scan
    assert "forall" in lower and "exists" in lower, plan
