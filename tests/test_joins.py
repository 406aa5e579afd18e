"""Temporal joins (datapipe/joins), rollup cascade (datapipe/rollup)
and BM25 ranking (datapipe/ranking): boundary rules pinned by known-
answer fixtures, plan shapes asserted (one exchange / no nested-loop
join), cross-engine contract covered by the entry oracles."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _ts(s: str):
    return datetime.fromisoformat(s)


# ---------------------------------------------------------------- as-of join


def _asof_fixture(spark):
    # key 1: refs at 10:00:00 (id 100) and 10:05:00 (ids 101, 102 tie on ts);
    # key 2: no refs at all
    refs = spark.createDataFrame(
        [
            (100, 1, _ts("2024-01-01 10:00:00")),
            (101, 1, _ts("2024-01-01 10:05:00")),
            (102, 1, _ts("2024-01-01 10:05:00")),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    points = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-01 09:59:59")),  # before any ref -> NULL
            (2, 1, _ts("2024-01-01 10:00:00")),  # EXACT tie -> matches 100
            (3, 1, _ts("2024-01-01 10:04:00")),  # between -> 100
            (4, 1, _ts("2024-01-01 10:06:00")),  # after the ref/ref tie -> 102
            (5, 2, _ts("2024-01-01 12:00:00")),  # key without refs -> NULL
        ],
        "event_id long, user_id long, ts timestamp",
    )
    return points, refs


def test_asof_join_boundary_and_tie_rules(spark):
    from pacts_spark.datapipe.joins import asof_join

    points, refs = _asof_fixture(spark)
    out = {
        r["event_id"]: (r["ref_id"], r["gap_us"])
        for r in asof_join(points, refs).collect()
    }
    assert out[1] == (None, None)
    assert out[2] == (100, 0)  # at-or-before: exact tie matches
    assert out[3] == (100, 240_000_000)
    assert out[4] == (102, 60_000_000)  # highest id wins the ref/ref ts tie
    assert out[5] == (None, None)


def test_asof_join_is_one_exchange_no_join(spark):
    from pacts_spark.datapipe.joins import asof_join

    points, refs = _asof_fixture(spark)
    plan = _plan(asof_join(points, refs))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan  # union+window, not a join node


# ------------------------------------------------------------- interval join


def test_interval_join_inclusive_ends_and_no_dup_across_buckets(spark):
    from pacts_spark.datapipe.joins import interval_join

    # interval [1000, 1240] with bucket 240 spans buckets 4 and 5; points
    # at both ends (inclusive), inside straddling the bucket edge, outside
    ivls = spark.createDataFrame(
        [(1, 1000, 1240), (2, 2000, 2100)],
        "ivl_id long, start_us long, end_us long",
    )
    pts = spark.createDataFrame(
        [(10, 1000), (11, 1240), (12, 1200), (13, 999), (14, 1241), (15, 2050)],
        "event_id long, us long",
    )
    pairs = interval_join(pts, ivls, bucket_us=240)
    got = sorted((r["ivl_id"], r["event_id"]) for r in pairs.collect())
    assert got == [(1, 10), (1, 11), (1, 12), (2, 15)]


def test_interval_join_derived_bucket_width_matches_literal(spark):
    from pacts_spark.datapipe.joins import interval_join

    ivls = spark.createDataFrame(
        [(1, 1000, 1240), (2, 2000, 2100)],
        "ivl_id long, start_us long, end_us long",
    )
    pts = spark.createDataFrame(
        [(10, 1000), (11, 1240), (13, 999), (15, 2050)],
        "event_id long, us long",
    )
    lit = sorted(
        (r["ivl_id"], r["event_id"])
        for r in interval_join(pts, ivls, bucket_us=241).collect()
    )
    derived = sorted(
        (r["ivl_id"], r["event_id"]) for r in interval_join(pts, ivls).collect()
    )
    assert lit == derived == [(1, 10), (1, 11), (2, 15)]


def test_interval_join_plan_has_no_nested_loop(spark):
    from pacts_spark.datapipe.joins import interval_join

    ivls = spark.createDataFrame(
        [(1, 1000, 1240)], "ivl_id long, start_us long, end_us long"
    )
    pts = spark.createDataFrame([(10, 1000)], "event_id long, us long")
    plan = _plan(interval_join(pts, ivls, bucket_us=240))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


# ------------------------------------------------------------------- rollup


def test_time_rollup_cascade_matches_direct_aggregation(spark):
    from pacts_spark.datapipe.rollup import time_rollup

    ev = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:10"), "click", 1.25),
            (2, _ts("2024-01-01 00:00:50"), "click", 2.75),
            (3, _ts("2024-01-01 00:59:59"), "click", 10.0),
            (4, _ts("2024-01-01 01:00:00"), "click", 4.0),  # next hour
            (5, _ts("2024-01-02 00:00:00"), "error", 0.01),  # next day
        ],
        "event_id long, ts timestamp, event_type string, value double",
    )
    rows = {
        (r["resolution"], r["event_type"], r["bucket_us"]): (
            r["n_events"],
            r["cents_sum"],
            r["cents_min"],
            r["cents_max"],
        )
        for r in time_rollup(ev).collect()
    }

    def us(s):
        return int(_ts(s).timestamp() * 1_000_000)

    assert rows[("minute", "click", us("2024-01-01 00:00:00"))] == (2, 400, 125, 275)
    assert rows[("hour", "click", us("2024-01-01 00:00:00"))] == (3, 1400, 125, 1000)
    assert rows[("hour", "click", us("2024-01-01 01:00:00"))] == (1, 400, 400, 400)
    assert rows[("day", "click", us("2024-01-01 00:00:00"))] == (4, 1800, 125, 1000)
    assert rows[("day", "error", us("2024-01-02 00:00:00"))] == (1, 1, 1, 1)
    # cascade consistency: every hour row equals the sum of its minutes
    minute_n = sum(
        v[0] for (res, t, b), v in rows.items() if res == "minute" and t == "click"
    )
    day_n = sum(
        v[0] for (res, t, b), v in rows.items() if res == "day" and t == "click"
    )
    assert minute_n == day_n == 4


def test_time_rollup_rejects_non_nesting_resolutions(spark):
    from pacts_spark.datapipe.rollup import time_rollup

    ev = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:10"), "click", 1.0)],
        "event_id long, ts timestamp, event_type string, value double",
    )
    with pytest.raises(ValueError, match="nest"):
        time_rollup(ev, resolutions=(("minute", 60), ("90s", 90)))


# --------------------------------------------------------------------- bm25


def test_bm25_rank_order_and_zero_hit_drop(spark):
    from pacts_spark.datapipe.ranking import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "vector vector vector pad pad"),  # high tf, short
            (2, "vector pad pad pad pad pad pad pad pad pad"),  # low tf, long
            (3, "pad pad pad"),  # zero hits -> dropped
            (4, ""),  # empty -> dropped
        ],
        "doc_id long, text string",
    )
    rows = bm25_topk(docs, ("vector",), k=10).collect()
    ids = [r["doc_id"] for r in rows]
    assert ids == [1, 2]  # ordered by score desc; 3 and 4 absent
    assert rows[0]["score_micro"] > rows[1]["score_micro"] > 0
    assert rows[0]["n_hit"] == 1


def test_bm25_matches_duckdb_twin_on_fixture(spark):
    import duckdb
    import pandas as pd

    from pacts_spark.datapipe.ranking import bm25_topk, bm25_topk_sql

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "vector hash hash stream",
                "vector pad pad pad pad pad",
                "hash stream stream stream",
                "pad pad",
                "window window vector hash stream pad",
            ],
        }
    )
    terms = ("vector", "hash", "stream", "window")
    got = (
        bm25_topk(spark.createDataFrame(pdf), terms, k=5)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    want = (
        con.execute(bm25_topk_sql(terms, k=5))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["score_micro"].tolist() == want["score_micro"].tolist()
    assert got["n_hit"].tolist() == want["n_hit"].tolist()


def test_bm25_plan_has_no_token_shuffle(spark):
    from pacts_spark.datapipe.ranking import bm25_topk

    docs = spark.createDataFrame(
        [(1, "vector pad"), (2, "hash pad")], "doc_id long, text string"
    )
    plan = _plan(bm25_topk(docs, ("vector", "hash"), k=5))
    # corpus never explodes: the only wide ops are the one-row stats
    # aggregate (+ its broadcast) and the TakeOrdered cut
    assert "Generate explode" not in plan, plan
