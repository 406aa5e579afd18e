"""Temporal joins the built-in DataFrame API lacks: AS-OF join (latest
at-or-before reference per key) and point-in-interval RANGE join.

Why not a plain join: Spark compiles an inequality-only join condition
to BroadcastNestedLoopJoin — O(points × refs) work and a full broadcast
of one side — the exact plan shape this repo's plan-shape tests forbid.
Both operators here re-express the semantics with equi-shuffles only.

As-of join (union + window): tag reference rows, union them with point
rows, hash-exchange ONCE on the key, sort by (ts, src, id), and
``last(ref, ignorenulls=True)`` carries the latest at-or-before
reference to every point row. One shuffle, linear per task — the plan a
native sort-merge as-of would produce, minus the probe. Skew bound is
the whale key (same bound as every per-key sequential op here).

Range join (bucketed binning): equi-join on a time bucket of width
``bucket_us`` >= the longest interval, so each interval explodes into
at most 2 bucket rows; the exact containment filter runs on the joined
pairs. A point's bucket equals at most ONE of an interval's exploded
buckets, so containment needs no post-join dedup. This is the binning
strategy commercial engines implement behind a range-join hint,
expressed with public API only.

Cross-engine rules pinned here (and probed by tests/test_joins.py):
timestamps compare as integer MICROSECONDS; as-of is AT-OR-BEFORE
(a reference tying the point's ts exactly DOES match — refs sort before
points at equal ts); among references tying on (key, ts) the highest id
wins; interval containment is inclusive on BOTH ends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    points: DataFrame,
    refs: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    point_id_col: str = "event_id",
    ref_id_col: str = "event_id",
    out_ref_id: str = "ref_id",
    out_gap: str = "gap_us",
) -> DataFrame:
    """For each point row, the same-key reference row with the greatest
    timestamp <= the point's. Returns
    ``(point_id_col, key_col, out_ref_id, out_gap)`` with NULLs where no
    reference precedes; ids emit as BIGINT, the gap as integer µs.

    Both inputs are projected to (key, µs, id) before the union — the
    single exchange ships ~24 bytes/row regardless of payload width;
    callers re-join wide columns on the id afterwards if needed.
    """

    def _us(df: DataFrame):
        return F.unix_micros(F.col(ts_col).cast("timestamp"))

    r = refs.select(
        F.col(key_col).alias("__k"),
        _us(refs).alias("__us"),
        F.lit(0).alias("__src"),
        F.col(ref_id_col).cast("long").alias("__rid"),
        F.lit(None).cast("long").alias("__pid"),
    )
    p = points.select(
        F.col(key_col).alias("__k"),
        _us(points).alias("__us"),
        F.lit(1).alias("__src"),
        F.lit(None).cast("long").alias("__rid"),
        F.col(point_id_col).cast("long").alias("__pid"),
    )
    # (ts, src, id): refs sort BEFORE points at equal ts (at-or-before
    # includes the exact tie), and the highest-id ref wins a ref/ref tie.
    # NULLS LAST pinned on the µs key: Spark defaults nulls-first ASC,
    # DuckDB nulls-last — an unpinned NULL ts would sort FIRST here (and
    # never match anything) but LAST in the twin (seeing the final ref).
    w = (
        Window.partitionBy("__k")
        .orderBy(
            F.col("__us").asc_nulls_last(),
            F.col("__src").asc_nulls_last(),
            F.coalesce("__rid", "__pid").asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ref_mark = F.when(
        F.col("__src") == 0,
        F.struct(F.col("__us").alias("u"), F.col("__rid").alias("i")),
    )
    carried = r.unionByName(p).select(
        "__k",
        "__us",
        "__src",
        "__pid",
        F.last(ref_mark, ignorenulls=True).over(w).alias("__m"),
    )
    return carried.filter(F.col("__src") == 1).select(
        F.col("__pid").alias(point_id_col),
        F.col("__k").alias(key_col),
        F.col("__m.i").alias(out_ref_id),
        (F.col("__us") - F.col("__m.u")).cast("long").alias(out_gap),
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_id_col: str = "event_id",
    point_us_col: str = "us",
    ivl_id_col: str = "ivl_id",
    start_us_col: str = "start_us",
    end_us_col: str = "end_us",
    bucket_us: int | None = None,
    point_keep: tuple[str, ...] = (),
) -> DataFrame:
    """Inner join of points to every interval containing them
    (``start_us <= us <= end_us``, inclusive both ends). Returns
    ``(ivl_id_col, point_id_col, *point_keep)`` pairs.

    ``bucket_us`` must be >= the longest interval; when None it is
    derived lazily from a one-row max-length aggregate (broadcast, no
    driver action). Intervals explode into
    ``end_us//W - start_us//W + 1 <= 2`` bucket rows; points compute one
    bucket each; the equi-join runs on the bucket and containment
    filters exactly. No dedup is needed: a point's single bucket matches
    at most one exploded row per interval.
    """
    if bucket_us is not None:
        w_ivl = intervals.withColumn("__w", F.lit(int(bucket_us)).cast("long"))
    else:
        max_len = intervals.agg(
            (F.max(F.col(end_us_col) - F.col(start_us_col)) + F.lit(1))
            .cast("long")
            .alias("__w")
        )
        w_ivl = intervals.crossJoin(F.broadcast(max_len))

    # integer bucket arithmetic (us - us % W): exact on BIGINT, no
    # double-division floor risk near bucket boundaries
    def _bucket(c):
        return (F.col(c) - F.col(c) % F.col("__w")) / F.col("__w")

    ivl_b = w_ivl.select(
        F.col(ivl_id_col),
        F.col(start_us_col),
        F.col(end_us_col),
        F.explode(
            F.sequence(
                _bucket(start_us_col).cast("long"), _bucket(end_us_col).cast("long")
            )
        ).alias("__b"),
    )
    if bucket_us is not None:
        pts = points.withColumn("__w", F.lit(int(bucket_us)).cast("long"))
    else:
        pts = points.crossJoin(F.broadcast(max_len))
    pts_b = pts.select(
        F.col(point_id_col),
        F.col(point_us_col),
        *[F.col(c) for c in point_keep],
        _bucket(point_us_col).cast("long").alias("__b"),
    )
    joined = ivl_b.join(pts_b, "__b").filter(
        (F.col(point_us_col) >= F.col(start_us_col))
        & (F.col(point_us_col) <= F.col(end_us_col))
    )
    return joined.select(ivl_id_col, point_id_col, *point_keep)
