"""Sessionization: gap-based session assignment over an event stream —
the "group raw events into conversations/visits" step that precedes
per-session validation or transcript assembly.

Scale shape: ONE shuffle, keyed by the user — the window that computes
the lag and the running session counter rides a single hash exchange,
and the pre-window projection ships only (event_id, user_id, ts)
(~24 bytes/row), never the payload. Per-task work is linear in
events-per-user; the skew bound is the whale user (the same
characteristic every per-key sequential operator in this repo
documents — a user's session chain is inherently a sequential
recurrence and cannot be split without breaking cross-boundary
sessions). Timestamps compare as integer MICROSECONDS
(`unix_micros` / DuckDB `epoch_us`), the repo's exact cross-engine
time idiom — no interval arithmetic, no timezone surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(event_id, user_id, session_idx): per-user 1-based session index;
    a new session starts at the first event and whenever the gap to the
    previous event exceeds ``gap_seconds``. Deterministic total order
    within a user: (ts, event_id) — ties on ts cannot flip sessions
    across runs."""
    gap_us = int(gap_seconds) * 1_000_000
    w = Window.partitionBy(user_col).orderBy(
        # NULLS LAST pinned: Spark defaults nulls-first ASC, DuckDB
        # nulls-last — an unpinned NULL ts would anchor session 1 in
        # Spark but join the LAST session in the twin (latent, fixture
        # has no NULL ts; same rule checks/sequence.py pins)
        F.col(ts_col).asc_nulls_last(), F.col(id_col).asc_nulls_last()
    )
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    is_new = F.when(
        prev.isNull() | ((us - prev) > F.lit(gap_us)), F.lit(1)
    ).otherwise(F.lit(0))
    # two stacked selects, same (partition, order): the lag and the
    # running sum ride ONE exchange + sort (windows merge; a nested
    # lag-inside-sum is not analyzable in one expression)
    flagged = df.select(
        F.col(id_col), F.col(user_col), F.col(ts_col), is_new.alias("__new")
    )
    return flagged.select(
        F.col(id_col),
        F.col(user_col),
        F.sum("__new")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("session_idx"),
    )


def session_transcripts(
    df: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Assemble sessionized events into one transcript row per session:
    (user_id, session_idx, n_events, start_us, end_us, transcript) where
    ``transcript`` is the space-joined event-type sequence in exact
    (ts, event_id) order — the raw-events→conversation-transcript step
    feeding per-transcript validation.

    Scale: the groupBy keys (user, session_idx) EXTEND the session
    window's partition key (user), so the aggregation reuses the
    window's exchange — sessionize + assembly is still ONE shuffle; the
    in-session sequence is ordered by array_sort on (us, id) structs
    (deterministic, no second sort pass). Session timestamps emit as
    integer microseconds (cross-engine exact; no timestamp formatting
    in the output path, per the repo's partition-key lesson)."""
    gap_us = int(gap_seconds) * 1_000_000
    w = Window.partitionBy(user_col).orderBy(
        # NULLS LAST pinned: Spark defaults nulls-first ASC, DuckDB
        # nulls-last — an unpinned NULL ts would anchor session 1 in
        # Spark but join the LAST session in the twin (latent, fixture
        # has no NULL ts; same rule checks/sequence.py pins)
        F.col(ts_col).asc_nulls_last(), F.col(id_col).asc_nulls_last()
    )
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    is_new = F.when(
        prev.isNull() | ((us - prev) > F.lit(gap_us)), F.lit(1)
    ).otherwise(F.lit(0))
    flagged = df.select(
        F.col(id_col),
        F.col(user_col),
        F.col(ts_col),
        F.col(type_col),
        us.alias("__us"),
        is_new.alias("__new"),
    )
    with_idx = flagged.select(
        F.col(id_col),
        F.col(user_col),
        F.col(type_col),
        F.col("__us"),
        F.sum("__new")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("session_idx"),
    )

    def _etype(x):
        return x["t"]

    # NULLS LAST pinned INSIDE the session too: array_sort orders a NULL
    # struct field FIRST while the twin's ORDER BY defaults NULLS LAST
    # (probed live) — the ts key coalesces to BIGINT max (valid while no
    # real ts is exactly 2^63-1 µs, year ~294k) and the id tiebreak gets
    # a type-agnostic null flag (0 non-null < 1 null ≡ NULLS LAST; a
    # sentinel would need the id's type)
    types = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.coalesce(F.col("__us"), F.lit(2**63 - 1)).alias("u"),
                    F.col(id_col).isNull().cast("int").alias("inull"),
                    F.col(id_col).alias("i"),
                    F.col(type_col).alias("t"),
                )
            )
        ),
        _etype,
    )

    def _notnull(x):
        return x.isNotNull()

    # string_agg rule (the twin's semantics): NULL event types are
    # skipped, and a session with NO non-null type yields NULL — Spark's
    # array_join alone would emit '' there (poisoned-fixture parity)
    seq = F.when(F.exists(types, _notnull), F.array_join(types, " "))
    return with_idx.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("__us").alias("start_us"),
        F.max("__us").alias("end_us"),
        seq.alias("transcript"),
    )


def native_session_windows(
    df: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """The same sessionization expressed with Spark's BUILT-IN
    ``session_window`` (the idiomatic path, and the one that transfers
    unchanged to Structured Streaming): one aggregate row per session
    with (user_id, start_us, end_us, n_events), end = last event + gap.

    Boundary semantics (probed live, pinned by
    test_native_session_window_boundary_rule): a gap of EXACTLY
    ``gap_seconds`` still merges; only strictly-greater closes — the
    SAME strict-greater rule as :func:`sessionize`, so the two paths
    agree everywhere. Scale: one user-keyed exchange; Spark merges
    windows inside the aggregation (no lag pass)."""
    # the repo's ts idiom: parquet NTZ timestamps cast to TIMESTAMP before
    # any epoch conversion (unix_micros rejects NTZ)
    sw = F.session_window(
        F.col(ts_col).cast("timestamp"), f"{int(gap_seconds)} seconds"
    )
    return (
        df.groupBy(F.col(user_col), sw)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(user_col),
            F.unix_micros(F.col("session_window.start")).alias("start_us"),
            F.unix_micros(F.col("session_window.end")).alias("end_us"),
            F.col("n_events"),
        )
    )
