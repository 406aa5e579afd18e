"""Uniqueness check on (conv_id, turn_idx) — north_star mandate.

Scales up the reference's implicit envelope-identity contract (UUID
target_id/profile_id uniqueness in SpringBootMessageTest.java:105,264-265)
to a distributed duplicate-key detector.

Scale design (north_rule: "skew handled explicitly"): the naive
``groupBy(keys).count()`` already map-side-combines, but a whale
conversation (one conv_id = hot hash bucket when aggregating BY conv alone,
or a single reducer receiving the whale's whole key range) can straggle.
``duplicate_keys`` therefore does SALTED TWO-PHASE aggregation:

  phase 1: groupBy(keys..., salt) count        -- salt spreads identical
                                                  key-groups over S reducers
  phase 2: groupBy(keys...) sum(partial)       -- tiny input (distinct keys)

Salt is deterministic (hash of a payload column mod S, never rand()) so
reruns are reproducible (SURVEY.md §7(d)). AQE skew-join/coalesce is on in
session.py as the second line of defense.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def duplicate_keys(
    df: DataFrame,
    keys: list[str],
    salt_col: str | Column | None = None,
    salt_buckets: int = 16,
) -> DataFrame:
    """Keys appearing more than once, with their multiplicity.

    Returns ``keys... , dup_count`` for groups with count > 1, salted
    two-phase when ``salt_col`` is given (use a high-entropy payload column
    like ``text``; identical full-duplicate rows still collide on their
    salt, which is harmless — the whale key's VOLUME is what gets spread).
    """
    if salt_col is not None:
        sc = F.col(salt_col) if isinstance(salt_col, str) else salt_col
        salted = df.withColumn("__salt", F.pmod(F.xxhash64(sc), F.lit(salt_buckets)))
        partial = salted.groupBy(*keys, "__salt").agg(F.count(F.lit(1)).alias("__c"))
        counts = partial.groupBy(*keys).agg(F.sum("__c").alias("dup_count"))
    else:
        counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("dup_count"))
    return counts.filter(F.col("dup_count") > 1)


def duplicate_keys_hashed(
    df: DataFrame,
    keys: list[str],
    broadcast_candidates: bool = True,
) -> DataFrame:
    """Shuffle-lean EXACT duplicate detector for wide/string keys.

    The salted two-phase (``duplicate_keys``) still ships one row per
    distinct key THROUGH the shuffle carrying the full key tuple — for
    ``(conv_id string, turn_idx)`` at 10^12 rows that is the pipeline's
    single biggest byte mover. This variant:

      phase 1: groupBy(xxhash64(keys...)) count — the full-volume shuffle
               carries (8-byte hash, count); map-side combine also absorbs
               hot-key skew (a billion-fold duplicate collapses to one row
               per mapper), so no salt is needed;
      phase 2: hashes with count > 1 (true duplicates + rare 64-bit
               collisions) broadcast back; ONLY the candidate rows re-group
               on the TRUE key tuple — exactness restored on a tail-sized
               input, collisions drop out here.

    Returns the same (keys..., dup_count > 1) contract as
    ``duplicate_keys``. ``broadcast_candidates=False`` defers to AQE for
    pathological mass-duplication inputs (same caveat as
    ``uniqueness_violations(broadcast_dups=False)``)."""
    kh = F.xxhash64(*[F.col(k) for k in keys])
    hot = (
        df.select(kh.alias("__kh"))
        .groupBy("__kh")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") > 1)
        .select("__kh")
    )
    if broadcast_candidates:
        hot = F.broadcast(hot)
    cand = df.withColumn("__kh", kh).join(hot, "__kh")
    return (
        cand.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def uniqueness_violations(
    df: DataFrame,
    keys: list[str],
    salt_col: str | Column | None = None,
    salt_buckets: int = 16,
    broadcast_dups: bool = True,
    method: str = "salt",
) -> DataFrame:
    """Exploded per-row violation form: every row whose key is duplicated,
    tagged with the reference-style message catalog extension
    ``Duplicate key: (k1=v1, k2=v2) appears N times``.

    ``method="hash"`` swaps in :func:`duplicate_keys_hashed` (8-byte-hash
    phase-1 shuffle + exact tail verify) — identical output, the
    shuffle-lean choice for wide string keys at full scale.

    ``broadcast_dups=True`` hints the join-back (the duplicate set is
    normally the tail, so this is the common fast path). Set it False for
    pathological inputs (mass duplication) where the duplicate-key set
    itself is large — then AQE picks the join strategy from runtime stats
    instead of force-collecting the dup set to the driver.
    """
    if method == "hash":
        dups = duplicate_keys_hashed(df, keys, broadcast_candidates=broadcast_dups)
    else:
        dups = duplicate_keys(df, keys, salt_col=salt_col, salt_buckets=salt_buckets)
    if broadcast_dups:
        dups = F.broadcast(dups)
    # null-SAFE join-back: a duplicated key containing NULL (e.g. two
    # rows with conv_id NULL, turn_idx 1) is counted by duplicate_keys
    # (groupBy keeps the NULL group) but a plain equi-join would drop its
    # violation rows — <=> keeps them (still a hash-join key in Spark)
    dups_r = dups.select(
        *[F.col(k).alias(f"__dk_{k}") for k in keys], "dup_count"
    )
    cond = None
    for k in keys:
        c = df[k].eqNullSafe(F.col(f"__dk_{k}"))
        cond = c if cond is None else (cond & c)
    joined = df.join(dups_r, on=cond, how="inner").drop(
        *[f"__dk_{k}" for k in keys]
    )
    msg = F.concat(
        F.lit("Duplicate key: ("),
        F.concat_ws(
            ", ", *[F.concat(F.lit(f"{k}="), F.col(k).cast("string")) for k in keys]
        ),
        F.lit(") appears "),
        F.col("dup_count").cast("string"),
        F.lit(" times"),
    )
    return joined.withColumn("violation", msg)
