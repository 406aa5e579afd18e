"""Deterministic sampling for training-data pipelines.

``TABLESAMPLE``/``rand()`` are banned here (repo invariant: no
nondeterminism in any output path) and executor-seeded RNG is not stable
under retries/repartitioning. Instead: HASH sampling — a row is kept iff
an md5-derived bucket of its key falls under the rate. Properties:

- deterministic and retry/partitioning-independent (pure function of the
  key), so resumed or re-run jobs sample the SAME rows;
- cross-engine reproducible (md5 is md5 everywhere — the DuckDB oracle
  computes the identical bucket);
- composable: the (key, bucket) assignment is fixed, so raising the rate
  strictly grows the sample (nested samples for scaling-law runs).

Scale: a pure projection + filter — no shuffle, pushdown-friendly; the
md5 is the only cost (cheap next to a scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10_000


def hash_bucket(key: Column) -> Column:
    """Deterministic bucket in [0, 10000): first 8 hex chars of
    md5(key-as-string) mod 10000 — byte-identical in DuckDB as
    ``CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8) AS BIGINT) %
    10000``."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % _BUCKETS
    )


def _threshold(rate: float) -> int:
    # round half-UP, don't truncate and don't banker's-round:
    # int(0.57 * 10000) == 5699 (binary float) silently drops one bucket vs
    # the documented `bucket < rate*10000` contract, and Python's round()
    # is round-half-even (rate=0.00005 → 0.5 → 0 kept buckets). The
    # explicit rule is floor(rate*10000 + 0.5): a rate landing exactly on a
    # half-bucket keeps the bucket.
    return int(rate * _BUCKETS + 0.5)


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id"
) -> DataFrame:
    """Uniform deterministic sample: keep rows whose bucket < rate*10000."""
    return df.filter(hash_bucket(F.col(key_col)) < _threshold(rate))


def rebalanced_hash_sample(
    df: DataFrame,
    baseline_hist: DataFrame,
    stratum_col: str,
    key_col: str = "doc_id",
    n_col: str = "n",
) -> DataFrame:
    """Drift→action: per-stratum sample rates COMPUTED from a stored
    baseline histogram instead of passed as literals — the corrective
    sampling step after a distribution-drift check flags a stratum as
    over-represented.

    ``baseline_hist`` is (stratum, n) target counts — in production the
    manifest-persisted histogram of the last validated run (the same
    aggregate drift_scores consumes); rate(stratum) = least(1,
    target_n / current_n), so over-represented strata are downsampled
    toward the baseline and under-represented ones pass through whole.
    Strata absent from the baseline get rate 0 (dropped — e.g. 'und'
    from language-ID). Threshold = floor(rate*10000 + 0.5), the repo's
    half-up bucket rule, computed identically in the DuckDB twin (both
    engines do one IEEE double division of two BIGINTs).

    Scale: current counts are ONE aggregate-only groupBy; the per-stratum
    thresholds (a handful of rows) broadcast back — the data pass itself
    stays a projection + filter, same as stratified_hash_sample.
    """
    cur = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__cur"))
    rates = cur.join(
        baseline_hist.withColumnRenamed(n_col, "__target"), stratum_col, "left"
    )
    rate = F.least(
        F.lit(1.0),
        F.coalesce(F.col("__target").cast("double") / F.col("__cur"), F.lit(0.0)),
    )
    thr = rates.select(
        stratum_col,
        F.floor(rate * _BUCKETS + F.lit(0.5)).cast("long").alias("__thr"),
    )
    return (
        df.join(F.broadcast(thr), stratum_col)
        .filter(hash_bucket(F.col(key_col)) < F.col("__thr"))
        .drop("__thr")
    )


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    key_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum rates (e.g. per-language mixing weights for a training
    corpus): keep a row iff bucket(key) < rate(stratum)*10000. Strata not
    listed get ``default_rate``. Pure projection + filter, no shuffle."""
    thr = None
    for stratum, rate in sorted(rates.items()):
        cond = F.col(stratum_col) == F.lit(stratum)
        val = F.lit(_threshold(rate))
        thr = F.when(cond, val) if thr is None else thr.when(cond, val)
    thr = (
        thr.otherwise(F.lit(_threshold(default_rate)))
        if thr is not None
        else F.lit(_threshold(default_rate))
    )
    return df.filter(hash_bucket(F.col(key_col)) < thr)


def global_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic corpus-wide training-order shuffle with a GLOBAL
    0-based ordinal: every row gets ``shuffle_rank`` = its position under
    the seeded pseudo-random total order (md5 of ``seed:id``, ties by
    id) — the "shuffle the corpus before packing/sharding" step of a
    pretraining pipeline, reproducible across runs and engines.

    Scale design — the bounded-driver zipWithIndex pattern, never a
    single-partition global sort: rows bucket by the FIRST TWO HEX CHARS
    of the order key (256 buckets; a string-prefix bucket means ordering
    by (bucket, key) equals ordering by key alone), per-bucket counts
    come back to the driver (<= 256 rows — bounded regardless of corpus
    size), and rank = cumulative_offset[bucket] + row_number within the
    bucket. The only data-sized work is one hash-partitioned window sort
    over ~N/256-row buckets; skew is impossible because md5 prefixes are
    uniform by construction.
    """
    from pyspark.sql import Window

    # NULL ids hash as the empty string (a NULL hash would make the
    # bucket key NULL and the driver-side sorted() heterogeneous) and
    # tie-break first via Spark's asc-nulls-first default.
    h = F.md5(
        F.concat(
            F.lit(f"{seed}:"),
            F.coalesce(F.col(id_col).cast("string"), F.lit("")),
        )
    )
    hashed = df.select(F.col(id_col), h.alias("__h"), F.substring(h, 1, 2).alias("__b"))
    # bounded driver state: one count per bucket (<= 256 rows)
    counts = {r["__b"]: r["cnt"] for r in hashed.groupBy("__b").agg(F.count("*").alias("cnt")).collect()}
    if not counts:  # empty input: create_map() of zero entries is typeless
        return df.select(
            F.col(id_col), F.lit(0).cast("long").alias("shuffle_rank")
        )
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    off_map = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )
    rn = F.row_number().over(
        Window.partitionBy("__b").orderBy(F.col("__h"), F.col(id_col))
    )
    return hashed.select(
        F.col(id_col),
        (off_map[F.col("__b")] + rn - 1).cast("long").alias("shuffle_rank"),
    )
