"""Text -> embedding: a deterministic hashing-trick n-gram vectorizer.

Closes the pipeline seam where every ANN/near-dup operator consumed a
precomputed ``embedding`` column: this derives one from raw text with
PURE Column expressions (no Python, no fitted vocabulary, no state), so
the curation story runs end to end from text. The hashing trick
(Weinberger et al., "Feature Hashing for Large Scale Multitask
Learning") needs no vocabulary broadcast and no training pass — exactly
the property that matters at 100 TB: the operator is a projection,
embarrassingly parallel, zero shuffle.

Token hash is the md5-prefix 60-bit integer (same construction as
simhash/winnowing), so the whole vectorizer is replayable in DuckDB SQL
for the oracle. Bucket = hash mod dim; vector = L2-normalized bucket
counts. Collisions are the accepted trade (dim buckets for an unbounded
vocabulary) — ANN over these vectors is a topical-similarity search, not
a semantic one, and is honest about it.

Scale notes:
- the gram/bucket arrays are each materialized in their OWN projection
  before any per-element lambda references them — BUT a bare projection
  does NOT survive Catalyst's CollapseProject: the bucket array (and its
  md5 per gram) was measured re-inlining into all ``dim`` count
  references (64x the md5 work, 17 s single-task at 5k docs). The fix is
  an EXCHANGE barrier between the bucket projection and the count scans
  (hash repartition on the id): md5s compute once pre-shuffle, the scans
  hit a materialized int array post-shuffle, and a single-file corpus
  parallelizes. The shuffle carries (id, int-array of ~n_tokens) — about
  the size of the text itself, linear and skew-free; far cheaper than
  dim x md5 recompute. ``barrier=False`` restores the pure projection
  for tiny frames;
- counting is O(dim * n_tokens) per row (a filter+size scan per bucket
  over the materialized array) — fine for the dim=32..256 regime this
  targets; all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _md5_60(col):
    """60-bit integer from the md5 hex prefix — cross-engine exact
    (DuckDB: CAST('0x' || substr(md5(t), 1, 15) AS BIGINT))."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hashed_ngram_embedding(
    df: DataFrame,
    dim: int = 64,
    n: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    barrier: bool = True,
    n_partitions: int | None = None,
) -> DataFrame:
    """(id_col, embedding: array<double>[dim]) — L2-normalized hashed
    n-gram counts.

    tokens = single-space split of trim(text) (the repo-wide tokenizer,
    byte-identical to ``string_split(trim(text), ' ')``); grams = all
    (not distinct) n-token joins; bucket = md5_60(gram) mod dim;
    embedding[i] = count(bucket == i), L2-normalized. NULL text is
    coalesced to '' — an empty text yields one '' token, so the output
    vector always has norm 1 (never a zero vector to poison downstream
    cosines).
    """
    t = F.coalesce(F.trim(F.col(text_col)), F.lit(""))
    toks = F.split(t, " ")
    if n == 1:
        grams = toks
    else:
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
        # bind via default arg, not closure (HOF lambda binding rules)
        grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))

    # stage 1: bucket ids. The exchange barrier (not a bare projection —
    # CollapseProject would re-inline the md5s into every count, see
    # module docstring) pins ONE md5 evaluation per gram.
    bucketed = df.select(
        F.col(id_col),
        F.transform(
            grams, lambda g: F.pmod(_md5_60(g), F.lit(dim)).cast("int")
        ).alias("__b"),
    )
    if barrier:
        parts = (
            n_partitions
            if n_partitions is not None
            else df.sparkSession.sparkContext.defaultParallelism
        )
        bucketed = bucketed.repartition(parts, F.col(id_col))

    # projection 2: raw counts per bucket (scans __b per bucket id; __b is
    # a materialized column reference, not a re-evaluated expression)
    def _count_of(i):
        return F.size(F.filter(F.col("__b"), lambda b: b == i)).cast("double")

    counted = bucketed.select(
        F.col(id_col),
        F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), _count_of).alias("__v"),
    )

    # projection 3: norm in its own column (an aggregate referenced inside
    # the normalizing lambda would re-run per element)
    normed = counted.select(
        F.col(id_col),
        F.col("__v"),
        F.sqrt(
            F.aggregate(F.col("__v"), F.lit(0.0), lambda acc, v: acc + v * v)
        ).alias("__norm"),
    )
    return normed.select(
        F.col(id_col),
        F.transform(F.col("__v"), lambda x: x / F.col("__norm")).alias("embedding"),
    )


def hashed_ngram_embedding_sql(
    dim: int = 64,
    n: int = 1,
    source: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`hashed_ngram_embedding` — returns a SELECT
    producing (id_col, embedding DOUBLE[]) for oracle composition."""
    if n == 1:
        grams = f"string_split(trim(coalesce({text_col}, '')), ' ')"
    else:
        grams = (
            f"[array_to_string(string_split(trim(coalesce({text_col}, '')), ' ')"
            f"[i:i+{n - 1}], ' ') FOR i IN range(1, greatest(len("
            f"string_split(trim(coalesce({text_col}, '')), ' ')) - {n}, 0) + 2)]"
        )
    return f"""
SELECT {id_col},
       [c / sqrt(list_sum([x * x FOR x IN cnt])) FOR c IN cnt] AS embedding
FROM (
  SELECT {id_col},
         [CAST(len([b FOR b IN bks IF b = i]) AS DOUBLE)
          FOR i IN range(0, {dim})] AS cnt
  FROM (
    SELECT {id_col},
           [CAST(CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) % {dim} AS INT)
            FOR g IN {grams}] AS bks
    FROM {source}
  )
)
"""
