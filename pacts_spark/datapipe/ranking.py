"""Okapi BM25 relevance ranking of documents against a fixed query
term set — the retrieval/quality-ranking primitive (data curation uses
it for targeted corpus search and contamination triage).

Scale design: the query is a handful of LITERAL terms, so per-doc term
frequencies come from ``size(filter(tokens, = term))`` — a pure
projection; the corpus is never exploded or shuffled on tokens. The
global stats (N, Σdl, per-term document frequencies) collapse to a
ONE-ROW aggregate broadcast back over the docs (the repo's one-row
broadcast idiom), and the scoring pass is again a pure projection
feeding a TakeOrdered top-k cut with a pinned (score desc, id) total
order. Net: one tiny aggregate + one sort-limit — no corpus-sized
shuffle at any point.

Hash-stability: per-term score contributions are quantized to INTEGER
micro-units (round(x*1e6) BIGINT) before the per-doc sum, the repo's
micro-nat idiom — order-independent, cross-engine exact. Double
arithmetic is written with the exact parenthesization the SQL twin
uses, so both engines evaluate identical IEEE expression trees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_topk(
    df: DataFrame,
    query_terms: tuple[str, ...],
    k: int = 50,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` docs by BM25 vs ``query_terms``: (id, score_micro,
    n_hit) with score_micro = Σ_term round(idf·tfnorm·1e6) as BIGINT,
    idf = ln(1 + (N − df + 0.5)/(df + 0.5)) (always positive), docs with
    zero matching terms dropped, ties broken by ascending id."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    t = F.trim(F.col(text_col))
    toks = F.when(
        t.isNull() | (F.length(t) == 0), F.array().cast("array<string>")
    ).otherwise(F.split(t, " "))

    def _tf(term: str):
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    per_doc = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("__dl"),
        *[_tf(term).cast("long").alias(f"__tf{i}") for i, term in enumerate(query_terms)],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum("__dl").cast("double").alias("__sdl"),
        *[
            F.sum(F.when(F.col(f"__tf{i}") > 0, 1).otherwise(0))
            .cast("double")
            .alias(f"__df{i}")
            for i in range(len(query_terms))
        ],
    )
    joined = per_doc.crossJoin(F.broadcast(stats))

    K1 = F.lit(float(k1))
    B = F.lit(float(b))
    dl = F.col("__dl").cast("double")

    def _contrib(i: int):
        tf = F.col(f"__tf{i}").cast("double")
        dfreq = F.col(f"__df{i}")
        idf = F.log(
            F.lit(1.0) + (F.col("__n") - dfreq + F.lit(0.5)) / (dfreq + F.lit(0.5))
        )
        norm = (tf * (K1 + F.lit(1.0))) / (
            tf + K1 * (F.lit(1.0) - B + B * (dl / (F.col("__sdl") / F.col("__n"))))
        )
        return F.when(
            F.col(f"__tf{i}") > 0,
            F.round(idf * norm * F.lit(1_000_000.0)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))

    score = sum([_contrib(i) for i in range(len(query_terms))], F.lit(0).cast("long"))
    n_hit = sum(
        [
            F.when(F.col(f"__tf{i}") > 0, F.lit(1)).otherwise(F.lit(0))
            for i in range(len(query_terms))
        ],
        F.lit(0),
    )
    scored = joined.select(
        F.col(id_col),
        score.alias("score_micro"),
        n_hit.cast("long").alias("n_hit"),
    ).filter(F.col("score_micro") > 0)
    return scored.orderBy(F.col("score_micro").desc(), F.col(id_col)).limit(int(k))


def bm25_topk_sql(
    query_terms: tuple[str, ...],
    k: int = 50,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`bm25_topk` — identical tokenization,
    expression tree and micro-unit quantization, generated from the same
    parameters so query and oracle cannot drift."""
    tf_cols = ",\n         ".join(
        f"len(list_filter(toks, x -> x = '{term}')) AS tf{i}"
        for i, term in enumerate(query_terms)
    )
    df_cols = ",\n         ".join(
        f"CAST(count(*) FILTER (WHERE tf{i} > 0) AS DOUBLE) AS df{i}"
        for i in range(len(query_terms))
    )
    k1s = f"CAST({float(k1)} AS DOUBLE)"
    bs = f"CAST({float(b)} AS DOUBLE)"
    contribs = " + ".join(
        f"""(CASE WHEN tf{i} > 0 THEN CAST(round(
          ln(CAST(1 AS DOUBLE) + (n - df{i} + CAST(0.5 AS DOUBLE)) / (df{i} + CAST(0.5 AS DOUBLE)))
          * ((CAST(tf{i} AS DOUBLE) * ({k1s} + CAST(1 AS DOUBLE)))
             / (CAST(tf{i} AS DOUBLE) + {k1s} * (CAST(1 AS DOUBLE) - {bs} + {bs} * (CAST(dl AS DOUBLE) / (sdl / n)))))
          * CAST(1000000 AS DOUBLE)) AS BIGINT) ELSE 0 END)"""
        for i in range(len(query_terms))
    )
    hits = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)" for i in range(len(query_terms))
    )
    return f"""
WITH d AS (
  SELECT {id_col},
         CASE WHEN trim({text_col}) IS NULL OR length(trim({text_col})) = 0
              THEN []::VARCHAR[] ELSE string_split(trim({text_col}), ' ')
         END AS toks
  FROM {table}
),
s AS (
  SELECT {id_col}, CAST(len(toks) AS BIGINT) AS dl,
         {tf_cols}
  FROM d
),
g AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(dl) AS DOUBLE) AS sdl,
         {df_cols}
  FROM s
),
scored AS (
  SELECT {id_col},
         {contribs} AS score_micro,
         CAST({hits} AS BIGINT) AS n_hit
  FROM s CROSS JOIN g
)
SELECT {id_col}, score_micro, n_hit
FROM scored WHERE score_micro > 0
ORDER BY score_micro DESC, {id_col}
LIMIT {int(k)}
"""
