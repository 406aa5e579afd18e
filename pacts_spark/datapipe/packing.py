"""Sequence packing: assign documents to fixed-token-budget bins (the
"pack documents into 4k-token training examples" step of a pretraining
pipeline) with the classic greedy next-fit rule.

The greedy recurrence is inherently sequential, so a single global order
would serialize a 100 TB corpus. The scalable shape is the same one the
dedup/LSH operators use: a deterministic hash partitions docs into
``n_groups`` independent packing streams, each group packs its docs in
``id`` order on one task, and bin ids are namespaced by group. Per-task
work is linear in docs/group; ``n_groups`` scales with the corpus so a
group stays executor-sized. The group hash is the md5-prefix bucket
(cross-engine reproducible; xxhash64 is Spark-only).

Next-fit rule per group, docs in ascending id order: keep a running
``fill``; a doc goes into the current bin if ``fill + n_tokens <=
budget``, else it OPENS the next bin (docs larger than the budget get a
bin of their own, oversized — documents are never split). The DuckDB
oracle twin replays the identical recurrence as a recursive CTE.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pacts_spark.datapipe.textstats import _n_tokens


def pack_sequences(
    df: DataFrame,
    budget: int = 256,
    n_groups: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, pack_group, n_tokens, bin_idx): greedy next-fit packing
    of whitespace token counts into ``budget``-token bins within each of
    ``n_groups`` md5-bucketed groups. One shuffle (the groupBy); the
    pandas stage materializes only (id, n_tokens) per group — text never
    leaves the scan projection.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        (
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
            .cast("long")
            % n_groups
        ).alias("pack_group"),
        _n_tokens(F.col(text_col)).cast("long").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins = []
        bin_idx, fill = 0, 0
        first = True
        for nt in pdf["n_tokens"]:
            if first:
                fill = nt
                first = False
            elif fill + nt <= budget:
                fill += nt
            else:
                bin_idx += 1
                fill = nt
            bins.append(bin_idx)
        pdf["bin_idx"] = pd.Series(bins, dtype="int64")
        return pdf

    return base.groupBy("pack_group").applyInPandas(
        pack, "doc_id long, pack_group long, n_tokens long, bin_idx long"
    )


def pack_oracle_sql(
    docs_sql: str,
    budget: int = 256,
    n_groups: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin: the same next-fit recurrence as a recursive CTE over
    rows ranked by id within each md5 group."""
    return f"""
WITH RECURSIVE docs AS (
  SELECT {id_col} AS doc_id,
         CAST('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 8) AS BIGINT) % {n_groups} AS pack_group,
         CAST(CASE WHEN length(trim({text_col})) = 0 THEN 0
              ELSE length(trim({text_col})) - length(replace(trim({text_col}), ' ', '')) + 1 END AS BIGINT) AS n_tokens,
         row_number() OVER (PARTITION BY (CAST('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 8) AS BIGINT) % {n_groups}) ORDER BY {id_col}) AS rn
  FROM ({docs_sql})
),
pack AS (
  SELECT doc_id, pack_group, n_tokens, rn,
         CAST(0 AS BIGINT) AS bin_idx, n_tokens AS fill
  FROM docs WHERE rn = 1
  UNION ALL
  SELECT d.doc_id, d.pack_group, d.n_tokens, d.rn,
         CASE WHEN p.fill + d.n_tokens <= {budget} THEN p.bin_idx ELSE p.bin_idx + 1 END,
         CASE WHEN p.fill + d.n_tokens <= {budget} THEN p.fill + d.n_tokens ELSE d.n_tokens END
  FROM docs d JOIN pack p ON d.pack_group = p.pack_group AND d.rn = p.rn + 1
)
SELECT doc_id, pack_group, n_tokens, bin_idx FROM pack
"""
