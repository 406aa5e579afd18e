"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "validated turns/sec", "value": N, "unit": "turns/sec",
   "queries": {...per-query wall seconds...}, "total_query_sec": S,
   "sf": ..., ...}

The headline metric follows BASELINE.json: validated turns/sec = rows of
the transcripts table fully processed by the flagship validation run
(row checks + uniqueness + RI + verdicts) divided by its wall time.
Run with SPARK_GRAFT_CPUS at two levels (e.g. 8 and 32) on the same input
to evidence the north_rule scaling criterion (see BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pacts_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "validate_transcripts",
    "transcript_violations",
    "partition_verdicts",
    "validate_orders",
    "validate_events_json",
    "validate_envelopes_mixed",
    "envelope_roundtrip",
    "colstats_transcripts",
    "drift_roles",
    "gap_quantiles",
    "uniqueness_lineitem",
    "jaccard_pairs_documents",
    "minhash_pairs_documents",
    "cosine_nn_embeddings",
    "neardup_embeddings",
    "ivf_cosine_nn",
    "ann_nn_embeddings",
    "sample_documents_stratified",
    "windowed_verdicts",
    "validate_transcripts_strict",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)

    spark = get_spark(app="pacts-bench", cores=cores, shuffle_partitions=max(cores, 16))
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    timings: dict[str, float] = {}

    # warm the JVM + parquet footers with a cheap count, and the
    # Python-worker/Arrow path with a no-op applyInPandas (first pandas-UDF
    # stage pays ~4 s of worker startup once per session — a fixed cost
    # amortized in production, not a property of any one operator)
    spark.read.parquet(f"{sf_dir}/events.parquet").count()

    def _warm(p):
        import numpy  # noqa: F401 — warm the worker's numpy import too

        return p

    spark.range(4096).groupBy(F.col("id") % (4 * cores)).applyInPandas(
        _warm, "id long"
    ).count()

    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()  # full materialization of the result
        timings[name] = round(time.perf_counter() - t0, 3)

    # headline: full validation pipeline throughput (validated turns/sec)
    n_turns = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    t0 = time.perf_counter()
    res_v = qs["partition_verdicts"](spark, sf_dir)
    res_v.collect()
    res_b = qs["transcript_violations"](spark, sf_dir)
    res_b.count()
    pipeline_sec = time.perf_counter() - t0
    turns_per_sec = n_turns / pipeline_sec if pipeline_sec > 0 else 0.0

    total = round(sum(timings.values()), 3)
    # headline {metric, value, unit} IS the throughput (BASELINE.json
    # metric); per-query wall seconds live in their own fields
    print(
        json.dumps(
            {
                "metric": "validated turns/sec",
                "value": round(turns_per_sec, 1),
                "unit": "turns/sec",
                "queries": timings,
                "sf": sf,
                "cores": cores,
                "n_turns": n_turns,
                "pipeline_sec": round(pipeline_sec, 3),
                "turns_per_sec": round(turns_per_sec, 1),
                "total_query_sec": total,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
