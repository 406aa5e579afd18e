"""Scaling-efficiency evidence for the north_rule criterion.

Runs the identical flagship validation pipeline at two parallelism levels
(N and 4N local cores) on the same input and reports throughput at both
plus efficiency = (T_N / T_4N) / 4. Writes BENCH/BASELINE.md.

The sf0.1 events table (100k rows) finishes in seconds — fixed overheads
(plan compile, job scheduling) swamp the measurement and fake poor
scaling. To make the measurement compute-bound the input is REPLICATED
deterministically (replica r shifts user_id/event_id so conversations stay
distinct and the event_id%97 duplicate-injection pattern is preserved) to
~REPLICAS x 100k turns. Same derived input for both levels; no external
data.

Usage: python tools/scaling_bench.py [sf_dir] [N] [replicas]
       (defaults: sf0.1, N=8, replicas=40 -> 4M turns)
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

PIPELINE_CODE = """
import sys, time, json
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from pacts_spark.session import get_spark
from pacts_spark.runner import ValidationRun
from pacts_spark.transcripts import transcripts_from_events, conversations_dim, tools_dim
from pacts_spark.engine import PactsEngine
from pacts_spark.registry import SchemaRegistry

CORES = {cores}
spark = get_spark(app="scaling", cores=CORES, shuffle_partitions=CORES * 2)
spark.sparkContext.setLogLevel("ERROR")

ev0 = spark.read.parquet("{sf_dir}/events.parquet")
R = {replicas}
ev = (
    ev0.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(R - 1))))
    .withColumn("user_id", F.col("user_id") + F.col("rep") * 1000)
    .withColumn("event_id", F.col("event_id") + F.col("rep") * 1000000000)
    .drop("rep")
)
reg = SchemaRegistry(domain="bees", version="v1", schema_root={repo!r} + "/schemas")
reg.load_dir({repo!r} + "/schemas")
engine = PactsEngine(reg)
convs = conversations_dim(ev)
tools = tools_dim(spark)
n_turns = ev.count()

def pipeline():
    t = transcripts_from_events(ev)
    res = ValidationRun(engine).run(spark, t, conversations=convs, tools=tools)
    res.verdicts.collect()
    res.violations.count()

pipeline()  # warm-up: JIT, codegen, page cache
times = []
for _ in range(3):
    t0 = time.perf_counter(); pipeline(); times.append(time.perf_counter() - t0)
best = min(times)
print("RESULT " + json.dumps({{"cores": CORES, "sec": round(best, 3),
    "turns_per_sec": round(n_turns / best, 1), "n_turns": n_turns,
    "reps": [round(t, 3) for t in times]}}))
spark.stop()
"""


def run_at(cores: int, sf_dir: str, replicas: int) -> dict:
    code = PIPELINE_CODE.format(
        repo=str(REPO), cores=cores, sf_dir=sf_dir, replicas=replicas
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3000
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"no result at cores={cores}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    lo = run_at(n, sf_dir, replicas)
    hi = run_at(4 * n, sf_dir, replicas)
    eff = (lo["sec"] / hi["sec"]) / 4.0
    md = f"""# BENCH/BASELINE — scaling-efficiency evidence (north_rule)

The north_rule's two-cluster-size criterion (N vs 4N executors, throughput
scaling efficiency >= 0.8) cannot use a real cluster in this sandbox; per
the driver's instruction it is evidenced by running the IDENTICAL flagship
validation pipeline (row schema checks + salted uniqueness + broadcast
referential checks + exploded violations + per-partition verdicts over the
derived transcripts table) at two local parallelism levels on the same
input.

Input: `{sf_dir}` events replicated deterministically x{replicas} =
{lo['n_turns']:,} turns (replica shift keeps conversations distinct and
preserves the injected violation patterns; no external data). Timing: best
of 3 reps after a warm-up rep, fresh JVM per level,
`spark.sql.shuffle.partitions = 2 x cores` at each level (as a real
cluster would be tuned).

| parallelism | wall sec | validated turns/sec |
|---|---|---|
| local[{n}]  (N)  | {lo['sec']} | {lo['turns_per_sec']:,} |
| local[{4 * n}] (4N) | {hi['sec']} | {hi['turns_per_sec']:,} |

**Scaling efficiency (N→4N) = (T_N / T_4N) / 4 = {eff:.3f}**
(criterion: >= 0.8 → {"PASS" if eff >= 0.8 else "MISS"})

Reps: N={lo['reps']}, 4N={hi['reps']}.

Caveats: single-machine "executors" share one memory bus, one page cache
and one JVM heap, so 4N threads see less than 4x the memory bandwidth a
real 4N-executor cluster would have — this measurement is a LOWER BOUND on
cluster scaling for this pipeline. The plan's shuffles all carry
aggregates (verdicts, histograms, duplicate keys), the dims are broadcast,
and the dominant cost — the fused row-check projection — is embarrassingly
parallel over scan partitions, so executor scaling on a real cluster
tracks scan parallelism by construction.
"""
    out_path = REPO / "BENCH" / "BASELINE.md"
    out_path.write_text(md)
    print(json.dumps({"N": lo, "4N": hi, "efficiency": round(eff, 3)}))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
