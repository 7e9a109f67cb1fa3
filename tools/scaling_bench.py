"""Scaling-efficiency evidence for BENCH.md (BASELINE.json: ≥0.8 from
N to 4N parallelism; cores stand in for executors in this sandbox).

Runs the SAME sketch-build job at local[8] and local[32] on identical
input in separate processes (fresh JVM each), reports throughput at
both plus efficiency = throughput_32 / (4 · throughput_8).

Usage: python tools/scaling_bench.py [n_convs] [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
import gr_tdigest_spark.functions as Fn
from gr_tdigest_spark.operators import tdigest_agg
from gr_tdigest_spark.operators.companions import hll_agg, hll_estimate
from gr_tdigest_spark.plans import get_spark
from gr_tdigest_spark.sources.transcripts import transcripts_df

cores = int(sys.argv[1]); n_convs = int(sys.argv[2]); sf_dir = sys.argv[3]
os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
spark = get_spark(app=f"scale-{cores}", cores=cores, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")

# warm JVM + python workers with a tiny pass so the timed run measures
# steady state
warm = transcripts_df(spark, n_convs=50, seed=1, slices=cores)
tdigest_agg(warm.select("role", F.length("text").cast("double").alias("len")),
            ["role"], "len", max_size=100).select(
    Fn.tdigest_count("tdigest")).collect()
n_turns_known = None

# timed: the BASELINE metric job end-to-end — materialize the transcript
# table (the sandbox stand-in for the 100 TB table scan) and build the
# per-role t-digest of text length, then query it. One pass, one job.
t0 = time.perf_counter()
t = transcripts_df(spark, n_convs=n_convs, seed=42, slices=cores * 8)
t = t.select("role", F.length("text").cast("double").alias("len"))
dg = tdigest_agg(t, ["role"], "len", max_size=1000)
res = dg.select(
    "role", Fn.tdigest_quantile("tdigest", 0.5).alias("p50"),
    Fn.tdigest_quantile("tdigest", 0.99).alias("p99"),
    Fn.tdigest_count("tdigest").alias("n")).collect()
dt = time.perf_counter() - t0
n_turns = int(sum(r["n"] for r in res))
print(json.dumps({"cores": cores, "turns": n_turns, "sec": dt,
                  "turns_per_sec": n_turns / dt}))
spark.stop()
"""


def run(cores: int, n_convs: int, sf_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), str(n_convs), sf_dir],
        capture_output=True, text=True, timeout=1800,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker {cores} failed:\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    # N and 4N parallelism. Default 2→8: this sandbox's nominal 32 CPUs
    # saturate at ~12-16 effective cores (raw multiprocessing throughput
    # scales only 1.55× from 8→32 procs), so 8→32 cannot evidence
    # software scaling; 2→8 runs on genuinely available cores.
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    n4 = 4 * n
    results = {}
    for cores in (n, n4):
        results[cores] = run(cores, n_convs, sf_dir)
        print(json.dumps(results[cores]))
    eff = results[n4]["turns_per_sec"] / (4 * results[n]["turns_per_sec"])
    print(json.dumps({
        "n_parallelism": n,
        "n4_parallelism": n4,
        "throughput_n": round(results[n]["turns_per_sec"], 1),
        "throughput_4n": round(results[n4]["turns_per_sec"], 1),
        "scaling_efficiency": round(eff, 3),
        "turns": results[n]["turns"],
    }))


if __name__ == "__main__":
    main()
