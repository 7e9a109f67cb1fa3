"""Scaling-efficiency evidence for the round-6 training-data operators
(BENCH.md; same N vs 4N methodology as tools/scaling_bench.py — cores
stand in for executors in this sandbox).

Jobs measured (each a fresh JVM per parallelism level, best-of-2 on
identical pre-materialized input):

- ``line_dedup``: corpus-level keep-first line dedup over a 3-line-doc
  table (explode → map-side winner election on md5(line) → skew-free
  composite rejoin → per-doc rebuild).
- ``decontam``: benchmark n-gram contamination scoring, Bloom path
  (JVM gram hashing → row-local Bloom probe, no shuffle).

Usage: python tools/scaling_bench_ops.py [table_dir] [N]
       (measures local[N] vs local[4N]; default N=2)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

GEN = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from gr_tdigest_spark.plans import get_spark
path = sys.argv[1]
spark = get_spark(cores=32, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
t = F.col("text")
# replicate the 5k-doc fixture 10x (distinct ids, perturbed text so
# replicas are not exact line-dups of each other) -> a corpus large
# enough that the parallel fraction dominates the fixed driver-side
# job costs in the scaling measurement
rep = spark.range(10).select(F.col("id").alias("rep"))
three = docs.crossJoin(rep).select(
    (F.col("doc_id") * 100 + F.col("rep")).alias("doc_id"),
    F.concat(
        t, F.lit(" r"), F.col("rep").cast("string"), F.lit("\n"),
        t, F.lit("\n"), t, F.lit(" tail"),
        F.col("rep").cast("string"),
    ).alias("text"),
)
three.repartition(64).write.mode("overwrite").parquet(path)
print("WROTE", spark.read.parquet(path).count())
spark.stop()
"""

MEASURE = r"""
import sys, time, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from gr_tdigest_spark.plans import get_spark
from gr_tdigest_spark.operators.dedup import dedup_lines
from gr_tdigest_spark.operators.contamination import contamination_scores
cores, path = int(sys.argv[1]), sys.argv[2]
dpath = sys.argv[3] if len(sys.argv) > 3 else path
spark = get_spark(app=f"scale-ops-{cores}", cores=cores,
                  shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(path)
n_docs = docs.count()
ddocs = spark.read.parquet(dpath)
nd_docs = ddocs.count()
from gr_tdigest_spark.operators.contamination import (
    build_contamination_filter,
)
bench = ddocs.where("doc_id % 170 = 0").select(
    "doc_id", F.split("text", "\n")[0].alias("text")
)
# the amortized 100 TB shape: the eval-set filter is built ONCE per
# benchmark, outside the per-corpus scoring job being measured
flt = build_contamination_filter(bench, n=8)

def best2(fn):
    best = None
    for _ in range(2):
        t0 = time.perf_counter(); fn(); d = time.perf_counter() - t0
        best = d if best is None else min(best, d)
    return best

out = {"cores": cores, "n_docs": n_docs, "nd_docs": nd_docs}
out["line_dedup_s"] = best2(lambda: dedup_lines(docs, "doc_id").agg(
    F.sum("n_lines_kept"), F.sum("n_lines_removed")).collect())
out["decontam_s"] = best2(lambda: contamination_scores(
    ddocs, "doc_id", flt, method="bloom"
).agg(F.sum("n_hit"), F.count("*")).collect())
out["line_dedup_docs_per_s"] = n_docs / out["line_dedup_s"]
out["decontam_docs_per_s"] = nd_docs / out["decontam_s"]
spark.stop()
print("RESULT " + json.dumps(out))
"""


def run_py(code: str, *args: str) -> str:
    r = subprocess.run(
        [sys.executable, "-c", code, *args],
        capture_output=True, text=True, timeout=2400,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return r.stdout


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_ops_docs"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    # decontam can run on a SMALLER table than line_dedup (its per-doc
    # gram cost is ~10x line dedup's): optional third arg
    dpath = sys.argv[3] if len(sys.argv) > 3 else path
    if not os.path.exists(path):
        print(run_py(GEN, path).strip())
    levels = {}
    for cores in (n, 4 * n):
        out = run_py(MEASURE, str(cores), path, dpath)
        line = [ln for ln in out.splitlines()
                if ln.startswith("RESULT ")][-1]
        levels[cores] = json.loads(line[len("RESULT "):])
        print(json.dumps(levels[cores]))
    eff = {
        op: levels[4 * n][f"{op}_docs_per_s"]
        / levels[n][f"{op}_docs_per_s"] / 4.0
        for op in ("line_dedup", "decontam")
    }
    print(json.dumps({"N": n, "efficiency": eff}))


if __name__ == "__main__":
    main()
