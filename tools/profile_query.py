"""Per-stage profiler for the bench queries: rebuilds the query FRESH
per repetition (like bench.py — no AQE stage-result reuse), times
best-of-N, and prints the per-job/per-stage breakdown of the last rep
from the live UI REST API.

Usage: python tools/profile_query.py q7 q11 ...  (default: a core set)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    import gr_tdigest_spark.functions as Fn
    from gr_tdigest_spark.operators import tdigest_agg
    from gr_tdigest_spark.operators.companions import (
        cms_agg, cms_estimate, cms_topk, hll_agg, hll_estimate, kll_agg,
        kll_quantile, minhash_agg, minhash_jaccard,
    )
    from gr_tdigest_spark.plans import get_spark

    spark = get_spark(app="gr-tdigest-profile", cores=cpus,
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # warm workers
    tdigest_agg(li.limit(5000), None, "l_extendedprice", max_size=100)\
        .select(Fn.tdigest_count("tdigest")).collect()

    ui = sc.uiWebUrl
    app = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications"))[0]["id"]

    def get(path):
        return json.load(urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/{path}"))

    def profile(name, mk, reps=4):
        best = None
        for _ in range(reps - 1):
            t0 = time.perf_counter()
            mk()
            d = time.perf_counter() - t0
            best = d if best is None else min(best, d)
        before = {j["jobId"] for j in get("jobs")}
        t0 = time.perf_counter()
        mk()
        d = time.perf_counter() - t0
        best = d if best is None else min(best, d)
        time.sleep(0.4)
        js = [j for j in get("jobs") if j["jobId"] not in before]
        print(f"== {name}: best {best:.3f}  last {d:.3f}  "
              f"jobs {len(js)}")
        stages = {s["stageId"]: s for s in get("stages?status=complete")}

        def ts(s, k):
            return datetime.fromisoformat(
                s[k].replace("GMT", "+00:00")).timestamp()

        for j in sorted(js, key=lambda x: x["jobId"]):
            for sid in sorted(j["stageIds"]):
                s = stages.get(sid)
                if s is None:
                    print(f"   job {j['jobId']} stage {sid}: skipped")
                    continue
                print(
                    f"   job {j['jobId']} stage {sid} "
                    f"tasks {s['numCompleteTasks']:>3} "
                    f"dur {ts(s, 'completionTime') - ts(s, 'submissionTime'):6.3f} "
                    f"exec {s['executorRunTime'] / 1000:6.3f}s "
                    f"{s['name'][:55]}"
                )

    queries = {}
    queries["q1"] = lambda: tdigest_agg(
        li, ["l_returnflag", "l_linestatus"], "l_extendedprice",
        max_size=1000,
    ).select("l_returnflag", "l_linestatus",
             Fn.tdigest_quantiles("tdigest", [0.5, 0.95, 0.99])).collect()
    queries["q2"] = lambda: tdigest_agg(
        li, None, "l_extendedprice", max_size=1000,
    ).select(Fn.tdigest_quantile("tdigest", 0.5)).collect()
    queries["q3"] = lambda: tdigest_agg(
        li, ["l_orderkey"], "l_extendedprice", max_size=100,
    ).agg(F.count("*")).collect()
    queries["q4"] = lambda: hll_agg(ev, ["event_type"], "user_id", p=14)\
        .select(hll_estimate("hll")).collect()
    queries["q5"] = lambda: cms_agg(ev, None, "event_type")\
        .select(cms_estimate("cms", ["click", "view", "error"])).collect()
    queries["q6"] = lambda: kll_agg(ev, ["event_type"], "value", k=200)\
        .select(kll_quantile("kll", 0.5)).collect()
    queries["q10"] = lambda: cms_topk(
        ev, ["event_type"], "user_id", k=5, m=512, width=1 << 16).collect()

    def q11():
        mh = minhash_agg(li, ["l_returnflag"], "l_orderkey",
                         k=256).persist()
        a = mh.select(F.col("l_returnflag").alias("fa"),
                      F.col("minhash").alias("ma"))
        b = mh.select(F.col("l_returnflag").alias("fb"),
                      F.col("minhash").alias("mb"))
        a.join(b, F.col("fa") < F.col("fb")).select(
            "fa", "fb", minhash_jaccard("ma", "mb").alias("j")).collect()
        mh.unpersist()
    queries["q11"] = q11
    queries["q12"] = lambda: hll_agg(
        li, ["l_orderkey"], "l_partkey", p=14).agg(F.count("*")).collect()

    from gr_tdigest_spark.operators.sample import (
        stratified_sample, weighted_sample,
    )
    queries["q13"] = lambda: stratified_sample(
        li, "l_returnflag", 1000, "l_orderkey").agg(F.count("*")).collect()
    liw = li.withColumn("__w",
                        (F.col("l_orderkey") % 97 + 1).cast("double"))
    queries["q14"] = lambda: weighted_sample(
        liw, 1000, "l_orderkey", "__w", seed=5, keys="l_returnflag",
    ).agg(F.count("*")).collect()

    from gr_tdigest_spark.operators.pack import pack_sequences
    lit = li.withColumn(
        "__tok", (F.col("l_extendedprice") % 1000 + 50).cast("long"))
    queries["q15"] = lambda: pack_sequences(
        lit, "l_orderkey", "__tok", 8192, n_buckets=64,
    ).groupBy("pack_id").agg(F.sum("__tok")).agg(F.count("*")).collect()

    from gr_tdigest_spark.operators.contamination import (
        contamination_scores,
    )
    from gr_tdigest_spark.operators.dedup import dedup_exact, dedup_lines

    docs_p = docs.repartition(cpus).persist()
    docs_p.count()
    doc_bench = docs.where(F.col("doc_id") % 17 == 0)
    queries["q16"] = lambda: contamination_scores(
        docs_p, "doc_id", doc_bench, n=8, method="bloom",
    ).agg(F.sum("n_hit"), F.count("*")).collect()
    t3 = F.col("text")
    docs3 = docs_p.select(
        "doc_id",
        F.concat(t3, F.lit("\n"), t3, F.lit("\n"), t3).alias("text"),
    )
    queries["q17"] = lambda: dedup_lines(docs3, "doc_id")\
        .agg(F.sum("n_lines_kept"), F.sum("n_lines_removed")).collect()
    queries["q8"] = lambda: dedup_exact(docs, "doc_id", "text")\
        .agg(F.count("*")).collect()

    from gr_tdigest_spark.sources.transcripts import transcripts_df
    t = None

    def load_t():
        nonlocal t
        if t is None:
            tt = transcripts_df(spark, n_convs=8000, seed=42)
            t = tt.withColumn("len", F.length("text"))\
                .select("role", "len").persist()
            t.count()
        return t

    queries["q7"] = lambda: tdigest_agg(
        load_t(), ["role"], "len", max_size=1000,
    ).select("role", Fn.tdigest_quantile("tdigest", 0.5)).collect()
    queries["q7b"] = lambda: tdigest_agg(
        load_t(), ["role"], "len", max_size=1000, pre_aggregate=True,
    ).select("role", Fn.tdigest_quantile("tdigest", 0.5)).collect()

    for name in (names or list(queries)):
        profile(name, queries[name])
    spark.stop()


if __name__ == "__main__":
    main()
