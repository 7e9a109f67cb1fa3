"""Benchmark harness: headline sketch queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "rows_per_sec": ...,
   "turns_per_sec": ...}

The headline metric mirrors BASELINE.json: sketch-build throughput
(rows/sec through the two-phase t-digest aggregate) plus per-query
wall times. Scaling-efficiency evidence (local[8] vs local[32]) is
produced by tools/scaling_bench.py and recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    import gr_tdigest_spark.functions as Fn
    from gr_tdigest_spark.operators import tdigest_agg
    from gr_tdigest_spark.operators.companions import (
        cms_agg, cms_estimate, hll_agg, hll_estimate, kll_agg, kll_quantile,
    )
    from gr_tdigest_spark.plans import get_spark

    spark = get_spark(app="gr-tdigest-bench", cores=cpus,
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    li_rows = li.count()
    ev_rows = ev.count()
    # warm the JVM AND the python workers (a pandas-UDF pass spawns and
    # imports in every worker, so timings below reflect steady state)
    tdigest_agg(li.limit(5000), None, "l_extendedprice", max_size=100)\
        .select(Fn.tdigest_count("tdigest")).collect()

    timings: dict[str, float] = {}

    def bench(name, fn):
        # steady-state methodology: best-of-3 (first pass pays one-off
        # UDF-closure ship + plan compile; a third pass damps the ±25%
        # run-to-run scheduler noise observed on sub-2 s queries)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    bench(
        "q1_tdigest_group",
        lambda: tdigest_agg(li, ["l_returnflag", "l_linestatus"],
                            "l_extendedprice", max_size=1000)
        .select("l_returnflag", "l_linestatus",
                Fn.tdigest_quantiles("tdigest", [0.5, 0.95, 0.99]))
        .collect(),
    )
    bench(
        "q2_tdigest_global",
        lambda: tdigest_agg(li, None, "l_extendedprice", max_size=1000)
        .select(Fn.tdigest_quantile("tdigest", 0.5)).collect(),
    )
    bench(
        "q3_tdigest_highkey",
        lambda: tdigest_agg(li, ["l_orderkey"], "l_extendedprice",
                            max_size=100)
        .agg(F.count("*")).collect(),
    )
    bench(
        "q4_hll_distinct",
        lambda: hll_agg(ev, ["event_type"], "user_id", p=14)
        .select(hll_estimate("hll")).collect(),
    )
    bench(
        "q5_cms_heavyhitters",
        lambda: cms_agg(ev, None, "event_type")
        .select(cms_estimate("cms", ["click", "view", "error"])).collect(),
    )
    bench(
        "q6_kll_quantiles",
        lambda: kll_agg(ev, ["event_type"], "value", k=200)
        .select(kll_quantile("kll", 0.5)).collect(),
    )

    from gr_tdigest_spark.operators.dedup import dedup_exact
    from gr_tdigest_spark.operators.similarity import cosine_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bench(
        "q8_dedup_exact",
        lambda: dedup_exact(docs, "doc_id", "text").agg(F.count("*")).collect(),
    )
    qvec = emb.first()["embedding"]
    bench(
        "q9_embed_topk",
        lambda: cosine_topk(emb, qvec, k=10).collect(),
    )
    from gr_tdigest_spark.operators.companions import cms_topk
    bench(
        "q10_hh_topk",
        lambda: cms_topk(ev, ["event_type"], "user_id", k=5, m=512,
                         width=1 << 16).collect(),
    )

    from gr_tdigest_spark.operators.companions import (
        minhash_agg, minhash_jaccard,
    )

    def run_minhash():
        # persist the sketch-sized table so the pairwise self-join does
        # not rebuild the signatures (rescan the fact table) per side
        mh = minhash_agg(li, ["l_returnflag"], "l_orderkey", k=256).persist()
        a = mh.select(F.col("l_returnflag").alias("fa"),
                      F.col("minhash").alias("ma"))
        b = mh.select(F.col("l_returnflag").alias("fb"),
                      F.col("minhash").alias("mb"))
        a.join(b, F.col("fa") < F.col("fb")).select(
            "fa", "fb", minhash_jaccard("ma", "mb").alias("j")
        ).collect()
        mh.unpersist()

    bench("q11_minhash_jaccard", run_minhash)

    # high-cardinality distinct-count: one HLL per l_orderkey (~150k
    # groups at sf0.1) — exercises the vectorized multi-group builder
    # + sparse partial wire (dense partials would be ~2.4 GB of shuffle)
    bench(
        "q12_hll_highkey",
        lambda: hll_agg(li, ["l_orderkey"], "l_partkey", p=14)
        .agg(F.count("*")).collect(),
    )

    # deterministic stratified sampling (bottom-k sketch path): 1000
    # order-keys per returnflag out of 600k rows — bounded partial
    # state per group + broadcast semi-join back
    from gr_tdigest_spark.operators.sample import (
        stratified_sample, weighted_sample,
    )
    bench(
        "q13_stratified_sample",
        lambda: stratified_sample(li, "l_returnflag", 1000, "l_orderkey")
        .agg(F.count("*")).collect(),
    )

    # keyed WEIGHTED sampling through the bounded-state race sketch
    # (r5): 1000 weighted order-keys per returnflag — the same
    # hot-group shape as q13 but with the Efraimidis–Spirakis priority.
    # Weight is a function of the id (the A-ES model: one weight per id)
    liw = li.withColumn(
        "__w", (F.col("l_orderkey") % 97 + 1).cast("double")
    )
    bench(
        "q14_weighted_sample_keys",
        lambda: weighted_sample(liw, 1000, "l_orderkey", "__w",
                                seed=5, keys="l_returnflag")
        .agg(F.count("*")).collect(),
    )

    # sequence packing: 600k docs into 8192-token context windows over
    # 64 hash buckets (bucketed window cumsum — no global window)
    from gr_tdigest_spark.operators.pack import pack_sequences
    lit = li.withColumn(
        "__tok", (F.col("l_extendedprice") % 1000 + 50).cast("long")
    )
    bench(
        "q15_pack_sequences",
        lambda: pack_sequences(lit, "l_orderkey", "__tok", 8192,
                               n_buckets=64)
        .groupBy("pack_id").agg(F.sum("__tok"))
        .agg(F.count("*")).collect(),
    )

    # benchmark decontamination over the docs corpus, Bloom path (r6):
    # the shuffle-free shape — one Bloom blob of the benchmark's
    # 8-gram hashes, then a row-local probe of every doc's JVM-hashed
    # gram array (no join, no shuffle on the corpus side)
    from gr_tdigest_spark.operators.contamination import (
        contamination_scores,
    )
    # the fixture corpus is ONE ~50 MB parquet file → a 1-task scan;
    # the bloom path is deliberately shuffle-free, so without a
    # repartition the whole probe would inherit that single task. A
    # real corpus arrives as thousands of files (scan parallelism for
    # free) — restore the representative shape, once, outside timing.
    docs_p = docs.repartition(cpus).persist()
    docs_p.count()
    doc_bench = docs.where(F.col("doc_id") % 17 == 0)
    bench(
        "q16_decontaminate_bloom",
        lambda: contamination_scores(
            docs_p, "doc_id", doc_bench, n=8, method="bloom"
        ).agg(F.sum("n_hit"), F.count("*")).collect(),
    )

    # corpus-level line dedup, keep_first (r6): 3-line docs (the
    # text_stats synthesis) → explode, map-side-combined winner
    # election on md5(line), skew-free composite rejoin, per-doc
    # rebuild — the C4 boilerplate-removal shape
    from gr_tdigest_spark.operators.dedup import dedup_lines
    t3 = F.col("text")
    docs3 = docs_p.select(
        "doc_id",
        F.concat(t3, F.lit("\n"), t3, F.lit("\n"), t3).alias("text"),
    )
    bench(
        "q17_line_dedup",
        lambda: dedup_lines(docs3, "doc_id")
        .agg(F.sum("n_lines_kept"), F.sum("n_lines_removed")).collect(),
    )
    docs_p.unpersist()

    # transcript sketch-build throughput (turns/sec), the BASELINE metric
    from gr_tdigest_spark.sources.transcripts import transcripts_df

    # 8000 conversations ≈ 2.6M turns — big enough that per-job fixed
    # costs don't dominate the turns/sec headline. Cache only the
    # aggregate's columns: a full-width (26 GB text) cache starves
    # concurrent hash-agg tasks of execution memory (cached blocks are
    # pinned by the very tasks that need the memory) — and a parquet
    # scan would prune to these columns anyway.
    n_convs = int(os.environ.get("SPARK_GRAFT_CONVS", "8000"))
    t = transcripts_df(spark, n_convs=n_convs, seed=42)
    t = t.withColumn("len", F.length("text")).select("role", "len").persist()
    n_turns = t.count()  # materialize generation outside the timed window
    dt = None
    for _ in range(3):
        t0 = time.perf_counter()
        tdigest_agg(t, ["role"], "len", max_size=1000).select(
            "role", Fn.tdigest_quantile("tdigest", 0.5)
        ).collect()
        d = time.perf_counter() - t0
        dt = d if dt is None else min(dt, d)
    timings["q7_transcript_tdigest"] = round(dt, 3)
    turns_per_sec = n_turns / dt if dt > 0 else 0.0

    # same sketch via JVM pile pre-aggregation (groupBy(role, len) hash
    # agg with map-side combine; only distinct values cross Arrow) —
    # the plan of choice for discrete metrics at the 100 TB target
    dtp = None
    for _ in range(3):
        t0 = time.perf_counter()
        tdigest_agg(t, ["role"], "len", max_size=1000,
                    pre_aggregate=True).select(
            "role", Fn.tdigest_quantile("tdigest", 0.5)
        ).collect()
        d = time.perf_counter() - t0
        dtp = d if dtp is None else min(dtp, d)
    timings["q7b_transcript_pileagg"] = round(dtp, 3)
    turns_per_sec_pile = n_turns / dtp if dtp > 0 else 0.0
    t.unpersist()

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    line = json.dumps({
        "metric": "sketch_suite_wall",
        "methodology": "best-of-3 per query (steady state)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "rows": {"lineitem": li_rows, "events": ev_rows, "turns": n_turns},
        "rows_per_sec": round(li_rows / timings["q1_tdigest_group"], 1),
        "turns_per_sec": round(turns_per_sec, 1),
        "turns_per_sec_pileagg": round(turns_per_sec_pile, 1),
        "cpus": cpus,
    })

    # durable copy first: survives any amount of teardown noise
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH.json"), "w") as fh:
        fh.write(line + "\n")

    # JVM teardown at local[32] can spew RejectedExecutionException stack
    # traces (AQE exchange threads racing the executor pool shutdown) on
    # fd 2, which the py4j-launched JVM shares with this process. If the
    # harness merges 2>&1 that spam drowns the metric line out of a
    # captured tail — so: silence fd 2, stop the JVM, let its threads
    # drain, and ONLY THEN print the metric line as the very last stdout.
    sys.stdout.flush()
    sys.stderr.flush()
    devnull = os.open(os.devnull, os.O_WRONLY)
    os.dup2(devnull, 2)
    try:
        spark.stop()
    except Exception:
        pass
    time.sleep(1.5)
    print(line)
    sys.stdout.flush()


if __name__ == "__main__":
    main()
