"""Dump .explain("formatted") for every bench query shape into
plans/r07/<query>_<tag>.txt (tag = before/after).

Usage: python tools/dump_plans.py <tag>

Mirrors bench.py's query construction exactly (same operators, same
arguments) so the committed plans are the plans the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import functions as F

    import gr_tdigest_spark.functions as Fn
    from gr_tdigest_spark.operators import tdigest_agg
    from gr_tdigest_spark.operators.companions import (
        cms_agg, cms_estimate, cms_topk, hll_agg, hll_estimate, kll_agg,
        kll_quantile, minhash_agg, minhash_jaccard,
    )
    from gr_tdigest_spark.plans import get_spark

    spark = get_spark(app="gr-tdigest-plandump", cores=cpus,
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def dump(name, df):
        p = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(p)
        print("dumped", name)

    dump("q1_tdigest_group", tdigest_agg(
        li, ["l_returnflag", "l_linestatus"], "l_extendedprice",
        max_size=1000,
    ).select("l_returnflag", "l_linestatus",
             Fn.tdigest_quantiles("tdigest", [0.5, 0.95, 0.99])))
    dump("q2_tdigest_global", tdigest_agg(
        li, None, "l_extendedprice", max_size=1000,
    ).select(Fn.tdigest_quantile("tdigest", 0.5)))
    dump("q3_tdigest_highkey", tdigest_agg(
        li, ["l_orderkey"], "l_extendedprice", max_size=100,
    ).agg(F.count("*")))
    dump("q4_hll_distinct", hll_agg(
        ev, ["event_type"], "user_id", p=14,
    ).select(hll_estimate("hll")))
    dump("q5_cms_heavyhitters", cms_agg(ev, None, "event_type")
         .select(cms_estimate("cms", ["click", "view", "error"])))
    dump("q6_kll_quantiles", kll_agg(
        ev, ["event_type"], "value", k=200,
    ).select(kll_quantile("kll", 0.5)))

    from gr_tdigest_spark.operators.dedup import dedup_exact, dedup_lines
    from gr_tdigest_spark.operators.similarity import cosine_topk

    dump("q8_dedup_exact",
         dedup_exact(docs, "doc_id", "text").agg(F.count("*")))
    qvec = emb.first()["embedding"]
    dump("q9_embed_topk", cosine_topk(emb, qvec, k=10))
    dump("q10_hh_topk", cms_topk(ev, ["event_type"], "user_id", k=5,
                                 m=512, width=1 << 16))

    mh = minhash_agg(li, ["l_returnflag"], "l_orderkey", k=256)
    a = mh.select(F.col("l_returnflag").alias("fa"),
                  F.col("minhash").alias("ma"))
    b = mh.select(F.col("l_returnflag").alias("fb"),
                  F.col("minhash").alias("mb"))
    dump("q11_minhash_jaccard", a.join(b, F.col("fa") < F.col("fb")).select(
        "fa", "fb", minhash_jaccard("ma", "mb").alias("j")))

    dump("q12_hll_highkey", hll_agg(
        li, ["l_orderkey"], "l_partkey", p=14,
    ).agg(F.count("*")))

    from gr_tdigest_spark.operators.sample import (
        stratified_sample, weighted_sample,
    )
    dump("q13_stratified_sample", stratified_sample(
        li, "l_returnflag", 1000, "l_orderkey").agg(F.count("*")))
    liw = li.withColumn("__w", (F.col("l_orderkey") % 97 + 1).cast("double"))
    dump("q14_weighted_sample_keys", weighted_sample(
        liw, 1000, "l_orderkey", "__w", seed=5, keys="l_returnflag",
    ).agg(F.count("*")))

    from gr_tdigest_spark.operators.pack import pack_sequences
    lit = li.withColumn("__tok",
                        (F.col("l_extendedprice") % 1000 + 50).cast("long"))
    dump("q15_pack_sequences", pack_sequences(
        lit, "l_orderkey", "__tok", 8192, n_buckets=64,
    ).groupBy("pack_id").agg(F.sum("__tok")).agg(F.count("*")))

    from gr_tdigest_spark.operators.contamination import contamination_scores
    docs_p = docs.repartition(cpus)
    doc_bench = docs.where(F.col("doc_id") % 17 == 0)
    dump("q16_decontaminate_bloom", contamination_scores(
        docs_p, "doc_id", doc_bench, n=8, method="bloom",
    ).agg(F.sum("n_hit"), F.count("*")))

    docs3 = docs_p.select(
        "doc_id",
        F.concat(F.col("text"), F.lit("\n"), F.col("text"), F.lit("\n"),
                 F.col("text")).alias("text"),
    )
    dump("q17_line_dedup", dedup_lines(docs3, "doc_id")
         .agg(F.sum("n_lines_kept"), F.sum("n_lines_removed")))

    from gr_tdigest_spark.sources.transcripts import transcripts_df
    t = transcripts_df(spark, n_convs=200, seed=42)
    t = t.withColumn("len", F.length("text")).select("role", "len")
    dump("q7_transcript_tdigest", tdigest_agg(
        t, ["role"], "len", max_size=1000,
    ).select("role", Fn.tdigest_quantile("tdigest", 0.5)))
    dump("q7b_transcript_pileagg", tdigest_agg(
        t, ["role"], "len", max_size=1000, pre_aggregate=True,
    ).select("role", Fn.tdigest_quantile("tdigest", 0.5)))

    spark.stop()


if __name__ == "__main__":
    main()
