"""Physical-plan shape guards.

PLANS.md documents the intended shapes; these tests pin them so a
refactor can't silently regress scan pruning, shuffle counts, or the
top-k strategy. Counting `Exchange` nodes in the final physical plan
is the cheap proxy for "no extra shuffles appeared"."""

import re

import pytest

from pyspark.sql import functions as F


def _plan(df) -> str:
    # NOTE: must be executedPlan, not sparkPlan — sparkPlan precedes the
    # EnsureRequirements preparation rule, so it only contains EXPLICIT
    # repartition Exchanges, never the ones Spark inserts for aggregates.
    # executedPlan before any action is the initial AQE plan
    # (isFinalPlan=false): stable, and includes ENSURE_REQUIREMENTS hops.
    return df._jdf.queryExecution().executedPlan().toString()


_optimized = _plan


def _n_exchanges(df) -> int:
    return len(re.findall(r"\bExchange\b", _optimized(df)))


class TestTDigestAggPlans:
    def test_row_path_single_sketch_exchange(self, spark, sf_dir):
        from gr_tdigest_spark.operators import tdigest_agg

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        dg = tdigest_agg(li, ["l_returnflag"], "l_extendedprice",
                         max_size=200)
        # exactly ONE shuffle: partial blobs repartitioned by key
        assert _n_exchanges(dg) == 1

    def test_scan_pruned_to_needed_columns(self, spark, sf_dir):
        from gr_tdigest_spark.operators import tdigest_agg

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        dg = tdigest_agg(li, ["l_returnflag"], "l_extendedprice",
                         max_size=200)
        plan = _plan(dg)
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m, plan
        cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
        assert cols == {"l_returnflag", "l_extendedprice"}

    def test_pile_preagg_two_exchanges(self, spark, sf_dir):
        from gr_tdigest_spark.operators import tdigest_agg

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        dg = tdigest_agg(li, ["l_returnflag"], "l_quantity",
                         max_size=200, pre_aggregate=True)
        # pile shuffle (keys, value) + sketch shuffle (keys)
        assert _n_exchanges(dg) == 2
        # and the pile aggregate is JVM codegen, with a map-side partial
        plan = _optimized(dg)
        assert "HashAggregate" in plan and "partial_count" in plan

    def test_salted_path_two_hops(self, spark, sf_dir):
        from gr_tdigest_spark.operators import tdigest_agg

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        dg = tdigest_agg(li, ["l_returnflag"], "l_extendedprice",
                         max_size=200, salt_buckets=4)
        # salt hop + de-salt hop, both sketch-sized
        assert _n_exchanges(dg) == 2


class TestQueryPlans:
    def test_bottomk_agg_single_exchange_pruned(self, spark, sf_dir):
        """The bottom-k sampler aggregates like every other sketch:
        one shuffle of sketch-sized partials, scan pruned to
        (keys, value)."""
        from gr_tdigest_spark.operators.companions import bottomk_agg

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        sk = bottomk_agg(li, ["l_returnflag"], "l_orderkey", k=32)
        assert _n_exchanges(sk) == 1
        m = re.search(r"ReadSchema: struct<([^>]*)>", _plan(sk))
        cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
        assert cols == {"l_returnflag", "l_orderkey"}

    def test_assign_split_zero_exchanges(self, spark, sf_dir):
        from gr_tdigest_spark.operators.sample import assign_split

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        out = assign_split(li, "l_orderkey", {"a": 0.5, "b": 0.5})
        assert _n_exchanges(out) == 0

    def test_weighted_sample_take_ordered(self, spark, sf_dir):
        from gr_tdigest_spark.operators.sample import weighted_sample

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        s = weighted_sample(li, 50, "l_orderkey", "l_quantity")
        assert "TakeOrderedAndProject" in _plan(s)

    def test_cosine_topk_is_take_ordered(self, spark, sf_dir):
        from gr_tdigest_spark.operators.similarity import cosine_topk

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q = emb.first()["embedding"]
        plan = _optimized(cosine_topk(emb, q, k=5))
        # top-k must NOT materialize a global sort
        assert "TakeOrderedAndProject" in plan

    def test_broadcast_cdf_adds_no_shuffle(self, spark, sf_dir):
        """The probe pass ships a broadcast VARIABLE, not a join — the
        fact table must not be shuffled at all."""
        from gr_tdigest_spark.operators.window import with_group_cdf

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_returnflag", "l_extendedprice"
        )
        out = with_group_cdf(
            li, ["l_returnflag"], "l_extendedprice", max_size=200
        )
        assert _n_exchanges(out) == 0

    def test_exact_dedup_single_exchange_semi_join(self, spark, sf_dir):
        from gr_tdigest_spark.operators.dedup import dedup_exact

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = dedup_exact(docs, "doc_id", "text")
        plan = _optimized(out)
        assert "LeftSemi" in plan


class TestAQESkewJoin:
    def test_skewed_join_is_split_by_aqe(self, spark):
        """north_rule: 'AQE skew handling made explicit for hot
        conversations'. A hot-key fact-fact join must show AQE's skew
        split in the FINAL adaptive plan (SortMergeJoin(skew=true)).
        Production knobs (SKETCH_CONFS enables skewJoin; thresholds
        here are shrunk to test scale): when a downstream stage masks
        the skew decision, forceOptimizeSkewedJoin opts into the split
        even if it adds a shuffle — the right trade at 100 TB where one
        hot conversation would otherwise pin a single reduce task."""
        saved = {}
        confs = {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                "10k",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8k",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.5",
            "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        }
        for k, v in confs.items():
            saved[k] = spark.conf.get(k, None)
            spark.conf.set(k, v)
        try:
            left = spark.range(0, 300_000).select(
                F.when(F.col("id") < 280_000, F.lit("hot"))
                .otherwise((F.col("id") % 50).cast("string")).alias("k"),
                F.col("id").alias("v"),
            )
            right = (
                spark.range(0, 2_000).select(
                    (F.col("id") % 60).cast("string").alias("k"),
                    F.col("id").alias("w"),
                )
                .union(spark.range(0, 200).select(
                    F.lit("hot").alias("k"), F.col("id").alias("w")))
            )
            cnt = left.join(right, "k").groupBy().count()
            rows = cnt.collect()[0][0]
            plan = cnt._jdf.queryExecution().executedPlan().toString()
            assert "isFinalPlan=true" in plan
            assert "skew=true" in plan, plan
            # the split preserves results: same count with skew
            # optimization off
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
            try:
                rows_noskew = (
                    left.join(right, "k").groupBy().count().collect()[0][0]
                )
            finally:
                spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
            assert rows == rows_noskew and rows > 0
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
