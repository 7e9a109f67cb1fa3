"""Bucket-size guard for the LSH-family self-joins (operators.skew).

Round-2 verdict: a degenerate bucket (boilerplate text / duplicated
embeddings) makes the within-bucket self-join quadratic at web scale.
The guard sub-splits oversized buckets by a secondary id hash, bounding
per-bucket fan-out while preserving exact results when no bucket
exceeds the cap.
"""

import pytest

from pyspark.sql import functions as F


def _boilerplate_docs(spark, n=2000):
    """n identical docs — every LSH band hashes them into ONE bucket."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit(
            "the quick brown fox jumps over the lazy dog again and again"
        ).alias("text"),
    )


class TestSubsplit:
    def test_degenerate_bucket_pairs_bounded(self, spark):
        """2000 identical docs in one bucket: uncapped LSH would emit
        C(2000,2) ≈ 2M pairs/band; capped at 50, each sub-bucket emits
        ≤ C(~50,2), so the distinct pair count collapses by ~40×."""
        from gr_tdigest_spark.operators.dedup import (
            lsh_candidate_pairs, minhash_signatures,
        )

        docs = _boilerplate_docs(spark)
        sigs = minhash_signatures(docs, "doc_id").persist()
        try:
            capped = lsh_candidate_pairs(
                sigs, "doc_id", max_bucket_size=50
            ).count()
            # 2000 rows / cap 50 → 40 sub-buckets of ~50 → ≤ 40·C(51,2)
            assert 0 < capped <= 40 * (51 * 50) // 2
            # far below the uncapped C(2000,2) = 1_999_000
            assert capped < 120_000
        finally:
            sigs.unpersist()

    def test_cap_noop_when_buckets_small(self, spark):
        """With no bucket above the cap the guard must be a no-op:
        identical pair sets with and without it."""
        from gr_tdigest_spark.operators.dedup import (
            lsh_candidate_pairs, minhash_signatures,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text")
        sigs = minhash_signatures(docs, "doc_id").persist()
        try:
            capped = {
                (r["a"], r["b"])
                for r in lsh_candidate_pairs(
                    sigs, "doc_id", max_bucket_size=10_000
                ).collect()
            }
            uncapped = {
                (r["a"], r["b"])
                for r in lsh_candidate_pairs(
                    sigs, "doc_id", max_bucket_size=None
                ).collect()
            }
            assert capped == uncapped
        finally:
            sigs.unpersist()

    def test_simhash_degenerate_bounded(self, spark):
        from gr_tdigest_spark.operators.dedup import simhash_near_dups

        docs = _boilerplate_docs(spark, n=1000)
        n = simhash_near_dups(
            docs, "doc_id", max_bucket_size=40
        ).count()
        assert 0 < n <= 25 * (41 * 40) // 2

    def test_embedding_degenerate_bounded(self, spark):
        from gr_tdigest_spark.operators.similarity import (
            embedding_near_dup_pairs,
        )

        vecs = spark.range(1500).select(
            F.col("id").alias("vec_id"),
            F.array(*[F.lit(v) for v in [0.3, -0.2, 0.9, 0.1]]).alias(
                "embedding"
            ),
        )
        n = embedding_near_dup_pairs(
            vecs, threshold=0.99, max_bucket_size=50
        ).count()
        assert 0 < n <= 30 * (51 * 50) // 2

    def test_persist_slot_single_evaluation(self, spark):
        """r5 verdict task 5: with persist_signatures (default) the
        banded/signature table is cached, so every consumer (the size
        aggregate + both self-join sides) reads an InMemoryTableScan
        and the signature UDF evaluates once; with False no cache node
        appears and results are identical.  Each new call with the
        same family slot evicts the previous call's cache."""
        from gr_tdigest_spark.operators import skew
        from gr_tdigest_spark.operators.dedup import (
            lsh_candidate_pairs, minhash_signatures,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text")
        sigs = minhash_signatures(docs, "doc_id")
        # start clean: Spark's cache manager substitutes ANY logically
        # equal subplan, so earlier tests' slots would leak into the
        # persist=False plan below
        for slot in list(skew._BANDED_CACHE):
            skew._BANDED_CACHE.pop(slot).unpersist()
        off = lsh_candidate_pairs(
            sigs, "doc_id", max_bucket_size=100,
            persist_signatures=False,
        )
        plan_off = off._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" not in plan_off
        got = off.count()
        pairs = lsh_candidate_pairs(sigs, "doc_id", max_bucket_size=100)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert plan.count("InMemoryTableScan") >= 3
        assert pairs.count() == got
        cached = skew._BANDED_CACHE["minhash"]
        assert cached.storageLevel.useMemory
        # one-slot semantics: a new call evicts the previous cache
        lsh_candidate_pairs(sigs, "doc_id", max_bucket_size=100)
        assert skew._BANDED_CACHE["minhash"] is not cached

    def test_oversized_buckets_report(self, spark):
        """The observability companion reports exactly the buckets the
        guard splits."""
        from gr_tdigest_spark.operators.skew import oversized_buckets

        banded = spark.range(500).select(
            F.lit(7).alias("bucket"), F.col("id")
        ).union(
            spark.range(10).select(F.lit(9).alias("bucket"), F.col("id"))
        )
        rows = oversized_buckets(banded, ["bucket"], 100).collect()
        assert len(rows) == 1
        assert rows[0]["bucket"] == 7 and rows[0]["bucket_size"] == 500


def test_near_dup_clusters_warns_when_unconverged(spark):
    """A path graph of diameter 12 with max_iter=2 cannot converge —
    the caller must be told (r2 advice: silent split otherwise)."""
    import warnings

    from gr_tdigest_spark.operators.dedup import near_dup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "a long, b long"
    )
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        near_dup_clusters(pairs, max_iter=2).collect()
    assert any("did not converge" in str(w.message) for w in rec)

    # and a converged run stays silent
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = near_dup_clusters(pairs, max_iter=50).collect()
    assert not any("did not converge" in str(w.message) for w in rec)
    assert {r["cluster"] for r in out} == {0}


def test_near_dup_clusters_releases_checkpoint_storage(spark):
    """Each propagation round localCheckpoints a new label table; the
    previous round's blocks (and the edge table's, at return) must be
    RELEASED, or a long-lived driver making many clustering calls
    accretes executor storage until GC. Only the returned table's own
    checkpoint may stay pinned per call."""
    from gr_tdigest_spark.operators.dedup import near_dup_clusters

    jsc = spark.sparkContext._jsc
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "a long, b long"
    )
    base = len(jsc.getPersistentRDDs())
    for _ in range(3):
        near_dup_clusters(pairs, max_iter=50).collect()
    # a 12-edge path graph needs ~12 rounds x 3 calls; without release
    # that is ~40 lingering cached RDDs. With release: one final label
    # checkpoint per call.
    assert len(jsc.getPersistentRDDs()) - base <= 3
