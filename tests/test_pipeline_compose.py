"""End-to-end LLM-training-data pipeline composition gate (r5 verdict
task 6): the operators are tested piecewise elsewhere — this runs the
PRODUCT on one fixture and asserts the cross-operator invariants the
library promises:

    dedup_exact → quality score filter → assign_split
        → keyed weighted sample → pack_sequences (nextfit)

- salted hash domains stay uncorrelated at ONE shared user seed
  (sample.py / pack.py salt rule): the weighted sample must not skew
  the split fractions, and packing must cover the sampled set;
- split assignment is growth-stable (a subset's rows keep their
  splits) and survives dedup/filter compositions;
- every packable sampled doc is packed within the strict nextfit
  budget, oversize docs get NULL.
"""

import pytest
from pyspark.sql import functions as F

SEED = 1234  # ONE user seed across every stage — the salts do the rest


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )


class TestPipelineCompose:
    def test_full_chain_invariants(self, spark, docs):
        from gr_tdigest_spark.operators.dedup import dedup_exact
        from gr_tdigest_spark.operators.pack import pack_sequences
        from gr_tdigest_spark.operators.sample import (
            assign_split, weighted_sample,
        )
        from gr_tdigest_spark.operators.text import (
            with_fingerprint, with_quality_score,
        )

        # 1. exact dedup: survivors carry distinct normalized texts,
        # and each is the min-id representative of its duplicate set
        deduped = dedup_exact(docs, "doc_id", "text")
        n_dedup = deduped.count()
        n_fps = (
            with_fingerprint(docs, "text", "__fp")
            .select("__fp").distinct().count()
        )
        assert n_dedup == n_fps

        # 2. quality filter keeps a real, non-trivial subset
        scored = with_quality_score(deduped, "text")
        filtered = scored.filter(F.col("quality_score") >= 0.5)
        n_filtered = filtered.count()
        assert 0 < n_filtered < n_dedup or n_filtered == n_dedup > 0

        # 3. split assignment covers every row; all splits non-empty
        split = assign_split(
            filtered, "doc_id",
            {"train": 0.8, "val": 0.1, "test": 0.1}, seed=SEED,
        )
        counts = {
            r["split"]: r["n"]
            for r in split.groupBy("split").agg(
                F.count("*").alias("n")
            ).collect()
        }
        assert sum(counts.values()) == n_filtered
        assert all(counts.get(s, 0) > 0 for s in ("train", "val", "test"))

        # growth stability: the same ids keep their splits when the
        # pipeline upstream changes (here: splitting the UNFILTERED
        # table must agree row-for-row on the surviving ids)
        full_assign = {
            r["doc_id"]: r["split"]
            for r in assign_split(
                docs, "doc_id",
                {"train": 0.8, "val": 0.1, "test": 0.1}, seed=SEED,
            ).select("doc_id", "split").collect()
        }
        for r in split.select("doc_id", "split").collect():
            assert full_assign[r["doc_id"]] == r["split"], r["doc_id"]

        # 4. keyed weighted sample over the train split, weighted by
        # quality, at the SAME seed: per-source exact-size contract
        train = split.filter(F.col("split") == "train")
        k = 5
        sampled = weighted_sample(
            train, k, "doc_id", "quality_score", seed=SEED,
            keys="source",
        )
        per_src = {
            r["source"]: r["n"]
            for r in sampled.groupBy("source").agg(
                F.countDistinct("doc_id").alias("n")
            ).collect()
        }
        expect = {
            r["source"]: r["n"]
            for r in train.filter(
                (F.col("quality_score") > 0.0)
                & F.col("doc_id").isNotNull()
            ).groupBy("source").agg(
                F.countDistinct("doc_id").alias("n")
            ).collect()
        }
        assert set(per_src) == set(expect)
        for s, n in expect.items():
            assert per_src[s] == min(k, n), s

        # salt decorrelation at the shared seed: the sampled docs'
        # split fractions must track the 0.8/0.1/0.1 assignment, not
        # collapse into one split (a shared hash domain between the
        # samplers and assign_split would pile every sampled id into
        # the hash tail — sample.py:76-81). Deterministic, not flaky.
        n_sampled_ids = sampled.select("doc_id").distinct().count()
        sampled_train_frac = (
            sampled.select("doc_id", "split").distinct()
            .filter(F.col("split") == "train").count() / n_sampled_ids
        )
        assert sampled_train_frac == 1.0  # sampled FROM train only
        resplit = assign_split(
            sampled.select("doc_id").distinct(), "doc_id",
            {"a": 0.5, "b": 0.5}, seed=SEED,
        )
        ra = resplit.filter(F.col("split") == "a").count()
        assert 0.25 <= ra / n_sampled_ids <= 0.75

        # 5. nextfit packing of the sampled set at the same seed:
        # full packable coverage, strict budget, oversize → NULL
        max_tok = 300
        packed = pack_sequences(
            sampled, "doc_id", "n_chars", max_tok,
            n_buckets=4, seed=SEED, method="nextfit",
        )
        rows = packed.select(
            "doc_id", "n_chars", "__pack_bucket", "__pack_slot"
        ).collect()
        assert len(rows) == sampled.count()
        totals = {}
        for r in rows:
            if r["n_chars"] is not None and 0 < r["n_chars"] <= max_tok:
                assert r["__pack_slot"] is not None, r["doc_id"]
                key = (r["__pack_bucket"], r["__pack_slot"])
                totals[key] = totals.get(key, 0) + r["n_chars"]
            else:
                assert r["__pack_slot"] is None, r["doc_id"]
        assert totals, "no packable docs — vacuous gate"
        assert all(t <= max_tok for t in totals.values())
        # at least one oversize doc exercised the NULL branch
        assert any(
            r["n_chars"] is not None and r["n_chars"] > max_tok
            for r in rows
        )


class TestPipelineComposeR6:
    def test_r6_hygiene_chain(self, spark, docs):
        """The round-6 hygiene operators composed into the same
        one-seed product:

            dedup_exact → dedup_lines(keep_first)
                → decontaminate (bloom) → assign_split

        Invariants:
        - line dedup after exact dedup is a NO-OP on this fixture
          (texts are distinct single-line docs → every doc keeps its
          line) — the operators do not interfere;
        - decontamination drops exactly the docs whose 5-gram overlap
          with the benchmark slice is ≥ threshold, and the benchmark
          docs themselves all go (self-contamination = 1.0);
        - the split of a surviving doc equals its split in the
          unfiltered corpus (hygiene upstream never moves a doc
          between splits — the leakage-control property).
        """
        from gr_tdigest_spark.operators.contamination import (
            build_contamination_filter, contamination_scores,
            decontaminate,
        )
        from gr_tdigest_spark.operators.dedup import (
            dedup_exact, dedup_lines,
        )
        from gr_tdigest_spark.operators.sample import assign_split

        deduped = dedup_exact(docs, "doc_id", "text")
        n0 = deduped.count()

        lined = dedup_lines(deduped, "doc_id", "text")
        assert lined.count() == n0
        assert lined.where(F.col("n_lines_removed") > 0).count() == 0
        lined = lined.drop("n_lines_kept", "n_lines_removed")

        bench = docs.where(F.col("doc_id") % 17 == 0)
        clean = decontaminate(lined, "doc_id", bench,
                              threshold=0.5, n=5, method="bloom")
        kept_ids = {r["doc_id"] for r in
                    clean.select("doc_id").collect()}
        # every benchmark doc that survived dedup is dropped
        bench_ids = {r["doc_id"] for r in
                     dedup_exact(bench, "doc_id", "text")
                     .select("doc_id").collect()}
        assert bench_ids.isdisjoint(kept_ids)
        # drops match the score threshold exactly (join path replica)
        scored = contamination_scores(lined, "doc_id", bench, n=5)
        for r in scored.collect():
            c = r["contamination"]
            if c is not None and c >= 0.5:
                assert r["doc_id"] not in kept_ids
            else:
                assert r["doc_id"] in kept_ids

        # split stability: hygiene upstream never moves a doc
        full_split = {r["doc_id"]: r["split"] for r in assign_split(
            docs, "doc_id",
            {"train": 0.8, "val": 0.1, "test": 0.1}, seed=SEED,
        ).select("doc_id", "split").collect()}
        clean_split = assign_split(
            clean, "doc_id",
            {"train": 0.8, "val": 0.1, "test": 0.1}, seed=SEED,
        )
        for r in clean_split.select("doc_id", "split").collect():
            assert full_split[r["doc_id"]] == r["split"]

    def test_prebuilt_filter_in_stream_and_batch_agree(self, spark,
                                                       docs):
        """One checkpointed filter serves the batch backfill and the
        streaming ingest: wire-roundtripped filter scores == fresh
        filter scores on the same corpus."""
        from gr_tdigest_spark.operators.contamination import (
            ContaminationFilter, build_contamination_filter,
            contamination_scores,
        )

        bench = docs.where(F.col("doc_id") % 17 == 0)
        flt = build_contamination_filter(bench, n=5)
        restored = ContaminationFilter.from_bytes(flt.to_bytes())
        a = sorted(contamination_scores(docs, "doc_id", flt,
                                        method="bloom")
                   .select("doc_id", "n_hit").collect())
        b = sorted(contamination_scores(docs, "doc_id", restored,
                                        method="bloom")
                   .select("doc_id", "n_hit").collect())
        assert a == b
