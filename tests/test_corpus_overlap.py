"""Corpus overlap estimation: KMV kernel laws + Spark operator vs
exact set arithmetic."""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from gr_tdigest_spark.sketches.bottomk import BottomK, overlap_estimate
from gr_tdigest_spark.operators.contamination import (
    corpus_overlap, word_ngrams,
)


class TestKernel:
    def test_exact_below_capacity(self):
        a = BottomK(k=1024)
        a.add(np.arange(300))
        b = BottomK(k=1024)
        b.add(np.arange(200, 500))
        r = overlap_estimate(a, b)
        assert r["distinct_a"] == 300.0 and r["distinct_b"] == 300.0
        assert r["union"] == 500.0 and r["intersection"] == 100.0
        assert r["jaccard"] == pytest.approx(100 / 500)
        assert r["containment_a_in_b"] == pytest.approx(1 / 3)

    def test_symmetry(self):
        a = BottomK(k=256)
        a.add(np.arange(5000))
        b = BottomK(k=256)
        b.add(np.arange(2500, 9000))
        r1 = overlap_estimate(a, b)
        r2 = overlap_estimate(b, a)
        assert r1["jaccard"] == r2["jaccard"]
        assert r1["union"] == r2["union"]
        assert r1["intersection"] == r2["intersection"]
        assert r1["containment_a_in_b"] == r2["containment_b_in_a"]

    def test_estimation_error_bounds(self):
        # |Ĵ − J| over the k-sample is hypergeometric; 5σ with
        # σ = sqrt(J(1−J)/k) plus distinct-estimate slack
        k = 1024
        a = BottomK(k=k)
        a.add(np.arange(50_000))
        b = BottomK(k=k)
        b.add(np.arange(25_000, 75_000))
        r = overlap_estimate(a, b)
        true_j = 25_000 / 75_000
        sigma = math.sqrt(true_j * (1 - true_j) / k)
        assert abs(r["jaccard"] - true_j) < 5 * sigma
        assert abs(r["union"] - 75_000) / 75_000 < 5 / math.sqrt(k - 2)
        assert abs(r["intersection"] - 25_000) / 25_000 < 0.2

    def test_disjoint_and_identical(self):
        a = BottomK(k=256)
        a.add(np.arange(10_000))
        b = BottomK(k=256)
        b.add(np.arange(10_000, 20_000))
        r = overlap_estimate(a, b)
        assert r["jaccard"] == 0.0 and r["intersection"] == 0.0
        c = BottomK(k=256)
        c.add(np.arange(10_000))
        r2 = overlap_estimate(a, c)
        assert r2["jaccard"] == 1.0
        assert r2["containment_a_in_b"] == pytest.approx(1.0)

    def test_empty_sides(self):
        # k=256 > 100 distinct: the non-empty side stays exact
        e = BottomK(k=256)
        a = BottomK(k=256)
        a.add(np.arange(100))
        r = overlap_estimate(e, BottomK(k=256))
        assert math.isnan(r["jaccard"]) and r["union"] == 0.0
        r2 = overlap_estimate(a, BottomK(k=256))
        assert r2["jaccard"] == 0.0 and r2["distinct_a"] == 100.0
        assert math.isnan(r2["containment_b_in_a"])

    def test_clamped_containment(self):
        # intersection clamped to min(distinct) -> containments <= 1
        rng = np.random.default_rng(7)
        for trial in range(5):
            xs = rng.choice(1_000_000, size=3000, replace=False)
            a = BottomK(k=128)
            a.add(xs)
            b = BottomK(k=128)
            b.add(xs[:1500])
            r = overlap_estimate(a, b)
            assert r["containment_a_in_b"] <= 1.0
            assert r["containment_b_in_a"] <= 1.0


class TestOperator:
    @pytest.fixture(scope="class")
    def dumps(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
            .select("doc_id", "text")
        # dump A = docs 0..349, dump B = docs 250..499: 100 shared
        a = docs.where("doc_id < 350")
        b = docs.where("doc_id >= 250")
        return a, b

    def test_doc_unit_exact(self, dumps):
        # 500 distinct texts (fixture invariant) -> doc-unit overlap
        # is exact below sketch capacity
        a, b = dumps
        r = corpus_overlap(a, b, unit="doc", k=4096).first()
        assert r["distinct_a"] == 350.0
        assert r["distinct_b"] == 250.0
        assert r["intersection_size"] == 100.0
        assert r["union_size"] == 500.0
        assert r["jaccard"] == pytest.approx(100 / 500)
        assert r["containment_b_in_a"] == pytest.approx(100 / 250)

    def test_ngram_unit_vs_exact_join(self, dumps, spark):
        # estimate vs the exact distinct-gram set arithmetic computed
        # on the same word_ngrams expression
        a, b = dumps
        ga = a.select(F.explode(word_ngrams("text", 5)).alias("g")) \
            .distinct()
        gb = b.select(F.explode(word_ngrams("text", 5)).alias("g")) \
            .distinct()
        na, nb = ga.count(), gb.count()
        ninter = ga.join(gb, "g", "leftsemi").count()
        nunion = na + nb - ninter
        r = corpus_overlap(a, b, unit="ngram", n=5, k=4096).first()
        true_j = ninter / nunion
        sigma_j = math.sqrt(true_j * (1 - true_j) / 4096)
        assert abs(r["jaccard"] - true_j) < 5 * sigma_j
        assert abs(r["union_size"] - nunion) / nunion \
            < 5 / math.sqrt(4094)
        assert abs(r["distinct_a"] - na) / na < 5 / math.sqrt(4094)

    def test_line_unit(self, spark):
        a = spark.createDataFrame(
            [(1, "x\ny"), (2, "z\n  \nx")], ["doc_id", "text"]
        )
        b = spark.createDataFrame(
            [(3, "y\nw"), (4, None)], ["doc_id", "text"]
        )
        r = corpus_overlap(a, b, unit="line", k=64).first()
        assert r["distinct_a"] == 3.0 and r["distinct_b"] == 2.0
        assert r["intersection_size"] == 1.0  # just 'y'
        assert r["jaccard"] == pytest.approx(0.25)

    def test_empty_corpus(self, spark):
        a = spark.createDataFrame([(1, "some words here")],
                                  ["doc_id", "text"])
        empty = spark.createDataFrame([], "doc_id long, text string")
        r = corpus_overlap(a, empty, unit="doc", k=64).first()
        assert r["distinct_b"] == 0.0 and r["intersection_size"] == 0.0

    def test_validation(self, spark):
        a = spark.createDataFrame([(1, "t")], ["doc_id", "text"])
        with pytest.raises(ValueError, match="unit"):
            corpus_overlap(a, a, unit="nope")


class TestConsistency:
    def test_intersection_equals_jaccard_times_union(self):
        # the clamp must keep the returned triple consistent:
        # intersection == jaccard * union (within fp rounding), so a
        # consumer deriving one from the others can never exceed the
        # dict's own containments
        rng = np.random.default_rng(11)
        for trial in range(20):
            na = int(rng.integers(500, 5000))
            xs = rng.choice(1_000_000, size=na, replace=False)
            cut = int(rng.integers(10, na))
            a = BottomK(k=128)
            a.add(xs)
            b = BottomK(k=128)
            b.add(xs[:cut])
            r = overlap_estimate(a, b)
            if r["union"] > 0:
                assert r["intersection"] == pytest.approx(
                    r["jaccard"] * r["union"], rel=1e-12
                )
            assert r["containment_a_in_b"] <= 1.0 + 1e-12
            assert r["containment_b_in_a"] <= 1.0 + 1e-12
