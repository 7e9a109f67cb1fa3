"""Distributed tests on local Spark (SURVEY §5 test plan):
two-phase aggregates vs exact oracles, empty-group contract,
transcript row invariant, companion-sketch bounds."""

import numpy as np
import pytest
from pyspark.sql import functions as F

import gr_tdigest_spark.functions as Fn
from gr_tdigest_spark.operators import tdigest_agg
from gr_tdigest_spark.operators.companions import (
    bloom_agg, bloom_contains, cms_agg, cms_estimate, hll_agg, hll_estimate,
    kll_agg, kll_quantile,
)


class TestTDigestOnSpark:
    def test_grouped_quantiles_vs_exact(self, spark, sf_dir):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        dg = tdigest_agg(li, ["l_returnflag"], "l_extendedprice",
                         max_size=1000)
        got = {
            r["l_returnflag"]: (r["p50"], r["p95"])
            for r in dg.select(
                "l_returnflag",
                Fn.tdigest_quantile("tdigest", 0.5).alias("p50"),
                Fn.tdigest_quantile("tdigest", 0.95).alias("p95"),
            ).collect()
        }
        exact = {
            r["l_returnflag"]: (r["e50"], r["e95"])
            for r in li.groupBy("l_returnflag").agg(
                F.expr("percentile(l_extendedprice, 0.5)").alias("e50"),
                F.expr("percentile(l_extendedprice, 0.95)").alias("e95"),
            ).collect()
        }
        for k in exact:
            for g, e in zip(got[k], exact[k]):
                assert abs(g - e) / abs(e) < 0.01, (k, g, e)

    def test_exact_stats_survive_compression(self, spark, sf_dir):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        dg = tdigest_agg(li, ["l_returnflag"], "l_extendedprice", max_size=100)
        got = dg.select(
            "l_returnflag",
            Fn.tdigest_count("tdigest").alias("n"),
            Fn.tdigest_min("tdigest").alias("mn"),
            Fn.tdigest_max("tdigest").alias("mx"),
        ).collect()
        exact = {
            r["l_returnflag"]: r
            for r in li.groupBy("l_returnflag").agg(
                F.count("*").alias("n"),
                F.min("l_extendedprice").alias("mn"),
                F.max("l_extendedprice").alias("mx"),
            ).collect()
        }
        for r in got:
            e = exact[r["l_returnflag"]]
            assert r["n"] == float(e["n"])
            assert r["mn"] == e["mn"] and r["mx"] == e["mx"]

    def test_empty_group_contract(self, spark):
        """Polars empty-group semantics (test_contract_behavior.py:200-254):
        a group whose filtered training set is empty yields an empty digest
        ⇒ quantile NULL."""
        pdf = spark.createDataFrame(
            [("A", 0.0), ("A", 1.0), ("A", 2.0), ("B", -5.0)],
            "g string, x double",
        )
        # filter leaves group B empty; build digests over full key set
        dims = pdf.select("g").distinct()
        digests = tdigest_agg(
            pdf.filter(F.col("x") >= 0.0), ["g"], "x", max_size=10
        )
        joined = dims.join(digests, "g", "left").withColumn(
            "tdigest",
            F.coalesce(F.col("tdigest"), Fn.empty_tdigest(max_size=10)),
        )
        rows = {
            r["g"]: r["q"]
            for r in joined.select(
                "g", Fn.tdigest_quantile("tdigest", 0.5).alias("q")
            ).collect()
        }
        assert rows["A"] == 1.0
        assert rows["B"] is None

    def test_null_values_rejected(self, spark):
        """Nulls in training column are errors (polars_expr.rs:567-571)?
        In Spark, nulls arrive as NaN through Arrow — strict mode raises."""
        pdf = spark.createDataFrame(
            [("A", 1.0), ("A", None)], "g string, x double"
        )
        with pytest.raises(Exception, match="NaN"):
            tdigest_agg(pdf, ["g"], "x", max_size=10).collect()

    def test_rollup_merge_equals_direct(self, spark, sf_dir):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        fine = tdigest_agg(
            li, ["l_returnflag", "l_linestatus"], "l_quantity",
            max_size=20000, policy="off",
        )
        coarse = fine.groupBy("l_returnflag").agg(
            Fn.merge_tdigests("tdigest").alias("tdigest")
        )
        direct = tdigest_agg(
            li, ["l_returnflag"], "l_quantity", max_size=20000, policy="off"
        )
        q = 0.314159
        a = {
            r[0]: r[1]
            for r in coarse.select(
                "l_returnflag", Fn.tdigest_quantile("tdigest", q)
            ).collect()
        }
        b = {
            r[0]: r[1]
            for r in direct.select(
                "l_returnflag", Fn.tdigest_quantile("tdigest", q)
            ).collect()
        }
        assert a == b

    def test_incompatible_config_merge_raises(self, spark):
        """Strict merge checks surface through the rollup path
        (frontends.rs:432-478)."""
        pdf = spark.createDataFrame(
            [("A", 1.0), ("B", 2.0)], "g string, x double"
        )
        d1 = tdigest_agg(pdf, ["g"], "x", max_size=100)
        d2 = tdigest_agg(pdf, ["g"], "x", max_size=200)
        both = d1.union(d2)
        with pytest.raises(Exception, match="incompatible"):
            both.groupBy("g").agg(
                Fn.merge_tdigests("tdigest").alias("m")
            ).collect()


class TestTranscriptInvariant:
    """Per-turn text equality under stable (conv_id, turn_idx) ordering —
    the BASELINE input_hint row invariant."""

    def test_pipeline_preserves_rows(self, spark):
        from gr_tdigest_spark.sources.transcripts import (
            transcripts_df, transcripts_pandas,
        )

        t = transcripts_df(spark, n_convs=50, seed=42)
        # golden: driver-side generation, stable ordering
        golden = transcripts_pandas(n_convs=50, seed=42).sort_values(
            ["conv_id", "turn_idx"]
        )
        # run a typical pipeline step (add derived column, repartition)
        out = (
            t.withColumn("len", F.length("text"))
            .repartition(16, "conv_id")
            .select("conv_id", "turn_idx", "text")
            .sortWithinPartitions("conv_id", "turn_idx")
            .toPandas()
            .sort_values(["conv_id", "turn_idx"])
        )
        assert len(out) == len(golden)
        assert (out["conv_id"].to_numpy() == golden["conv_id"].to_numpy()).all()
        assert (out["turn_idx"].to_numpy() == golden["turn_idx"].to_numpy()).all()
        assert (out["text"].to_numpy() == golden["text"].to_numpy()).all()

    def test_generator_deterministic_and_shard_stable(self, spark):
        from gr_tdigest_spark.sources.transcripts import transcripts_df

        a = transcripts_df(spark, n_convs=30, seed=42, slices=2).toPandas()
        b = transcripts_df(spark, n_convs=30, seed=42, slices=7).toPandas()
        a = a.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        b = b.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        assert a.equals(b)

    def test_transcript_quantiles_vs_exact(self, spark):
        from gr_tdigest_spark.sources.transcripts import transcripts_df

        t = transcripts_df(spark, n_convs=100, seed=42).withColumn(
            "len", F.length("text").cast("double")
        )
        dg = tdigest_agg(t, ["role"], "len", max_size=1000)
        got = {
            r[0]: r[1]
            for r in dg.select(
                "role", Fn.tdigest_quantile("tdigest", 0.9)
            ).collect()
        }
        exact = {
            r[0]: r[1]
            for r in t.groupBy("role").agg(
                F.expr("percentile(len, 0.9)")
            ).collect()
        }
        for k in exact:
            assert abs(got[k] - exact[k]) <= 0.01 * 20000 + abs(exact[k]) * 0.02


class TestCompanionsOnSpark:
    def test_hll_bound(self, spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        h = hll_agg(ev, None, "user_id", p=14)
        est = h.select(hll_estimate("hll")).collect()[0][0]
        exact = ev.select("user_id").distinct().count()
        assert abs(est - exact) <= max(5 * 1.04 / 128 * exact, 3)

    def test_kll_rank_bound(self, spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        k = kll_agg(ev, None, "value", k=200)
        got = k.select(kll_quantile("kll", 0.9)).collect()[0][0]
        exact_rank = (
            ev.filter(F.col("value") <= got).count() / ev.count()
        )
        assert abs(exact_rank - 0.9) <= 3.0 / 200

    def test_bloom_no_false_negatives(self, spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        bl = bloom_agg(ev, None, "user_id", m_bits=1 << 20)
        probed = (
            ev.select("user_id").distinct()
            .crossJoin(F.broadcast(bl))
            .select(bloom_contains("bloom", "user_id").alias("m"))
        )
        assert probed.filter(~F.col("m")).count() == 0


class TestTextOpsOnSpark:
    def test_dedup_exact(self, spark):
        from gr_tdigest_spark.operators.dedup import dedup_exact

        pdf = spark.createDataFrame(
            [(1, "hello  world"), (2, "hello world"), (3, "other")],
            "doc_id long, text string",
        )
        kept = dedup_exact(pdf, "doc_id", "text")
        ids = sorted(r[0] for r in kept.select("doc_id").collect())
        assert ids == [1, 3]  # 2 is a whitespace-normalized dup of 1

    def test_minhash_finds_near_dups(self, spark):
        from gr_tdigest_spark.operators.dedup import near_dup_pairs_minhash

        base = "the quick brown fox jumps over the lazy dog " * 20
        rows = [
            (1, base),
            (2, base[:-30] + " slightly changed tail here"),
            (3, "completely different content about spark sketches " * 20),
        ]
        pdf = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = near_dup_pairs_minhash(
            pdf, "doc_id", "text", threshold=0.5
        ).collect()
        assert {(r["a"], r["b"]) for r in pairs} == {(1, 2)}

    def test_language_id(self, spark):
        from gr_tdigest_spark.operators.text import with_language_id

        pdf = spark.createDataFrame(
            [
                (1, "the cat sat on the mat and it was happy"),
                (2, "der hund ist nicht mit der katze und das haus"),
                (3, "le chat est dans la maison et les jardins"),
                (4, "xyzzy qwerty"),
            ],
            "id long, text string",
        )
        got = {
            r["id"]: r["lang_id"]
            for r in with_language_id(pdf, "text").collect()
        }
        assert got[1] == "en"
        assert got[2] == "de"
        assert got[3] == "fr"
        assert got[4] == "und"

    def test_bpe_token_count(self, spark):
        """GPT-2-style pre-tokenizer counts against hand-computed
        fixtures (Java regex \\p{L}/\\p{N} classes; Python re lacks
        them, so the reference counts are worked by hand)."""
        from gr_tdigest_spark.operators.text import with_bpe_token_count

        rows = [
            # Hello | ' world' | ',' | ' it' | 's | ' 2024' | '!'
            (1, "Hello world, it's 2024!", 7),
            (2, "", 0),
            (3, "   ", 0),
            # don | 't | ' stop' (apostrophe inside handled as 't)
            (4, "don't stop", 3),
            # a | ' b' (double space folds into one piece's prefix)
            (5, "a  b", 2),
            # unicode letters count as letter runs: über | ' straße'
            (6, "über straße", 2),
            # letters and digits split (GPT-2 classes): x | 2 | go
            (7, "x2go", 3),
            # _ belongs to the punctuation class: one punct run
            (8, "!_!", 1),
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t, _ in rows], "id long, text string"
        )
        got = {
            r["id"]: r["n_bpe_tokens"]
            for r in with_bpe_token_count(df).collect()
        }
        for i, _, expect in rows:
            assert got[i] == expect, (i, got[i], expect)

    def test_repetition_stats(self, spark):
        """Gopher-style repetition filters: duplicate-line and top
        n-gram fractions against hand-computed fixtures."""
        from gr_tdigest_spark.operators.text import with_repetition_stats

        clean = "every line here is unique\nand so is this one"
        loops = "buy now\nbuy now\nbuy now\nsomething else"
        gram = "spam ham spam ham spam ham spam ham"
        df = spark.createDataFrame(
            [(1, clean), (2, loops), (3, gram), (4, ""), (5, None)],
            "id long, text string",
        )
        got = {r["id"]: r for r in with_repetition_stats(df).collect()}
        assert got[1]["rep_dup_line_frac"] == 0.0
        assert got[1]["rep_top_bigram_char_frac"] == 0.0
        # 3 of 4 lines are the duplicated 'buy now' (7 chars each)
        assert abs(got[2]["rep_dup_line_frac"] - 3 / 4) < 1e-12
        expected_dcf = 21 / (21 + len("something else"))
        assert abs(got[2]["rep_dup_line_char_frac"] - expected_dcf) < 1e-12
        # 'spam ham' bigram: 4 occurrences x 8 chars over 35 chars
        assert abs(got[3]["rep_top_bigram_char_frac"] - 32 / 35) < 1e-12
        assert got[4]["rep_dup_line_frac"] == 0.0
        assert got[5]["rep_dup_line_frac"] == 0.0

    def test_redact_pii(self, spark):
        from gr_tdigest_spark.operators.text import redact_pii

        df = spark.createDataFrame(
            [
                (1, "mail me at jane.doe+x@example.co.uk or call "
                    "+1 (555) 123-4567, server at 10.0.0.1"),
                (2, "order 123456789 shipped"),  # bare digits untouched
                # 3-digit octets must tag as IP, not phone (ipv4 runs
                # before phone in PII_PATTERNS order)
                (3, "gateway 203.120.145.210 up; pi is 3.141 592 65"),
            ],
            "id long, text string",
        )
        got = {r["id"]: r["text"] for r in redact_pii(df).collect()}
        assert "<EMAIL>" in got[1] and "jane" not in got[1]
        assert "<PHONE>" in got[1] and "123-4567" not in got[1]
        assert "<IPV4>" in got[1] and "10.0.0.1" not in got[1]
        assert got[2] == "order 123456789 shipped"
        assert "<IPV4>" in got[3] and "<PHONE>" not in got[3]
        assert "3.141 592 65" in got[3]  # not phone-shaped (no 4-digit tail)
        # subset selection + unknown kind validation
        only_mail = {
            r["id"]: r["text"]
            for r in redact_pii(df, kinds=["email"]).collect()
        }
        assert "<EMAIL>" in only_mail[1] and "555" in only_mail[1]
        import pytest
        with pytest.raises(ValueError, match="unknown PII kind"):
            redact_pii(df, kinds=["ssn"]).collect()

    def test_winnow_guarantee_property(self):
        """The winnowing guarantee (SIGMOD'03 Thm 1): two texts sharing
        a substring of length ≥ w + k − 1 MUST share at least one
        fingerprint — checked over 100 random pairs with planted shared
        runs; and fingerprints are position-independent (a shared run
        matches wherever it sits)."""
        import numpy as np
        from gr_tdigest_spark.operators.text import _winnow_hashes

        rng = np.random.default_rng(21)
        k, w = 5, 8
        alphabet = np.frombuffer(b"abcdefgh", dtype=np.uint8)
        for _ in range(100):
            shared = bytes(
                rng.choice(alphabet, size=w + k - 1).tobytes()
            )
            pre_a = bytes(rng.choice(alphabet, size=30).tobytes())
            post_a = bytes(rng.choice(alphabet, size=30).tobytes())
            pre_b = bytes(rng.choice(alphabet, size=17).tobytes())
            post_b = bytes(rng.choice(alphabet, size=44).tobytes())
            fa = set(_winnow_hashes(pre_a + shared + post_a, k, w).tolist())
            fb = set(_winnow_hashes(pre_b + shared + post_b, k, w).tolist())
            assert fa & fb, shared

    def test_winnow_overlap_pairs_spark(self, spark):
        """Contiguous copying is caught even when bag-of-words stays
        dissimilar overall; unrelated docs produce no pair."""
        from gr_tdigest_spark.operators.dedup import winnow_overlap_pairs

        plag = ("the experiment demonstrates a significant improvement "
                "over the established baseline configuration")
        rows = [
            (1, "alpha beta gamma " * 10 + plag + " delta epsilon " * 10),
            (2, "totally unrelated framing text here " * 8 + plag),
            (3, "nothing in common with the others at all " * 15),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = winnow_overlap_pairs(
            df, "doc_id", "text", k=8, w=16, min_shared=2
        ).collect()
        assert {(r["a"], r["b"]) for r in pairs} == {(1, 2)}
        shared = pairs[0]["shared_fps"]
        assert shared >= 2

    def test_cosine_topk_exact(self, spark, sf_dir):
        from gr_tdigest_spark.operators.similarity import cosine_topk

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q = emb.first()["embedding"]
        top = cosine_topk(emb, q, k=3).collect()
        # the query vector itself must rank first with cosine ≈ 1
        assert abs(top[0]["cosine"] - 1.0) < 1e-6
        assert top[0]["cosine"] >= top[1]["cosine"] >= top[2]["cosine"]

    def test_zero_norm_vectors_never_displace_neighbors(self, spark):
        """r5 advice: zero-norm vectors gave NaN cosine on the pandas
        paths, and Spark sorts NaN GREATER than any double, so NaN
        outranked every real hit in a desc top-k.  Both paths must emit
        NULL (sorts last under desc), matching the expression path's
        divide-by-zero semantics."""
        import gr_tdigest_spark.operators.similarity as sim
        from gr_tdigest_spark.operators.similarity import cosine_topk

        rows = [
            (0, [0.0, 0.0, 0.0]),              # zero norm
            (9, [float("nan"), 1.0, 0.0]),     # NaN element (r6 review)
        ] + [(i, [float(i), 1.0, 0.0]) for i in range(1, 6)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        q = [1.0, 0.0, 0.0]
        expr_rows = cosine_topk(df, q, k=3).collect()
        expr_ids = [r["vec_id"] for r in expr_rows]
        assert 0 not in expr_ids and 9 not in expr_ids
        assert all(r["cosine"] is not None for r in expr_rows)
        old = sim._MAX_INLINE_LITERALS
        sim._MAX_INLINE_LITERALS = 0  # force the pandas branch
        try:
            pand = cosine_topk(df, q, k=3).collect()
        finally:
            sim._MAX_INLINE_LITERALS = old
        assert [r["vec_id"] for r in pand] == expr_ids
        assert all(r["cosine"] is not None for r in pand)

        # the pair scorer (batch-ANN shape): zero norms → NULL, not NaN
        pdf = spark.createDataFrame(
            [(1, [1.0, 0.0], [1.0, 0.0]),
             (2, [0.0, 0.0], [1.0, 0.0]),
             (3, [1.0, 0.0], [0.0, 0.0])],
            "i long, a array<double>, b array<double>",
        )
        got = {
            r["i"]: r["c"]
            for r in pdf.select(
                "i",
                sim._cos_pair_col(F.col("a"), F.col("b")).alias("c"),
            ).collect()
        }
        assert got[1] == pytest.approx(1.0)
        assert got[2] is None and got[3] is None

        # near-dup pair path: a zero vector inside a bucket must not
        # abort the job (ANSI divide-by-zero), and a NaN-element
        # vector must not emit spurious pairs (Spark treats
        # NaN >= threshold as true) — both drop instead
        from gr_tdigest_spark.operators.similarity import (
            embedding_near_dup_pairs,
        )

        nd = embedding_near_dup_pairs(
            df, id_col="vec_id", vec_col="embedding",
            threshold=0.9, n_planes=1, seed=3,
        ).collect()
        assert all(
            r["a"] not in (0, 9) and r["b"] not in (0, 9) for r in nd
        )


class TestMultimodalPlumbing:
    def test_image_feature_stub(self, spark):
        from gr_tdigest_spark.operators.multimodal import decode_image_features

        rows = [(i, bytes([i] * 64)) for i in range(10)]
        pdf = spark.createDataFrame(rows, "media_id long, payload binary")
        feats = decode_image_features(pdf, dim=16).collect()
        assert len(feats) == 10
        v = np.asarray(feats[0]["features"])
        assert v.size == 16
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5
        # determinism: same payload → same features
        again = decode_image_features(pdf, dim=16).collect()
        assert feats[0]["features"] == again[0]["features"]

    def test_video_frame_sampling(self, spark):
        from gr_tdigest_spark.operators.multimodal import sample_video_frames

        rows = [(1, b"videodata", 3500), (2, b"other", 1200)]
        pdf = spark.createDataFrame(
            rows, "media_id long, payload binary, duration_ms long"
        )
        frames = sample_video_frames(pdf, every_ms=1000).collect()
        per_id = {}
        for r in frames:
            per_id.setdefault(r["media_id"], []).append(r["frame_idx"])
        assert sorted(per_id[1]) == [0, 1, 2]
        assert sorted(per_id[2]) == [0]


class TestWindowPattern:
    def test_with_group_quantile_matches_window_sql(self, spark, sf_dir):
        from gr_tdigest_spark.operators.window import with_group_quantile

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        out = with_group_quantile(
            li, ["l_returnflag"], "l_extendedprice", 0.314159,
            out_col="qg", max_size=20000, policy="off",
        )
        got = [
            (r["l_returnflag"], r["qg"])
            for r in out.select("l_returnflag", "qg").collect()
        ]
        li.createOrReplaceTempView("li_w")
        # exact oracle via sort + pick within Spark
        exact = {
            r["l_returnflag"]: r["v"]
            for r in spark.sql(
                """
                SELECT l_returnflag, min(x) AS v FROM (
                  SELECT l_returnflag, l_extendedprice AS x,
                         row_number() OVER (PARTITION BY l_returnflag
                                            ORDER BY l_extendedprice) rn,
                         count(*) OVER (PARTITION BY l_returnflag) n
                  FROM li_w
                ) WHERE rn = cast(floor(0.314159 * n) AS int) + 1
                GROUP BY l_returnflag
                """
            ).collect()
        }
        assert len(got) == li.count()
        for flag, v in got:
            assert v == exact[flag], flag

    def test_with_group_cdf_self_probe(self, spark, sf_dir):
        from gr_tdigest_spark.operators.window import with_group_cdf

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(500)
        out = with_group_cdf(
            li, ["l_returnflag"], "l_extendedprice",
            max_size=20000, policy="off",
        )
        vals = out.select("cdf").collect()
        assert all(0.0 <= r["cdf"] <= 1.0 for r in vals)

    def test_filter_by_group_quantile(self, spark):
        """Exact-capacity digest → the q=0.5 cutoff is the group's
        order statistic; 'above' keeps exactly the upper half + the
        threshold row, schema unchanged, NULL values dropped."""
        import pandas as pd
        from gr_tdigest_spark.operators.window import (
            filter_by_group_quantile,
        )

        df = spark.createDataFrame(
            pd.DataFrame({
                "g": ["a"] * 5 + ["b"] * 5,
                "v": [1.0, 2.0, 3.0, 4.0, 5.0,
                      10.0, None, 30.0, 40.0, 50.0],
            })
        )
        kept = filter_by_group_quantile(
            df, ["g"], "v", 0.5, max_size=20000, policy="off",
            on_invalid="drop",
        )
        assert kept.columns == df.columns
        got = sorted(
            (r["g"], r["v"]) for r in kept.collect()
        )
        # a: N=5, q=0.5 → order stat at ceil(0.5*5)=3rd value (3.0);
        # b: 4 non-null values → threshold between 30 and 40 → disc 30
        assert [v for g, v in got if g == "a"] == [3.0, 4.0, 5.0]
        b_vals = [v for g, v in got if g == "b"]
        assert None not in b_vals and min(b_vals) >= 30.0
        # strict + below mirrors
        below = filter_by_group_quantile(
            df, ["g"], "v", 0.5, keep="below", strict=True,
            max_size=20000, policy="off", on_invalid="drop",
        )
        assert all(
            r["v"] < 3.0 for r in below.where("g = 'a'").collect()
        )

    def test_filter_by_group_quantile_bad_keep(self, spark):
        import pytest
        from gr_tdigest_spark.operators.window import (
            filter_by_group_quantile,
        )

        with pytest.raises(ValueError, match="keep"):
            filter_by_group_quantile(
                spark.range(3).withColumn("v", F.col("id") * 1.0),
                ["id"], "v", 0.5, keep="sideways",
            )

    def test_filter_nan_rows_never_pass(self, spark):
        """Spark sorts NaN above every number — without the explicit
        guard, NaN-scored garbage would sail through keep='above'."""
        import math
        import pandas as pd
        from gr_tdigest_spark.operators.window import (
            filter_by_group_quantile,
        )

        df = spark.createDataFrame(
            pd.DataFrame({
                "g": ["a"] * 4,
                "v": [1.0, 2.0, 3.0, math.nan],
            })
        )
        for keep in ("above", "below"):
            got = filter_by_group_quantile(
                df, ["g"], "v", 0.5, keep=keep,
                max_size=20000, policy="off", on_invalid="drop",
            ).collect()
            assert not any(
                r["v"] is not None and math.isnan(r["v"]) for r in got
            ), keep

    def test_filter_null_key_group_is_filtered_not_dropped(self, spark):
        """A NULL group key is a real group: its rows must be compared
        against THEIR group's threshold (null-safe join-back), not
        silently dropped by an equi-join that can never match."""
        import pandas as pd
        from gr_tdigest_spark.operators.window import (
            filter_by_group_quantile,
        )

        df = spark.createDataFrame(
            pd.DataFrame({
                "g": ["a", "a", "a", None, None, None],
                "v": [1.0, 2.0, 3.0, 10.0, 20.0, 30.0],
            })
        )
        rows = filter_by_group_quantile(
            df, ["g"], "v", 0.5,
            max_size=20000, policy="off", on_invalid="drop",
        ).collect()
        got = sorted(
            [(r["g"], r["v"]) for r in rows],
            key=lambda t: (t[0] is None, t),
        )
        assert [v for g, v in got if g == "a"] == [2.0, 3.0]
        assert [v for g, v in got if g is None] == [20.0, 30.0]

    def test_group_quantile_default_out_col_has_dot(self, spark):
        """The default out_col embeds the q value's dot (q0.5_x) —
        the alias-qualified select must backtick it, not parse it as
        struct nesting."""
        from gr_tdigest_spark.operators.window import with_group_quantile

        df = spark.range(10).withColumn(
            "v", F.col("id").cast("double")
        ).withColumn("g", F.col("id") % 2)
        out = with_group_quantile(df, ["g"], "v", 0.5, max_size=100)
        assert out.columns == ["id", "v", "g", "q0.5_v"]
        assert out.count() == 10

    def test_filter_preserves_column_order(self, spark):
        """Key columns not listed first must not migrate to the front
        of the schema (using-join behavior the operator must undo)."""
        import pandas as pd
        from gr_tdigest_spark.operators.window import (
            filter_by_group_quantile,
        )

        df = spark.createDataFrame(
            pd.DataFrame({
                "score": [1.0, 2.0, 3.0, 4.0],
                "lang": ["en", "en", "fr", "fr"],
            })
        )
        out = filter_by_group_quantile(
            df, ["lang"], "score", 0.5,
            max_size=20000, policy="off", on_invalid="drop",
        )
        assert out.columns == ["score", "lang"]


class TestSkewSalting:
    def test_salted_equals_unsalted_under_skew(self, spark):
        """north_rule: skew handled explicitly — a 95%-hot key produces
        identical results through the salted two-hop merge."""
        import gr_tdigest_spark.functions as Fn
        from pyspark.sql import functions as F

        n = 40000
        df = (
            spark.range(n)
            .withColumn(
                "g",
                F.when(F.col("id") % 20 < 19, F.lit("hot")).otherwise(
                    F.lit("cold")
                ),
            )
            .withColumn("x", (F.col("id") % 997).cast("double"))
        )
        plain = tdigest_agg(df, ["g"], "x", max_size=20000, policy="off")
        salted = tdigest_agg(
            df, ["g"], "x", max_size=20000, policy="off", salt_buckets=16
        )
        q = 0.314159
        a = {r[0]: (r[1], r[2]) for r in plain.select(
            "g", Fn.tdigest_quantile("tdigest", q),
            Fn.tdigest_count("tdigest")).collect()}
        b = {r[0]: (r[1], r[2]) for r in salted.select(
            "g", Fn.tdigest_quantile("tdigest", q),
            Fn.tdigest_count("tdigest")).collect()}
        assert a == b
        assert a["hot"][1] == 38000.0


class TestSimilaritySearch:
    def test_lsh_bucket_topk_finds_near_neighbors(self, spark, sf_dir):
        from gr_tdigest_spark.operators.similarity import (
            cosine_topk, lsh_bucket_topk,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q = emb.first()["embedding"]
        exact = [r["vec_id"] for r in cosine_topk(emb, q, k=5).collect()]
        approx = [
            r["vec_id"]
            for r in lsh_bucket_topk(
                emb, q, k=5, n_planes=6, multiprobe=2
            ).collect()
        ]
        # the query vector itself must be found; recall >= 2/5 on this
        # tiny corpus with 6 planes + 2-bit multiprobe
        assert exact[0] == approx[0]
        assert len(set(exact) & set(approx)) >= 2

    def test_embedding_near_dup_pairs_self_similarity(self, spark, sf_dir):
        from gr_tdigest_spark.operators.similarity import (
            embedding_near_dup_pairs,
        )
        from pyspark.sql import functions as F

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
        # duplicate every vector under a shifted id → every original/dup
        # pair has cosine 1.0 and must be found
        dup = emb.select(
            (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
        )
        both = emb.select("vec_id", "embedding").unionByName(dup)
        pairs = embedding_near_dup_pairs(
            both, threshold=0.999, n_planes=8
        ).collect()
        found = {(r["a"], r["b"]) for r in pairs}
        expected = {(r["vec_id"], r["vec_id"] + 1000) for r in emb.collect()}
        assert expected <= found


class TestQualityScore:
    def test_quality_score_orders_docs_sensibly(self, spark):
        from gr_tdigest_spark.operators.text import with_quality_score

        rows = [
            (1, "The quick brown fox jumps over the lazy dog and it was "
                "a fine day for that kind of thing."),
            (2, "!!! ??? ,,, ;;; ### 12345 67890 !!!! ,,,,, 99999"),
        ]
        pdf = spark.createDataFrame(rows, "id long, text string")
        got = {
            r["id"]: r["quality_score"]
            for r in with_quality_score(pdf).collect()
        }
        assert got[1] > got[2]
        assert 0.0 <= got[2] <= got[1] <= 1.0


class TestNullableGroupKeys:
    def test_null_numeric_key_merges_across_partials(self, spark):
        """Spark NULL in a double key column crosses the pandas boundary
        as NaN; without canonicalization each partial kept its own dict
        entry and the output had duplicate partially-merged rows."""
        import pandas as pd

        pdf = pd.DataFrame({
            "g": ([1.0, None, 2.0, None] * 250),
            "x": [float(i) for i in range(1000)],
        })
        df = spark.createDataFrame(pdf).repartition(8)
        out = tdigest_agg(df, ["g"], "x", max_size=20000, policy="off")
        rows = out.collect()
        assert len(rows) == 3  # 1.0, 2.0 and ONE merged null group
        import gr_tdigest_spark.functions as Fn
        counts = {
            r[0]: r[1]
            for r in out.select(
                "g", Fn.tdigest_count("tdigest").alias("n")
            ).collect()
        }
        assert counts[None] == 500.0
        assert counts[1.0] == 250.0 and counts[2.0] == 250.0

    def test_null_string_key_merges(self, spark):
        import pandas as pd

        pdf = pd.DataFrame({
            "g": (["a", None] * 300),
            "x": [float(i) for i in range(600)],
        })
        df = spark.createDataFrame(pdf).repartition(6)
        out = tdigest_agg(df, ["g"], "x", max_size=20000, policy="off")
        import gr_tdigest_spark.functions as Fn
        counts = {
            r[0]: r[1]
            for r in out.select(
                "g", Fn.tdigest_count("tdigest").alias("n")
            ).collect()
        }
        assert counts == {"a": 300.0, None: 300.0}


class TestGroupCdfStrategies:
    def test_cogroup_matches_broadcast(self, spark, sf_dir):
        from gr_tdigest_spark.operators.window import with_group_cdf

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
            "l_orderkey % 7 = 0")  # deterministic subset (limit() is not)
        cfg = dict(max_size=20000, policy="off")
        # (l_orderkey, l_linenumber) is NOT unique in the synthetic
        # data — compare sorted multisets, not dicts
        def rows(strategy):
            return sorted(
                tuple(r) for r in with_group_cdf(
                    li, ["l_returnflag"], "l_extendedprice",
                    strategy=strategy, **cfg,
                ).select("l_orderkey", "l_linenumber", "cdf").collect()
            )

        a, b = rows("broadcast"), rows("cogroup")
        assert a == b and len(a) > 100

    def test_multi_key_broadcast_cdf(self, spark, sf_dir):
        from gr_tdigest_spark.operators.window import with_group_cdf

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(600)
        out = with_group_cdf(
            li, ["l_returnflag", "l_linestatus"], "l_extendedprice",
            max_size=20000, policy="off",
        )
        vals = out.select("cdf").collect()
        assert len(vals) == 600
        assert all(0.0 <= r["cdf"] <= 1.0 for r in vals)


class TestSimilarityMatmulPath:
    def test_bucket_udf_matches_expr_path(self, spark):
        """The matmul-UDF bucketing (large dim×planes) must agree with
        the inline-expression path bit for bit."""
        import numpy as np
        import pandas as pd
        from pyspark.sql import functions as F
        from gr_tdigest_spark.operators import similarity as sim

        rng = np.random.default_rng(11)
        dim, n = 96, 300
        M = rng.standard_normal((n, dim)).astype(np.float32)
        pdf = pd.DataFrame({
            "vec_id": np.arange(n, dtype=np.int64), "embedding": list(M)
        })
        df = spark.createDataFrame(
            pdf, schema="vec_id long, embedding array<float>"
        )
        planes = sim._hyperplanes(dim, 12, seed=5)
        assert planes.size <= sim._MAX_INLINE_LITERALS
        expr = {
            r["vec_id"]: r["b"]
            for r in df.select(
                "vec_id",
                sim._bucket_expr(F.col("embedding"), planes).alias("b"),
            ).collect()
        }
        # force the UDF path with the same planes
        old = sim._MAX_INLINE_LITERALS
        sim._MAX_INLINE_LITERALS = 1
        try:
            udf = {
                r["vec_id"]: r["b"]
                for r in df.select(
                    "vec_id",
                    sim._bucket_expr(F.col("embedding"), planes).alias("b"),
                ).collect()
            }
        finally:
            sim._MAX_INLINE_LITERALS = old
        assert expr == udf

    def test_cosine_udf_matches_expr_path(self, spark):
        import numpy as np
        import pandas as pd
        from pyspark.sql import functions as F
        from gr_tdigest_spark.operators import similarity as sim

        rng = np.random.default_rng(12)
        dim, n = 64, 200
        M = rng.standard_normal((n, dim)).astype(np.float32)
        q = rng.standard_normal(dim)
        df = spark.createDataFrame(
            pd.DataFrame({
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": list(M),
            }),
            schema="vec_id long, embedding array<float>",
        )

        def run():
            return {
                r["vec_id"]: round(r["c"], 9)
                for r in df.select(
                    "vec_id",
                    sim.cosine_sim_col(F.col("embedding"), q).alias("c"),
                ).collect()
            }

        expr = run()
        old = sim._MAX_INLINE_LITERALS
        sim._MAX_INLINE_LITERALS = 1
        try:
            udf = run()
        finally:
            sim._MAX_INLINE_LITERALS = old
        assert expr == udf

    def test_lsh_topk_768(self, spark):
        """End-to-end ANN at a real embedding dim through the matmul
        path; candidates must be a subset of brute force ranking top."""
        import numpy as np
        import pandas as pd
        from gr_tdigest_spark.operators.similarity import (
            cosine_topk, lsh_bucket_topk,
        )

        rng = np.random.default_rng(13)
        n, dim = 250, 768
        base = rng.standard_normal((10, dim))
        M = (base[rng.integers(0, 10, n)]
             + 0.2 * rng.standard_normal((n, dim))).astype(np.float32)
        df = spark.createDataFrame(
            pd.DataFrame({
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": list(M),
            }),
            schema="vec_id long, embedding array<float>",
        )
        q = M[0].astype(np.float64)
        approx = lsh_bucket_topk(
            df.where("vec_id != 0"), q, k=5, n_planes=16, seed=23,
            multiprobe=2,
        ).collect()
        assert 0 < len(approx) <= 5
        exact_top = {
            r["vec_id"]
            for r in cosine_topk(df.where("vec_id != 0"), q, 30).collect()
        }
        # every ANN hit should be a genuinely close vector
        assert all(r["vec_id"] in exact_top for r in approx)


class TestNearDupClusters:
    def test_chain_and_triangle_components(self, spark):
        """Min-label propagation must traverse chains (diameter > 1):
        a-b, b-c, c-d is one component labeled by its min id."""
        import pandas as pd
        from gr_tdigest_spark.operators.dedup import near_dup_clusters

        pairs = spark.createDataFrame(
            pd.DataFrame({
                "a": [10, 20, 30, 50, 60, 60],
                "b": [20, 30, 40, 60, 70, 50],
            })
        )
        got = {
            r["id"]: r["cluster"]
            for r in near_dup_clusters(pairs).collect()
        }
        assert got == {10: 10, 20: 10, 30: 10, 40: 10,
                       50: 50, 60: 50, 70: 50}

    def test_long_chain_converges(self, spark):
        import pandas as pd
        from gr_tdigest_spark.operators.dedup import near_dup_clusters

        n = 40  # diameter 39 — exercises multi-round propagation
        pairs = spark.createDataFrame(
            pd.DataFrame({"a": range(n - 1), "b": range(1, n)})
        )
        got = {
            r["id"]: r["cluster"]
            for r in near_dup_clusters(pairs, max_iter=50).collect()
        }
        assert set(got.values()) == {0} and len(got) == n


class TestDedupKeepBest:
    def _corpus(self, spark):
        import pandas as pd

        # clusters: {1,2,3} and {10,11}; 20, 21 unclustered; 30 NULL id
        return spark.createDataFrame(
            pd.DataFrame({
                "doc_id": pd.array(
                    [1, 2, 3, 10, 11, 20, 21, None], dtype="Int64"
                ),
                "score": [0.5, 0.9, 0.9, None, None, 0.1, 0.2, 0.3],
            })
        )

    def _clusters(self, spark):
        import pandas as pd

        return spark.createDataFrame(
            pd.DataFrame({
                "id": [1, 2, 3, 10, 11],
                "cluster": [1, 1, 1, 10, 10],
            })
        )

    def test_representatives_max_order_ties_min_id(self, spark):
        from gr_tdigest_spark.operators.dedup import cluster_representatives

        reps = {
            r["cluster"]: r["rep_id"]
            for r in cluster_representatives(
                self._corpus(spark), self._clusters(spark),
                "doc_id", "score",
            ).collect()
        }
        # cluster 1: max score 0.9 tie between ids 2,3 → min id 2;
        # cluster 10: all-NULL order values → null-safe min-id fallback
        assert reps == {1: 2, 10: 10}

    def test_representatives_default_min_id(self, spark):
        from gr_tdigest_spark.operators.dedup import cluster_representatives

        reps = {
            r["cluster"]: r["rep_id"]
            for r in cluster_representatives(
                self._corpus(spark), self._clusters(spark), "doc_id"
            ).collect()
        }
        assert reps == {1: 1, 10: 10}

    def test_keep_best_materializes_dedup_corpus(self, spark):
        from gr_tdigest_spark.operators.dedup import dedup_keep_best

        kept = dedup_keep_best(
            self._corpus(spark), self._clusters(spark), "doc_id", "score"
        ).collect()
        ids = sorted(
            (r["doc_id"] for r in kept), key=lambda x: (x is None, x)
        )
        # one rep per cluster + both unclustered + the NULL-id row
        assert ids == [2, 10, 20, 21, None]

    def test_duplicate_id_rows_travel_together(self, spark):
        import pandas as pd
        from gr_tdigest_spark.operators.dedup import dedup_keep_best

        df = spark.createDataFrame(
            pd.DataFrame({
                "doc_id": [1, 1, 2, 3],
                "score": [0.1, 0.2, 0.9, 0.5],
            })
        )
        clusters = spark.createDataFrame(
            pd.DataFrame({"id": [1, 2], "cluster": [1, 1]})
        )
        kept = dedup_keep_best(df, clusters, "doc_id", "score").collect()
        # winner is 2 (score 0.9); both id-1 rows drop together
        assert sorted(r["doc_id"] for r in kept) == [2, 3]

    def test_near_dedup_end_to_end(self, spark):
        import pandas as pd
        from gr_tdigest_spark.operators.dedup import near_dedup

        boiler = (
            "the quick brown fox jumps over the lazy dog again and "
            "again while the observers take careful notes about it"
        )
        rows = pd.DataFrame({
            "doc_id": [1, 2, 3, 4],
            "text": [
                boiler,
                boiler + " extra",           # near-dup of 1, longer
                "completely different text about spark aggregation "
                "plans and shuffle boundaries in modern engines",
                boiler + " extra",           # exact dup of 2
            ],
        })
        df = spark.createDataFrame(rows)
        out = near_dedup(
            df, "doc_id", "text",
            order_col=None, method="minhash",
            n_hashes=64, bands=16, threshold=0.5,
        )
        kept = sorted(r["doc_id"] for r in out.collect())
        # {1,2,4} collapse to min id 1; 3 survives untouched
        assert kept == [1, 3]
        assert out.columns == df.columns

    def test_nan_order_value_loses_election(self, spark):
        """Spark's max crowns NaN — the election must canonicalize NaN
        to NULL so the worst row cannot win keep-BEST."""
        import math
        import pandas as pd
        from gr_tdigest_spark.operators.dedup import cluster_representatives

        df = spark.createDataFrame(
            pd.DataFrame({
                "doc_id": [1, 2, 3, 4],
                "score": [math.nan, 0.9, math.nan, math.nan],
            })
        )
        clusters = spark.createDataFrame(
            pd.DataFrame({"id": [1, 2, 3, 4], "cluster": [1, 1, 3, 3]})
        )
        reps = {
            r["cluster"]: r["rep_id"]
            for r in cluster_representatives(
                df, clusters, "doc_id", "score"
            ).collect()
        }
        # cluster 1: NaN loses to 0.9 → 2; cluster 3: all-NaN → min id
        assert reps == {1: 2, 3: 3}

    def test_absent_min_id_cannot_ghost_a_cluster(self, spark):
        """order_col=None elects among ids PRESENT in df: stale labels
        for removed rows shift the winner, never erase the cluster."""
        import pandas as pd
        from gr_tdigest_spark.operators.dedup import dedup_keep_best

        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [2, 3, 9], "x": [1.0, 2.0, 3.0]})
        )
        clusters = spark.createDataFrame(  # doc 1 no longer in df
            pd.DataFrame({"id": [1, 2, 3], "cluster": [1, 1, 1]})
        )
        kept = sorted(
            r["doc_id"]
            for r in dedup_keep_best(df, clusters, "doc_id").collect()
        )
        assert kept == [2, 9]

    def test_keep_longest_policy(self, spark):
        """order_col on a derived length column implements the usual
        keep-the-longest-copy near-dedup policy."""
        import pandas as pd
        from pyspark.sql import functions as F
        from gr_tdigest_spark.operators.dedup import near_dedup

        boiler = (
            "the quick brown fox jumps over the lazy dog again and "
            "again while the observers take careful notes about it"
        )
        df = spark.createDataFrame(
            pd.DataFrame({
                "doc_id": [1, 2],
                "text": [boiler, boiler + " extra tail"],
            })
        ).withColumn("__len", F.length("text"))
        out = near_dedup(
            df, "doc_id", "text",
            order_col="__len", method="minhash",
            n_hashes=64, bands=16, threshold=0.5,
        )
        assert [r["doc_id"] for r in out.collect()] == [2]


class TestAnnIndex:
    def test_index_query_matches_inline_and_prunes(self, spark, tmp_path):
        """Persisted bucket-partitioned ANN index returns the same
        top-k as the inline operator, and the probe scan shows parquet
        PARTITION pruning (PartitionFilters on bucket)."""
        import io
        import numpy as np
        import pandas as pd
        from contextlib import redirect_stdout
        from gr_tdigest_spark.operators.similarity import (
            ann_index_topk, build_ann_index, lsh_bucket_topk,
        )

        rng = np.random.default_rng(21)
        n, dim = 300, 768
        base = rng.standard_normal((12, dim))
        M = (base[rng.integers(0, 12, n)]
             + 0.2 * rng.standard_normal((n, dim))).astype(np.float32)
        df = spark.createDataFrame(
            pd.DataFrame({
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": list(M),
            }),
            schema="vec_id long, embedding array<float>",
        )
        path = str(tmp_path / "annidx")
        build_ann_index(df, path, n_planes=16, seed=23)
        q = M[0].astype(np.float64)

        got = [
            (r["vec_id"], round(r["cosine"], 9))
            for r in ann_index_topk(spark, path, q, k=5,
                                    multiprobe=2).collect()
        ]
        ref = [
            (r["vec_id"], round(r["cosine"], 9))
            for r in lsh_bucket_topk(df, q, k=5, n_planes=16, seed=23,
                                     multiprobe=2).collect()
        ]
        assert got == ref and len(got) > 0

        # pruning evidence: the index scan carries PartitionFilters
        plan = io.StringIO()
        with redirect_stdout(plan):
            ann_index_topk(spark, path, q, k=5,
                           multiprobe=2).explain("formatted")
        txt = plan.getvalue()
        assert "PartitionFilters" in txt and "bucket" in txt

    def test_ivf_index_exact_at_full_probe_and_pruned(self, spark,
                                                      tmp_path):
        """IVF (k-means inverted-file) index: probing ALL lists equals
        the exact brute-force top-k; a small nprobe keeps high recall
        on clustered data, scans only probed partitions
        (PartitionFilters), and rebuilding reproduces the index."""
        import io
        from contextlib import redirect_stdout

        import numpy as np
        import pandas as pd

        from gr_tdigest_spark.operators.similarity import (
            build_ivf_index, cosine_topk, ivf_index_topk,
        )

        rng = np.random.default_rng(33)
        n, dim = 400, 64
        base = rng.standard_normal((8, dim))
        M = (base[rng.integers(0, 8, n)]
             + 0.15 * rng.standard_normal((n, dim))).astype(np.float32)
        df = spark.createDataFrame(
            pd.DataFrame({
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": list(M),
            }),
            schema="vec_id long, embedding array<float>",
        )
        path = str(tmp_path / "ivfidx")
        build_ivf_index(df, path, n_lists=8, n_iter=8, seed=29)
        q = M[3].astype(np.float64)

        exact = [(r["vec_id"], round(r["cosine"], 9))
                 for r in cosine_topk(df, q, k=10).collect()]
        full = [(r["vec_id"], round(r["cosine"], 9))
                for r in ivf_index_topk(spark, path, q, k=10,
                                        nprobe=8).collect()]
        assert full == exact  # nprobe == n_lists degrades to exact

        pruned = {r["vec_id"] for r in
                  ivf_index_topk(spark, path, q, k=10, nprobe=2).collect()}
        recall = len(pruned & {v for v, _ in exact}) / 10
        assert recall >= 0.8, recall  # clustered data → high recall

        plan = io.StringIO()
        with redirect_stdout(plan):
            ivf_index_topk(spark, path, q, k=10,
                           nprobe=2).explain("formatted")
        txt = plan.getvalue()
        assert "PartitionFilters" in txt and "list_id" in txt

        # deterministic rebuild: same data + seed → same assignments
        path2 = str(tmp_path / "ivfidx2")
        build_ivf_index(df, path2, n_lists=8, n_iter=8, seed=29)
        a1 = {(r["vec_id"], r["list_id"]) for r in
              spark.read.parquet(path).select("vec_id", "list_id")
              .collect()}
        a2 = {(r["vec_id"], r["list_id"]) for r in
              spark.read.parquet(path2).select("vec_id", "list_id")
              .collect()}
        assert a1 == a2

        # NULL embeddings are dropped, not crashed on; empty input is a
        # clear error
        import pytest
        with_null = df.unionByName(
            spark.createDataFrame(
                [(9999, None)], "vec_id long, embedding array<float>"
            )
        )
        path3 = str(tmp_path / "ivfidx3")
        build_ivf_index(with_null, path3, n_lists=8, n_iter=2, seed=29)
        assert spark.read.parquet(path3).count() == n  # null row dropped
        with pytest.raises(ValueError, match="no non-NULL"):
            build_ivf_index(
                df.where("vec_id < 0"), str(tmp_path / "ivfidx4"),
                n_lists=4,
            )


class TestRealMultimodalDecoders:
    """PPM (P6) and WAV (PCM16) are decoded for real — struct/numpy
    only, no external codecs — and the features are genuine functions
    of the pixels/samples, not payload hashes."""

    @staticmethod
    def _ppm(w, h, rgb):
        import numpy as np

        img = np.zeros((h, w, 3), dtype=np.uint8)
        img[:, :, 0], img[:, :, 1], img[:, :, 2] = rgb
        return b"P6\n# comment\n%d %d\n255\n" % (w, h) + img.tobytes()

    @staticmethod
    def _wav(samples_i16, rate=8000, channels=1):
        import struct

        data = samples_i16.astype("<i2").tobytes()
        byte_rate = rate * channels * 2
        return (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                    byte_rate, channels * 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data
        )

    def test_ppm_solid_color_grid_means(self, spark):
        import numpy as np
        from gr_tdigest_spark.operators.multimodal import (
            decode_image_features,
        )

        red = self._ppm(8, 8, (200, 0, 0))
        blue = self._ppm(8, 8, (0, 0, 200))
        df = spark.createDataFrame(
            [(1, bytearray(red)), (2, bytearray(blue))],
            "media_id long, payload binary",
        )
        out = {
            r["media_id"]: np.asarray(r["features"])
            for r in decode_image_features(df, stub_mode="strict").collect()
        }
        # solid red: every grid cell mean = (200,0,0) → after L2 norm the
        # R slots are equal and G/B are exactly 0
        r = out[1].reshape(-1, 3)
        assert np.all(r[:, 0] > 0) and np.all(r[:, 1:] == 0.0)
        b = out[2].reshape(-1, 3)
        assert np.all(b[:, 2] > 0) and np.all(b[:, :2] == 0.0)

    def test_ppm_spatial_structure(self, spark):
        """A half-black/half-white image must yield different grid cells
        — a payload-hash fake could never do that."""
        import numpy as np
        from gr_tdigest_spark.operators.multimodal import (
            _decode_ppm, _ppm_grid_features,
        )

        img = np.zeros((8, 8, 3), dtype=np.uint8)
        img[:, 4:, :] = 255
        payload = b"P6\n8 8\n255\n" + img.tobytes()
        back = _decode_ppm(payload)
        assert np.array_equal(back, img)
        feats = _ppm_grid_features(back).reshape(4, 4, 3)
        assert np.all(feats[:, :2, :] == 0.0) and np.all(feats[:, 2:, :] > 0)

    def test_wav_energy_localization(self, spark):
        """Silence then a loud tone: energy must sit in the later RMS
        bins; stereo payloads fold to mono."""
        import numpy as np
        from gr_tdigest_spark.operators.multimodal import (
            decode_audio_features,
        )

        n = 8000
        s = np.zeros(n)
        t = np.arange(n // 2) / 8000.0
        s[n // 2:] = 0.8 * np.sin(2 * np.pi * 440 * t)
        mono = self._wav((s * 32767).astype(np.int16))
        stereo_raw = np.repeat((s * 32767).astype(np.int16), 2)
        stereo = self._wav(stereo_raw, channels=2)
        df = spark.createDataFrame(
            [(1, bytearray(mono)), (2, bytearray(stereo))],
            "media_id long, payload binary",
        )
        out = {
            r["media_id"]: np.asarray(r["features"])
            for r in decode_audio_features(df, stub_mode="strict").collect()
        }
        for mid in (1, 2):
            rms = out[mid][:16]
            assert np.all(rms[:8] == 0.0) and np.all(rms[8:] > 0.0), mid
        # stereo fold == mono (identical channels)
        assert np.allclose(out[1], out[2], atol=1e-6)

    def test_strict_still_raises_for_compressed(self, spark):
        import pytest
        from gr_tdigest_spark.operators.multimodal import (
            decode_audio_features, decode_image_features,
        )

        df = spark.createDataFrame(
            [(1, bytearray(b"\xff\xd8\xff JPEG-ish garbage"))],
            "media_id long, payload binary",
        )
        with pytest.raises(Exception, match="NotImplementedError|decode"):
            decode_image_features(df, stub_mode="strict").collect()
        with pytest.raises(Exception, match="NotImplementedError|decode"):
            decode_audio_features(df, stub_mode="strict").collect()

    def test_corrupt_payloads_route_to_stub(self, spark):
        """Payloads that pass the magic check but are malformed
        (truncated P6 header, short pixel buffer, short 'fmt ' chunk)
        must decode to None → stub fallback, never crash the Arrow
        batch (r3 advice)."""
        import struct
        from gr_tdigest_spark.operators.multimodal import (
            _decode_ppm, _decode_wav_pcm16,
            decode_audio_features, decode_image_features,
        )

        bad_ppm = [
            b"P6",                                   # nothing after magic
            b"P6\n8",                                # truncated header
            b"P6\n8 8\n255\n" + b"\x00" * 10,        # short pixel buffer
            b"P6\n0 0\n255\n",                       # degenerate dims
        ]
        for p in bad_ppm:
            assert _decode_ppm(p) is None, p
        # ≥44 bytes so the length gate passes, but the 'fmt ' body is only
        # 4 bytes → the bits-per-sample read must hit struct.error
        short_fmt = (
            b"RIFF" + struct.pack("<I", 48) + b"WAVE"
            + b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x01\x00"
            + b"data" + struct.pack("<I", 24) + b"\x00" * 24
        )
        no_fmt = (
            b"RIFF" + struct.pack("<I", 40) + b"WAVE"
            + b"data" + struct.pack("<I", 32) + b"\x00" * 32
        )
        for p in (short_fmt, no_fmt):
            assert _decode_wav_pcm16(p) is None

        bad = bad_ppm + [short_fmt, no_fmt]
        df = spark.createDataFrame(
            [(i, bytearray(p)) for i, p in enumerate(bad)],
            "media_id long, payload binary",
        )
        # fake mode: every corrupt payload still yields a vector
        rows = decode_image_features(df, stub_mode="fake").collect()
        assert len(rows) == len(bad)
        assert all(r["features"] is not None for r in rows)
        rows = decode_audio_features(df, stub_mode="fake").collect()
        assert all(r["features"] is not None for r in rows)

    def test_resize_images_real_geometry(self, spark):
        """PPM payloads are REALLY resized: downscaling a half-black /
        half-white image preserves the spatial split, the output is a
        valid P6 the decoder round-trips, and resized payloads feed the
        feature op unchanged. Corrupt payloads follow the stub."""
        import numpy as np
        from gr_tdigest_spark.operators.multimodal import (
            _decode_ppm, decode_image_features, resize_images,
        )

        img = np.zeros((16, 16, 3), dtype=np.uint8)
        img[:, 8:, :] = 255  # left black, right white
        payload = b"P6\n16 16\n255\n" + img.tobytes()
        df = spark.createDataFrame(
            [(1, bytearray(payload)), (2, bytearray(b"\x89PNG garbage"))],
            "media_id long, payload binary",
        )
        out = {r["media_id"]: r for r in
               resize_images(df, 4, 4, stub_mode="fake").collect()}
        assert out[1]["width"] == 4 and out[1]["height"] == 4
        small = _decode_ppm(bytes(out[1]["payload"]))
        assert small.shape == (4, 4, 3)
        assert np.all(small[:, :2, :] == 0) and np.all(small[:, 2:, :] == 255)
        # fake path: right geometry, uniform deterministic shade
        fake = _decode_ppm(bytes(out[2]["payload"]))
        assert fake.shape == (4, 4, 3) and len(np.unique(fake)) == 1
        # resized output composes with the feature op (strict = real)
        feats = decode_image_features(
            resize_images(df.filter("media_id = 1"), 8, 8),
            stub_mode="strict",
        ).collect()
        assert feats[0]["features"] is not None

    def test_pil_path_absent_and_injected(self, monkeypatch):
        """Without Pillow, _decode_with_pil returns None (this container
        has no PIL); with a fake PIL injected, the decoded array routes
        through — the import-gated real path for clusters that have it."""
        import sys
        import types
        import numpy as np
        from gr_tdigest_spark.operators import multimodal as mm

        assert mm._decode_with_pil(b"\x89PNG fake") is None  # no PIL here

        arr = np.full((8, 8, 3), 7, dtype=np.uint8)

        class _Im:
            def convert(self, mode):
                assert mode == "RGB"
                return arr
            def __enter__(self):
                return self
            def __exit__(self, *a):
                return False

        fake_img_mod = types.SimpleNamespace(open=lambda buf: _Im())
        fake_pil = types.ModuleType("PIL")
        fake_pil.Image = fake_img_mod
        monkeypatch.setitem(sys.modules, "PIL", fake_pil)
        monkeypatch.setitem(
            sys.modules, "PIL.Image",
            types.SimpleNamespace(**fake_img_mod.__dict__),
        )
        out = mm._decode_with_pil(b"\x89PNG fake")
        assert out is not None and out.shape == (8, 8, 3)
        assert np.all(out == 7)


class TestIvfBatchTopk:
    def test_batch_matches_per_query_and_prunes(self, spark, tmp_path):
        """ivf_index_topk_batch must return, for every query, exactly
        the rows the single-query operator returns at the same nprobe
        — and at nprobe == n_lists every query's answer is the exact
        brute force. The index scan carries PartitionFilters."""
        import io
        from contextlib import redirect_stdout

        import numpy as np

        from gr_tdigest_spark.operators.similarity import (
            build_ivf_index, ivf_index_topk, ivf_index_topk_batch,
        )

        rng = np.random.default_rng(44)
        n, dim = 300, 48
        base = rng.standard_normal((6, dim))
        M = (base[rng.integers(0, 6, n)]
             + 0.15 * rng.standard_normal((n, dim))).astype(np.float64)
        df = spark.createDataFrame(
            [(int(i), M[i].tolist()) for i in range(n)],
            "vec_id long, embedding array<double>",
        )
        path = str(tmp_path / "ivfbatch")
        build_ivf_index(df, path, n_lists=6, n_iter=6, seed=29)

        qids = [3, 57, 101, 200]
        queries = spark.createDataFrame(
            [(int(i), M[i].tolist()) for i in qids],
            "query_id long, query_vec array<double>",
        )
        for nprobe in (2, 6):
            batch = ivf_index_topk_batch(
                spark, path, queries, k=5, nprobe=nprobe,
            )
            got = {}
            for r in batch.collect():
                got.setdefault(r["query_id"], []).append(
                    (r["vec_id"], round(r["cosine"], 9))
                )
            for q in qids:
                single = [
                    (r["vec_id"], round(r["cosine"], 9))
                    for r in ivf_index_topk(
                        spark, path, M[q], k=5, nprobe=nprobe
                    ).collect()
                ]
                assert sorted(got[q], key=lambda t: (-t[1], t[0])) \
                    == single, (q, nprobe)

        plan = io.StringIO()
        with redirect_stdout(plan):
            ivf_index_topk_batch(
                spark, path, queries, k=5, nprobe=2
            ).explain("formatted")
        txt = plan.getvalue()
        assert "PartitionFilters" in txt and "list_id" in txt

    def test_null_and_duplicate_queries(self, spark, tmp_path):
        """NULL query vectors are skipped (not a mid-job numpy crash);
        exact duplicate query rows (upstream join fan-out) collapse —
        each hit appears once and the full k distinct hits survive."""
        import numpy as np

        from gr_tdigest_spark.operators.similarity import (
            build_ivf_index, ivf_index_topk_batch,
        )

        rng = np.random.default_rng(3)
        M = rng.standard_normal((60, 12))
        df = spark.createDataFrame(
            [(int(i), M[i].tolist()) for i in range(60)],
            "vec_id long, embedding array<double>",
        )
        path = str(tmp_path / "ivfbatch_nulls")
        build_ivf_index(df, path, n_lists=3, n_iter=3, seed=5)
        queries = spark.createDataFrame(
            [(0, M[0].tolist()), (0, M[0].tolist()),   # exact dup
             (1, M[5].tolist()), (2, None)],           # NULL vec
            "query_id long, query_vec array<double>",
        )
        out = ivf_index_topk_batch(spark, path, queries, k=4, nprobe=3)
        rows = out.collect()
        per = {}
        for r in rows:
            per.setdefault(r["query_id"], []).append(r["vec_id"])
        assert 2 not in per                      # NULL query skipped
        assert sorted(per) == [0, 1]
        for q in (0, 1):
            assert len(per[q]) == 4
            assert len(set(per[q])) == 4         # k DISTINCT hits

    def test_interleaved_calls_do_not_invalidate_each_other(
        self, spark, tmp_path
    ):
        """r5 advice: the module-global one-slot probe cache let a
        second call unpersist the first's probe table mid-use (and was
        not thread-safe).  Probes are now materialized per call: start
        call A, run call B to completion, THEN consume A — A's results
        must equal a fresh un-interleaved run, and the module holds no
        global cache slot."""
        import numpy as np

        import gr_tdigest_spark.operators.similarity as sim
        from gr_tdigest_spark.operators.similarity import (
            build_ivf_index, ivf_index_topk_batch,
        )

        assert not hasattr(sim, "_PROBE_PAIRS_CACHE")
        rng = np.random.default_rng(11)
        M = rng.standard_normal((70, 12))
        df = spark.createDataFrame(
            [(int(i), M[i].tolist()) for i in range(70)],
            "vec_id long, embedding array<double>",
        )
        pa, pb = str(tmp_path / "ivf_a"), str(tmp_path / "ivf_b")
        build_ivf_index(df, pa, n_lists=3, n_iter=3, seed=5)
        build_ivf_index(
            df.where("vec_id < 40"), pb, n_lists=2, n_iter=3, seed=6
        )
        qa = spark.createDataFrame(
            [(0, M[0].tolist()), (1, M[33].tolist())],
            "query_id long, query_vec array<double>",
        )
        qb = spark.createDataFrame(
            [(9, M[9].tolist())],
            "query_id long, query_vec array<double>",
        )
        a = ivf_index_topk_batch(spark, pa, qa, k=4, nprobe=2)
        b_rows = ivf_index_topk_batch(
            spark, pb, qb, k=4, nprobe=2
        ).collect()
        got_a = sorted(
            (r["query_id"], r["vec_id"], round(r["cosine"], 9))
            for r in a.collect()
        )
        fresh = sorted(
            (r["query_id"], r["vec_id"], round(r["cosine"], 9))
            for r in ivf_index_topk_batch(
                spark, pa, qa, k=4, nprobe=2
            ).collect()
        )
        assert got_a == fresh
        assert len(b_rows) == 4

    def test_batch_works_without_arrow_conversion(self, spark, tmp_path):
        """Conf-independence (the r4 lesson): the batch path must not
        assume Arrow driver<->JVM conversion."""
        import numpy as np

        from gr_tdigest_spark.operators.similarity import (
            build_ivf_index, ivf_index_topk_batch,
        )

        ns = spark.newSession()
        ns.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
        ns.conf.set(
            "spark.sql.execution.arrow.pyspark.fallback.enabled", "false"
        )
        rng = np.random.default_rng(7)
        M = rng.standard_normal((80, 16))
        df = ns.createDataFrame(
            [(int(i), M[i].tolist()) for i in range(80)],
            "vec_id long, embedding array<double>",
        )
        path = str(tmp_path / "ivfbatch_noarrow")
        build_ivf_index(df, path, n_lists=4, n_iter=3, seed=5)
        queries = ns.createDataFrame(
            [(0, M[0].tolist()), (1, M[9].tolist())],
            "query_id long, query_vec array<double>",
        )
        out = ivf_index_topk_batch(ns, path, queries, k=3, nprobe=4)
        rows = out.collect()
        assert len(rows) == 6
        per = {}
        for r in rows:
            per.setdefault(r["query_id"], []).append(r["vec_id"])
        assert 0 in per[0] and 9 in per[1]  # each query finds itself


class TestAnnBatchTopk:
    def test_batch_matches_per_query_and_prunes(self, spark, tmp_path):
        """ann_index_topk_batch (the hyperplane twin of the IVF batch
        operator) must return, per query, exactly the per-query
        ann_index_topk rows at the same multiprobe; the index scan
        carries PartitionFilters on bucket.  NULL and duplicate query
        rows follow the shared hygiene contract."""
        import io
        from contextlib import redirect_stdout

        import numpy as np

        from gr_tdigest_spark.operators.similarity import (
            ann_index_topk, ann_index_topk_batch, build_ann_index,
        )

        rng = np.random.default_rng(17)
        n, dim = 240, 24
        M = rng.standard_normal((n, dim))
        df = spark.createDataFrame(
            [(int(i), M[i].tolist()) for i in range(n)],
            "vec_id long, embedding array<double>",
        )
        path = str(tmp_path / "annbatch")
        build_ann_index(df, path, n_planes=4, seed=23)

        qids = [7, 66, 150]
        queries = spark.createDataFrame(
            [(int(i), M[i].tolist()) for i in qids]
            + [(7, M[7].tolist()), (99, None)],   # exact dup + NULL vec
            "query_id long, query_vec array<double>",
        )
        for mp in (0, 1):
            batch = ann_index_topk_batch(
                spark, path, queries, k=5, multiprobe=mp,
            )
            got = {}
            for r in batch.collect():
                got.setdefault(r["query_id"], []).append(
                    (r["vec_id"], round(r["cosine"], 9))
                )
            assert 99 not in got            # NULL query skipped
            assert sorted(got) == qids      # dup collapsed
            for q in qids:
                single = [
                    (r["vec_id"], round(r["cosine"], 9))
                    for r in ann_index_topk(
                        spark, path, M[q], k=5, multiprobe=mp
                    ).collect()
                ]
                assert sorted(got[q], key=lambda t: (-t[1], t[0])) \
                    == single, (q, mp)
                assert len({v for v, _ in got[q]}) == len(got[q])

        plan = io.StringIO()
        with redirect_stdout(plan):
            ann_index_topk_batch(
                spark, path, queries, k=5, multiprobe=1
            ).explain("formatted")
        txt = plan.getvalue()
        assert "PartitionFilters" in txt and "bucket" in txt


class TestIvfAppend:
    def test_append_equals_rebuild_with_frozen_centroids(
        self, spark, tmp_path
    ):
        """append_to_ivf_index assigns with the FROZEN stored
        centroids: every row of the appended index carries the argmax
        list under those centroids (== rebuild-on-union with the same
        frozen quantizer), full-probe top-k over the appended index is
        the exact brute force over the union, and the 1-probe pruning
        pin stays intact."""
        import numpy as np

        from gr_tdigest_spark.operators.similarity import (
            append_to_ivf_index, build_ivf_index, cosine_topk,
            ivf_index_topk,
        )

        rng = np.random.default_rng(31)
        A = rng.standard_normal((80, 16))
        B = rng.standard_normal((40, 16))
        dfa = spark.createDataFrame(
            [(int(i), A[i].tolist()) for i in range(80)],
            "vec_id long, embedding array<double>",
        )
        dfb = spark.createDataFrame(
            [(int(100 + i), B[i].tolist()) for i in range(40)],
            "vec_id long, embedding array<double>",
        )
        path = str(tmp_path / "ivf_app")
        build_ivf_index(dfa, path, n_lists=4, n_iter=4, seed=7)
        append_to_ivf_index(dfb, path)

        idx = spark.read.parquet(path)
        assert idx.count() == 120
        crows = spark.read.parquet(f"{path}_centroids").collect()
        centers = np.asarray(
            [list(r["vec"]) for r in
             sorted(crows, key=lambda r: r["list_id"])]
        )
        for r in idx.collect():
            v = np.asarray(r["embedding"], dtype=np.float64)
            n = np.linalg.norm(v)
            vn = v / (n if n > 0 else 1.0)
            assert int(np.argmax(centers @ vn)) == r["list_id"]

        union = dfa.union(dfb)
        q = A[3]
        brute = [
            (r["vec_id"], round(r["cosine"], 9))
            for r in cosine_topk(union, q, k=6).collect()
        ]
        viaidx = [
            (r["vec_id"], round(r["cosine"], 9))
            for r in ivf_index_topk(
                spark, path, q, k=6, nprobe=4
            ).collect()
        ]
        assert brute == viaidx

        # appended vectors are findable through the index
        hit = ivf_index_topk(spark, path, B[5], k=1, nprobe=4).collect()
        assert hit[0]["vec_id"] == 105

        pruned = ivf_index_topk(spark, path, q, k=3, nprobe=1)
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        after = plan.split("PartitionFilters: [", 1)
        assert len(after) == 2 and "list_id" in after[1][:300]
        assert pruned.count() >= 1


class TestAnnAppend:
    def test_append_equals_rebuild_on_union(self, spark, tmp_path):
        """append_to_ann_index buckets with the FROZEN stored planes:
        the appended index holds the same (vec_id, bucket) layout as
        rebuilding on the union (hyperplanes are data-independent),
        appended vectors are findable, and the probe's partition
        pruning stays in the plan."""
        import numpy as np

        from gr_tdigest_spark.operators.similarity import (
            ann_index_topk, append_to_ann_index, build_ann_index,
            cosine_topk,
        )

        rng = np.random.default_rng(47)
        A = rng.standard_normal((60, 12))
        B = rng.standard_normal((30, 12))
        dfa = spark.createDataFrame(
            [(int(i), A[i].tolist()) for i in range(60)],
            "vec_id long, embedding array<double>",
        )
        dfb = spark.createDataFrame(
            [(int(100 + i), B[i].tolist()) for i in range(30)],
            "vec_id long, embedding array<double>",
        )
        union = dfa.union(dfb)

        path = str(tmp_path / "ann_app")
        build_ann_index(dfa, path, n_planes=6, seed=23)
        append_to_ann_index(dfb, path)

        rebuilt = str(tmp_path / "ann_reb")
        build_ann_index(union, rebuilt, n_planes=6, seed=23)
        lay_a = {(r["vec_id"], r["bucket"])
                 for r in spark.read.parquet(path).collect()}
        lay_r = {(r["vec_id"], r["bucket"])
                 for r in spark.read.parquet(rebuilt).collect()}
        assert lay_a == lay_r and len(lay_a) == 90

        # full-probe (multiprobe covers all buckets at tiny n_planes?
        # no — compare against the REBUILT index instead: identical
        # layout must give identical answers at any multiprobe)
        q = B[7]
        got = [(r["vec_id"], round(r["cosine"], 9))
               for r in ann_index_topk(spark, path, q, k=5,
                                       multiprobe=1).collect()]
        ref = [(r["vec_id"], round(r["cosine"], 9))
               for r in ann_index_topk(spark, rebuilt, q, k=5,
                                       multiprobe=1).collect()]
        assert got == ref
        # the appended vector's own bucket is probed at multiprobe=0:
        # its exact copy must surface as the top hit
        hit = ann_index_topk(spark, path, B[7], k=1).collect()
        assert hit[0]["vec_id"] == 107

        # pruning pin: the probe scan carries partition filters
        plan = ann_index_topk(
            spark, path, q, k=3
        )._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan
        assert "bucket" in plan.split("PartitionFilters", 1)[1][:200]
