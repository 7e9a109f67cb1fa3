"""Sequence packing (operators/pack.py): deterministic offset packing
into token-budgeted packs, bucketed so no window spans the table."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gr_tdigest_spark.operators.pack import pack_sequences


def _docs(spark, n=400, seed=5):
    rng = np.random.default_rng(seed)
    rows = [(int(i), int(rng.integers(1, 900))) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long"), rows


class TestPackSequences:
    def test_exact_oracle_and_layout_independence(self, spark):
        """The assignment must equal a driver-side replay of the same
        rule: within each bucket, lay docs out in (priority, id) order
        and give each doc the pack its START offset falls in."""
        from gr_tdigest_spark.operators.pack import (
            _PACK_ORDER_SALT, _PACK_SALT,
        )
        from gr_tdigest_spark.operators.sample import sample_priority

        df, _ = _docs(spark)
        out = pack_sequences(df, "doc_id", "n_tokens", 4096, n_buckets=8,
                             seed=3)
        got = {r["doc_id"]: (r["__pack_bucket"], r["__pack_slot"])
               for r in out.collect()}

        # replay with the same JVM hash expressions (collected once)
        probe = df.select(
            "doc_id", "n_tokens",
            F.pmod(sample_priority(["doc_id"], 3 + _PACK_SALT),
                   F.lit(8)).cast("string").alias("b"),
            sample_priority(["doc_id"], 3 + _PACK_ORDER_SALT).alias("pr"),
        ).collect()
        byb = {}
        for r in probe:
            byb.setdefault(r["b"], []).append(
                (r["pr"], r["doc_id"], r["n_tokens"])
            )
        expect = {}
        for b, rows in byb.items():
            off = 0
            for _, did, n in sorted(rows):
                expect[did] = (b, off // 4096)
                off += n
        assert got == expect

        for parts in (1, 3, 11):
            got2 = {r["doc_id"]: (r["__pack_bucket"], r["__pack_slot"])
                    for r in pack_sequences(
                        df.repartition(parts), "doc_id", "n_tokens",
                        4096, n_buckets=8, seed=3).collect()}
            assert got2 == got, parts

    def test_pack_budget_property(self, spark):
        """Every pack's total is < max_tokens + its longest doc (the
        boundary doc belongs to the pack it starts in), and within a
        bucket all but the last pack reach at least max_tokens counting
        the straddling doc."""
        df, _ = _docs(spark, n=600, seed=11)
        out = pack_sequences(df, "doc_id", "n_tokens", 2048,
                             n_buckets=4, seed=0)
        rows = out.collect()
        packs = {}
        for r in rows:
            key = (r["__pack_bucket"], r["__pack_slot"])
            packs.setdefault(key, []).append(r["n_tokens"])
        for (b, s), toks in packs.items():
            assert sum(toks) < 2048 + max(toks), (b, s)
        # contiguity: slots are 0..max_slot with no gaps (a straddling
        # doc can own trailing boundaries, so max_slot may sit below
        # floor((total-1)/max) — but never above it)
        byb = {}
        for (b, s), toks in packs.items():
            byb.setdefault(b, {})[s] = sum(toks)
        for b, slots in byb.items():
            total = sum(slots.values())
            top = max(slots)
            assert set(slots) == set(range(top + 1)), b
            assert top <= (total - 1) // 2048, b

    def test_null_and_nonpositive_counts_unpacked(self, spark):
        df = spark.createDataFrame(
            [(1, 100), (2, None), (3, 0), (4, -5), (5, 300)],
            "doc_id long, n_tokens long",
        )
        out = pack_sequences(df, "doc_id", "n_tokens", 512, n_buckets=2)
        got = {r["doc_id"]: r["pack_id"] for r in out.collect()}
        assert got[2] is None and got[3] is None and got[4] is None
        assert got[1] is not None and got[5] is not None
        assert out.count() == 5  # pass-through, not dropped

    def test_keys_mode_packs_within_groups(self, spark):
        rows = [("en" if i % 2 else "de", i, 700) for i in range(40)]
        df = spark.createDataFrame(rows, "lang string, doc_id long, "
                                         "n_tokens long")
        out = pack_sequences(df, "doc_id", "n_tokens", 2100, keys="lang")
        for r in out.collect():
            assert r["pack_id"].startswith('{"lang":')
        # 20 docs × 700 tokens per lang → ceil(14000/2100) = 7 slots
        slots = {(r["__pack_bucket"], r["__pack_slot"])
                 for r in out.collect()}
        assert len(slots) == 14

    def test_keys_and_buckets_compose(self, spark):
        """A hot key group sub-buckets when n_buckets is also given —
        the window partitions by (key, sub-bucket), never one key
        group through one task."""
        rows = [("en", i, 500) for i in range(300)]
        rows += [("de", 10_000 + i, 500) for i in range(10)]
        df = spark.createDataFrame(rows, "lang string, doc_id long, "
                                         "n_tokens long")
        out = pack_sequences(df, "doc_id", "n_tokens", 4096,
                             n_buckets=4, keys="lang")
        buckets = {r["__pack_bucket"] for r in out.collect()}
        en = {b for b in buckets if b.startswith('{"lang":"en"}')}
        assert len(en) == 4  # the hot group split across sub-buckets
        assert all("/" in b for b in buckets)
        # still deterministic under layout changes
        a = {(r["doc_id"], r["pack_id"]) for r in out.collect()}
        b = {(r["doc_id"], r["pack_id"]) for r in pack_sequences(
            df.repartition(5), "doc_id", "n_tokens", 4096,
            n_buckets=4, keys="lang").collect()}
        assert a == b

    def test_salted_layout_uncorrelated_with_uniform_sample(self, spark):
        """Module salt rule: pack layout order and uniform_sample at
        the SAME seed must not correlate — else the 'uniform' sample is
        exactly the pack-front docs (position-biased)."""
        from gr_tdigest_spark.operators.sample import uniform_sample

        df, _ = _docs(spark, n=500)
        out = pack_sequences(df, "doc_id", "n_tokens", 100_000_000,
                             n_buckets=1, seed=9)
        # one giant pack: layout order == priority order; take the 50
        # layout-first docs via the exposed start offsets
        sampled = {r["doc_id"]
                   for r in uniform_sample(df, 50, "doc_id", seed=9)
                   .collect()}
        probe = out.select("doc_id", "__pack_slot").collect()
        assert len(probe) == 500
        # overlap between the uniform sample and ANY fixed 50-doc set
        # is hypergeometric (mean 5, sd ~2.1); correlation would make
        # it ~50. Use the first-by-layout 50 via a second query:
        from gr_tdigest_spark.operators.pack import _PACK_ORDER_SALT
        from gr_tdigest_spark.operators.sample import sample_priority
        first50 = {r["doc_id"] for r in df.select(
            "doc_id",
            sample_priority(["doc_id"], 9 + _PACK_ORDER_SALT).alias("pr"),
        ).orderBy("pr").limit(50).collect()}
        assert len(sampled & first50) < 25

    def test_slot_division_exact_past_2pow53(self, spark):
        """Slot assignment is exact LONG division: with cumulative
        offsets past 2^53, floor(start / max_tokens) in doubles rounds
        the dividend first and shifts slot boundaries off-by-one
        (r5 advice).  3 docs of 2^53+1 tokens at max_tokens=3: the
        2nd doc starts at 2^53+1 (divisible by 3 → slot must be
        exactly (2^53+1)/3; the double path lands one slot lower)."""
        from gr_tdigest_spark.operators.pack import pack_sequences

        big = (1 << 53) + 1
        df = spark.createDataFrame(
            [(i, big) for i in range(3)], "doc_id long, n long"
        )
        out = pack_sequences(df, "doc_id", "n", 3, n_buckets=1, seed=0)
        slots = sorted(r["__pack_slot"] for r in out.collect())
        assert slots == [0, big // 3, (2 * big) // 3]

    def test_validation(self, spark):
        df, _ = _docs(spark, n=4)
        with pytest.raises(ValueError, match="n_buckets when keys"):
            pack_sequences(df, "doc_id", "n_tokens", 512)
        with pytest.raises(ValueError, match="max_tokens"):
            pack_sequences(df, "doc_id", "n_tokens", 0, n_buckets=2)
        with pytest.raises(ValueError, match="n_buckets must"):
            pack_sequences(df, "doc_id", "n_tokens", 512, n_buckets=0)

    def test_plan_windows_are_bucketed(self, spark):
        """Scale pin: the cumulative-sum window partitions by the hash
        bucket (an Exchange on __pack_bucket), never an empty
        partition spec (= whole table through one task)."""
        df, _ = _docs(spark)
        out = pack_sequences(df, "doc_id", "n_tokens", 4096, n_buckets=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Window" in plan
        assert "__pack_bucket" in plan.split("Window", 1)[1][:400]
        # an empty partitionBy would show 'SinglePartition' for the
        # window exchange
        assert "SinglePartition" not in plan


class TestNextFitPacking:
    """method='nextfit': no-split packing — every pack total ≤
    max_tokens exactly; oversize docs get NULL packs."""

    def test_exact_greedy_replay_and_layout_independence(self, spark):
        from gr_tdigest_spark.operators.pack import (
            _PACK_ORDER_SALT, _PACK_SALT,
        )
        from gr_tdigest_spark.operators.sample import sample_priority

        df, _ = _docs(spark, n=350, seed=21)
        out = pack_sequences(df, "doc_id", "n_tokens", 2048, n_buckets=4,
                             seed=6, method="nextfit")
        got = {r["doc_id"]: (r["__pack_bucket"], r["__pack_slot"])
               for r in out.collect()}

        probe = df.select(
            "doc_id", "n_tokens",
            F.pmod(sample_priority(["doc_id"], 6 + _PACK_SALT),
                   F.lit(4)).cast("string").alias("b"),
            sample_priority(["doc_id"], 6 + _PACK_ORDER_SALT).alias("pr"),
        ).collect()
        byb = {}
        for r in probe:
            byb.setdefault(r["b"], []).append(
                (r["pr"], r["doc_id"], r["n_tokens"])
            )
        expect = {}
        for b, rows in byb.items():
            slot, used = 0, 0
            for _, did, n in sorted(rows):
                if used + n > 2048 and used > 0:
                    slot, used = slot + 1, 0
                expect[did] = (b, slot)
                used += n
        assert got == expect

        for parts in (1, 5):
            g2 = {r["doc_id"]: (r["__pack_bucket"], r["__pack_slot"])
                  for r in pack_sequences(
                      df.repartition(parts), "doc_id", "n_tokens", 2048,
                      n_buckets=4, seed=6, method="nextfit").collect()}
            assert g2 == got, parts

    def test_no_split_bound_and_oversize_null(self, spark):
        rows = [(i, 700) for i in range(60)]
        rows += [(900, 5000), (901, None), (902, -1)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        out = pack_sequences(df, "doc_id", "n_tokens", 2048, n_buckets=2,
                             method="nextfit")
        data = out.collect()
        assert {r["doc_id"] for r in data if r["pack_id"] is None} \
            == {900, 901, 902}
        packs = {}
        for r in data:
            if r["pack_id"] is not None:
                packs.setdefault(r["pack_id"], 0)
                packs[r["pack_id"]] += r["n_tokens"]
        # STRICT bound (the offset method only bounds by max + doc)
        assert all(t <= 2048 for t in packs.values())
        # 700-token docs → 2 per pack (1400; a third would hit 2100)
        assert all(t <= 1400 for t in packs.values())

    def test_method_validation(self, spark):
        df, _ = _docs(spark, n=3)
        with pytest.raises(ValueError, match="offset/nextfit"):
            pack_sequences(df, "doc_id", "n_tokens", 512, n_buckets=2,
                           method="ffd")

    def test_nextfit_requires_buckets_even_with_keys(self, spark):
        """The pandas pass materializes a bucket in one worker, so a
        keys-only nextfit (hot key group = one unbounded frame) is
        refused by construction; keys + n_buckets compose fine."""
        df = spark.createDataFrame(
            [("en", 1, 100), ("de", 2, 100)],
            "lang string, doc_id long, n_tokens long",
        )
        with pytest.raises(ValueError, match="nextfit.*n_buckets"):
            pack_sequences(df, "doc_id", "n_tokens", 512, keys="lang",
                           method="nextfit")
        out = pack_sequences(df, "doc_id", "n_tokens", 512, keys="lang",
                             n_buckets=2, method="nextfit")
        assert out.where(F.col("pack_id").isNotNull()).count() == 2

    def test_nextfit_ships_skinny_rows_through_python(self, spark):
        """The no-split pass must not round-trip payload columns
        (document text) through Arrow: the applyInPandas subtree of
        the plan reads only the skinny projection."""
        df = spark.createDataFrame(
            [(i, 100, "x" * 50) for i in range(20)],
            "doc_id long, n_tokens long, text string",
        )
        out = pack_sequences(df, "doc_id", "n_tokens", 512, n_buckets=2,
                             method="nextfit")
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        # the pandas function's argument list is the exact set of
        # columns crossing Arrow — payload columns must not be in it
        # (the LogicalRDD leaf still LISTS text; an RDD-backed leaf
        # cannot prune its schema line, but only pack_one's args ship)
        assert "FlatMapGroupsInPandas" in plan
        args = plan.split("pack_one(", 1)[1].split(")", 1)[0]
        assert "text" not in args
        assert "doc_id" in args and "__pack_cnt" in args
        # and the result still carries text for every row
        assert out.where(F.col("text").isNotNull()).count() == 20


class TestPackIdAndDupEdges:
    """r5 final-review pins: NULL ids are unpackable on BOTH methods
    (their layout position is partition-dependent by construction and
    the nextfit join-back can't address them), and duplicate ids on
    the nextfit path co-assign without row fan-out."""

    def test_null_ids_unpackable_both_methods(self, spark):
        rows = [(1, 100), (2, 100), (None, 100)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        for method in ("offset", "nextfit"):
            out = pack_sequences(df, "doc_id", "n_tokens", 512,
                                 n_buckets=1, method=method)
            got = {r["doc_id"]: r["pack_id"] for r in out.collect()}
            assert out.count() == 3, method          # pass-through
            assert got[None] is None, method         # never packed
            assert got[1] is not None and got[2] is not None, method
        # and the NULL row consumes NO budget on nextfit: two 300-token
        # docs + a NULL-id 300 still fit one 650-token pack
        df2 = spark.createDataFrame(
            [(1, 300), (2, 300), (None, 300)], "doc_id long, n_tokens long"
        )
        out2 = pack_sequences(df2, "doc_id", "n_tokens", 650,
                              n_buckets=1, method="nextfit")
        packs = {r["doc_id"]: r["pack_id"] for r in out2.collect()}
        assert packs[1] == packs[2] and packs[1] is not None
        assert packs[None] is None

    def test_duplicate_ids_coassign_without_fanout(self, spark):
        df = spark.createDataFrame(
            [(1, 100), (1, 100), (2, 100)], "doc_id long, n_tokens long"
        )
        out = pack_sequences(df, "doc_id", "n_tokens", 512, n_buckets=1,
                             method="nextfit")
        rows = out.collect()
        assert len(rows) == 3                       # no n² explosion
        per = {}
        for r in rows:
            per.setdefault(r["doc_id"], set()).add(r["pack_id"])
        assert len(per[1]) == 1                     # co-assigned
        assert None not in per[1]
