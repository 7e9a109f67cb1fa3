"""Corpus-level line dedup (C4 keep-first / drop-frequent): exact
replica oracle, NULL handling, plan shape, determinism."""

import pytest

from pyspark.sql import functions as F

from gr_tdigest_spark.operators.dedup import dedup_lines


def ref_dedup_lines(rows, mode, max_count=None):
    """Driver-side replica: rows = [(id, text)]; returns
    {id: (new_text_or_None, kept, removed)}."""
    # blank = empty after stripping SPACES (the operator uses SQL
    # trim(), which strips ' ' only — a tab-only line is content)
    occs = []  # (line, id, idx)
    for i, t in rows:
        if i is None or t is None:
            continue
        for idx, ln in enumerate(t.split("\n")):
            if ln.strip(" ") != "":
                occs.append((ln, i, idx))
    dropped = set()
    if mode == "keep_first":
        first = {}
        for ln, i, idx in sorted(occs, key=lambda o: (o[1], o[2])):
            if ln in first:
                dropped.add((i, idx))
            else:
                first[ln] = (i, idx)
    else:
        from collections import Counter

        freq = Counter(ln for ln, _, _ in occs)
        dropped = {(i, idx) for ln, i, idx in occs
                   if freq[ln] > max_count}
    out = {}
    for i, t in rows:
        if i is None:
            continue
        if t is None:
            out[i] = (None, 0, 0)
            continue
        keep, n_rm = [], 0
        for idx, ln in enumerate(t.split("\n")):
            if ln.strip(" ") == "":
                continue
            if (i, idx) in dropped:
                n_rm += 1
            else:
                keep.append(ln)
        out[i] = ("\n".join(keep) if keep else None, len(keep), n_rm)
    return out


ROWS = [
    (1, "alpha line\nshared boiler\nunique one"),
    (2, "shared boiler\nbeta line\n\nshared boiler"),
    (3, "unique two\n   \nshared boiler"),
    (4, "alpha line"),          # dup of doc 1's first line
    (5, None),                   # NULL text
    (6, "\n\n  \n"),             # only blank lines
    (None, "shared boiler"),     # NULL id: passthrough, not analyzed
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "text"])


def collect_map(out):
    return {
        r["doc_id"]: (r["text"], r["n_lines_kept"], r["n_lines_removed"])
        for r in out.collect() if r["doc_id"] is not None
    }


class TestKeepFirst:
    def test_matches_replica(self, df):
        got = collect_map(dedup_lines(df, "doc_id"))
        exp = ref_dedup_lines(ROWS, "keep_first")
        assert got == exp

    def test_null_id_passthrough(self, df):
        rows = [r for r in dedup_lines(df, "doc_id").collect()
                if r["doc_id"] is None]
        assert len(rows) == 1
        assert rows[0]["text"] == "shared boiler"  # untouched
        assert rows[0]["n_lines_kept"] is None
        # and its line did NOT claim the first-occurrence slot: doc 1
        # (the smallest analyzed id holding 'shared boiler') keeps it
        got = collect_map(dedup_lines(df, "doc_id"))
        assert "shared boiler" in got[1][0]

    def test_determinism_under_repartition(self, df):
        a = collect_map(dedup_lines(df, "doc_id"))
        b = collect_map(dedup_lines(df.repartition(5), "doc_id"))
        assert a == b

    def test_no_window_skew_free_join(self, df):
        out = dedup_lines(df, "doc_id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan

    def test_single_content_pass(self, df):
        """keep_first shuffles the exploded content once by the unique
        composite; the winner election reuses that exchange instead of
        re-scanning/re-exploding the corpus (r7)."""
        out = dedup_lines(df, "doc_id").agg(F.sum("n_lines_kept"))
        out.collect()  # AQE: reuse only visible in the final plan
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "ReusedExchange" in plan

    def test_row_count_preserved(self, df):
        assert dedup_lines(df, "doc_id").count() == len(ROWS)


class TestDropFrequent:
    def test_matches_replica(self, df):
        # 'shared boiler' occurs 4x in analyzed docs (> 3) -> dropped
        # everywhere incl. the first occurrence; 'alpha line' (2x) stays
        got = collect_map(dedup_lines(df, "doc_id",
                                      mode="drop_frequent", max_count=3))
        exp = ref_dedup_lines(ROWS, "drop_frequent", max_count=3)
        assert got == exp
        assert "shared boiler" not in (got[1][0] or "")
        assert got[4][0] == "alpha line"

    def test_threshold_boundary(self, df):
        # max_count=4: frequency 4 is NOT > 4 -> nothing dropped
        got = collect_map(dedup_lines(df, "doc_id",
                                      mode="drop_frequent", max_count=4))
        exp = ref_dedup_lines(ROWS, "drop_frequent", max_count=4)
        assert got == exp
        assert all(v[2] == 0 for v in got.values())

    def test_broadcast_in_plan(self, df):
        out = dedup_lines(df, "doc_id", mode="drop_frequent",
                          max_count=3)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_validation(self, df):
        with pytest.raises(ValueError, match="mode"):
            dedup_lines(df, "doc_id", mode="nope")
        with pytest.raises(ValueError, match="max_count"):
            dedup_lines(df, "doc_id", mode="drop_frequent")
        with pytest.raises(ValueError, match="max_count"):
            dedup_lines(df, "doc_id", mode="keep_first", max_count=2)


class TestContracts:
    def test_schema(self, df):
        out = dedup_lines(df.withColumn("extra", F.lit(1)), "doc_id")
        assert set(out.columns) == {
            "doc_id", "text", "extra", "n_lines_kept", "n_lines_removed"
        }

    def test_line_order_and_text_preserved(self, spark):
        # surviving lines keep original (untrimmed) text and order
        df = spark.createDataFrame(
            [(1, "  padded line\nzzz\n  padded line")], ["doc_id", "text"]
        )
        out = dedup_lines(df, "doc_id").first()
        assert out["text"] == "  padded line\nzzz"

    def test_string_ids_order(self, spark):
        # keep_first order follows the id type's own ordering
        df = spark.createDataFrame(
            [("b", "dup"), ("a", "dup")], ["doc_id", "text"]
        )
        got = {r["doc_id"]: r["text"]
               for r in dedup_lines(df, "doc_id").collect()}
        assert got["a"] == "dup" and got["b"] is None


def test_dedup_exact_keeps_null_text_rows(spark):
    """NULL-text rows have no content identity: dedup_exact passes
    them ALL through (regression: the NULL fingerprint used to fail
    the survivor join and such rows vanished)."""
    from gr_tdigest_spark.operators.dedup import dedup_exact

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "x y"), (4, "x y")],
        ["doc_id", "text"],
    )
    got = sorted(r["doc_id"] for r in dedup_exact(df, "doc_id").collect())
    assert got == [1, 2, 3]
