"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator from
SURVEY.md §2 (+ training-data extras); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for the exact-answer subset.

Exactness strategy for the sketch queries: with ``max_size`` above the
group's distinct-value count and ``policy='off'``, the t-digest is
uncompressed (reference compressor.rs:185-205 fast path) and its
quantile at non-integer q·N equals the order statistic
``x[floor(q·N)]`` — i.e. SQL ``quantile_disc`` — while CDF equals the
midpoint ECDF ``(#<x + 0.5·#=x)/N`` (tdigest_design.md:284-295). The q
constants below are chosen so q·N is never an integer at test scales.
Sketches whose estimates have no exact SQL form (HLL) are exposed as
bound-checks (the Spark side emits whether |est−exact| is inside the
published bound; the oracle emits the expected booleans).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

# q constants with no integer q·N at our group sizes (denominators are
# coprime with any n below 100k)
Q1 = 0.314159
QA, QB, QC = 0.251379, 0.507211, 0.971317
QW = 0.405170

# The exact-oracle trick: an UNCOMPRESSED digest (no clustering) makes
# quantile/cdf answers EXACT order statistics, so DuckDB SQL can oracle
# them hash-exactly. Valid only while every group stays under capacity
# (N < 0.99·1.44·max_size, distinct ≤ max_size) — true at the driver's
# sf0.01 gate. At sf0.1+ the td_* queries built on this constant
# compress and answer approximately (relative diffs ~1e-5 observed);
# that is the sketch WORKING as designed, not a correctness bug — the
# bound-boolean queries (hll_*, minhash_*, cms_join_size, kll_*) are
# the scale-robust formulation and stay green at every SF.
UNCOMPRESSED = dict(max_size=20000, policy="off")


def _li(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------- #
# t-digest queries
# --------------------------------------------------------------------- #

def q_td_quantile_group(spark, sf_dir):
    from gr_tdigest_spark.operators import tdigest_agg
    import gr_tdigest_spark.functions as Fn

    dg = tdigest_agg(
        _li(spark, sf_dir), ["l_returnflag", "l_linestatus"],
        "l_extendedprice", **UNCOMPRESSED,
    )
    return dg.select(
        "l_returnflag", "l_linestatus",
        Fn.tdigest_quantile("tdigest", Q1).alias("q_price"),
    )


def q_td_quantiles_multi(spark, sf_dir):
    from gr_tdigest_spark.operators import tdigest_agg
    import gr_tdigest_spark.functions as Fn

    dg = tdigest_agg(
        _li(spark, sf_dir), ["l_returnflag", "l_linestatus"],
        "l_extendedprice", **UNCOMPRESSED,
    )
    qs = Fn.tdigest_quantiles("tdigest", [QA, QB, QC])
    return dg.select(
        "l_returnflag", "l_linestatus",
        qs.getItem(0).alias("p25"),
        qs.getItem(1).alias("p50"),
        qs.getItem(2).alias("p97"),
    )


def q_td_cdf_probe(spark, sf_dir):
    from gr_tdigest_spark.operators import tdigest_agg
    import gr_tdigest_spark.functions as Fn

    dg = tdigest_agg(
        _li(spark, sf_dir), ["l_returnflag", "l_linestatus"],
        "l_extendedprice", **UNCOMPRESSED,
    )
    return dg.select(
        "l_returnflag", "l_linestatus",
        Fn.tdigest_cdf("tdigest", 30000.0).alias("cdf_30k"),
        Fn.tdigest_cdf("tdigest", 90000.0).alias("cdf_90k"),
    )


def q_td_stats(spark, sf_dir):
    from gr_tdigest_spark.operators import tdigest_agg
    import gr_tdigest_spark.functions as Fn

    # max_size=1000 → compression active; stats stay exact
    dg = tdigest_agg(
        _li(spark, sf_dir), ["l_returnflag", "l_linestatus"],
        "l_extendedprice", max_size=1000,
    )
    return dg.select(
        "l_returnflag", "l_linestatus",
        Fn.tdigest_count("tdigest").alias("n"),
        Fn.tdigest_min("tdigest").alias("min_price"),
        Fn.tdigest_max("tdigest").alias("max_price"),
        F.round(Fn.tdigest_sum("tdigest"), 2).alias("sum_price"),
        F.round(Fn.tdigest_mean("tdigest"), 4).alias("avg_price"),
    )


def q_td_median(spark, sf_dir):
    from gr_tdigest_spark.operators import tdigest_agg
    import gr_tdigest_spark.functions as Fn

    dg = tdigest_agg(
        _li(spark, sf_dir), ["l_returnflag", "l_linestatus"],
        "l_extendedprice", **UNCOMPRESSED,
    )
    return dg.select(
        "l_returnflag", "l_linestatus",
        Fn.tdigest_median("tdigest").alias("median_price"),
    )


def q_td_pileagg(spark, sf_dir):
    """The JVM pile pre-aggregation plan (groupBy(keys, value) piles →
    weighted digest build; only distinct values cross Arrow) must
    produce the same digests as the row path — same quantile oracle as
    td_quantile_group, built through the scale path."""
    from gr_tdigest_spark.operators import tdigest_agg
    import gr_tdigest_spark.functions as Fn

    dg = tdigest_agg(
        _li(spark, sf_dir), ["l_returnflag", "l_linestatus"],
        "l_extendedprice", pre_aggregate=True, **UNCOMPRESSED,
    )
    return dg.select(
        "l_returnflag", "l_linestatus",
        Fn.tdigest_quantile("tdigest", Q1).alias("q_price"),
    )


def q_td_summary(spark, sf_dir):
    """Contract for the one-line summary render (polars_expr.rs:420-443
    analogue): a deterministic 101-value integer-valued dataset (odd N,
    all values distinct → uncompressed digest keeps every atomic, p50
    at non-integer q·N equals quantile_disc, %g prints integers
    exactly) lets DuckDB assemble the identical string."""
    from gr_tdigest_spark.operators import tdigest_agg
    import gr_tdigest_spark.functions as Fn

    df = spark.range(1, 102).select(
        ((F.col("id") * F.col("id")) % 9973).cast("double").alias("x")
    )
    dg = tdigest_agg(df, None, "x", **UNCOMPRESSED)
    return dg.select(Fn.tdigest_summary("tdigest").alias("summary"))


def q_td_trimmed_mean(spark, sf_dir):
    from gr_tdigest_spark.operators import tdigest_agg
    import gr_tdigest_spark.functions as Fn

    dg = tdigest_agg(
        _li(spark, sf_dir), ["l_returnflag", "l_linestatus"],
        "l_extendedprice", **UNCOMPRESSED,
    )
    return dg.select(
        "l_returnflag", "l_linestatus",
        F.round(
            Fn.tdigest_trimmed_mean("tdigest", 0.25, 0.75), 6
        ).alias("tmean_price"),
    )


def q_td_merge_rollup(spark, sf_dir):
    """Second-level rollup: (flag, status) digests → per-flag digests via
    merge_tdigests — the re-aggregate path (SURVEY §2.1)."""
    from gr_tdigest_spark.operators import tdigest_agg
    import gr_tdigest_spark.functions as Fn

    fine = tdigest_agg(
        _li(spark, sf_dir), ["l_returnflag", "l_linestatus"],
        "l_quantity", **UNCOMPRESSED,
    )
    coarse = fine.groupBy("l_returnflag").agg(
        Fn.merge_tdigests("tdigest").alias("tdigest")
    )
    return coarse.select(
        "l_returnflag",
        Fn.tdigest_quantile("tdigest", Q1).alias("q_qty"),
        Fn.tdigest_count("tdigest").alias("n"),
    )


def q_td_weighted(spark, sf_dir):
    from gr_tdigest_spark.operators import tdigest_agg
    import gr_tdigest_spark.functions as Fn

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    dg = tdigest_agg(
        part, ["p_brand"], "p_retailprice", weight_col="p_size",
        **UNCOMPRESSED,
    )
    return dg.select(
        "p_brand",
        Fn.tdigest_quantile("tdigest", QW).alias("q_wprice"),
        Fn.tdigest_count("tdigest").alias("total_w"),
    )


def q_td_scale(spark, sf_dir):
    """scale_values AND scale_weights off one base digest (sketches/
    tdigest.py:960/974) — one contract query covers both transforms so
    the driver's 50-query budget holds all operators."""
    from gr_tdigest_spark.operators import tdigest_agg
    import gr_tdigest_spark.functions as Fn

    dg = tdigest_agg(
        _li(spark, sf_dir), ["l_returnflag"], "l_quantity", **UNCOMPRESSED
    )
    scaled = dg.select(
        "l_returnflag",
        Fn.tdigest_scale_values("tdigest", 4.0).alias("td_v"),
        Fn.tdigest_scale_weights("tdigest", 2.0).alias("td_w"),
    )
    return scaled.select(
        "l_returnflag",
        Fn.tdigest_quantile("td_v", Q1).alias("q_qty4"),
        Fn.tdigest_max("td_v").alias("max_qty4"),
        Fn.tdigest_quantile("td_w", Q1).alias("q_qty"),
        Fn.tdigest_count("td_w").alias("n2"),
    )


def q_td_wire(spark, sf_dir):
    """Wire v2 downgrade AND f32 precision aggregation off the same
    fact table — one contract query covers both wire surfaces (the
    driver's 50-query budget; quantities are small integers, so the f32
    quantile equals the f64 one exactly)."""
    from gr_tdigest_spark.operators import tdigest_agg
    import gr_tdigest_spark.functions as Fn

    li = _li(spark, sf_dir)
    dg = tdigest_agg(li, ["l_returnflag"], "l_quantity", **UNCOMPRESSED)
    v2 = dg.select(
        "l_returnflag", Fn.tdigest_to_version("tdigest", 2).alias("tdigest")
    ).select(
        "l_returnflag",
        Fn.tdigest_quantile("tdigest", Q1).alias("q_qty"),
        Fn.tdigest_wire_precision("tdigest").alias("prec"),
    )
    f32 = tdigest_agg(
        li, ["l_returnflag"], "l_quantity", precision="f32", **UNCOMPRESSED
    ).select(
        "l_returnflag",
        Fn.tdigest_quantile("tdigest", Q1).alias("q_qty32"),
        Fn.tdigest_wire_precision("tdigest").alias("prec32"),
    )
    return v2.join(f32, "l_returnflag")


def q_td_add(spark, sf_dir):
    """Incremental add (tdigest.rs:626-639) AND add_weighted_many
    (frontends.rs:385-402), composed: digests built on early shipdates
    + added late rows == digests over everything; then integer-weighted
    correction rows == the expanded union (oracle expands weights via
    unnest(range(w))).  One query covers both table-level add ops."""
    from gr_tdigest_spark.operators import tdigest_agg
    from gr_tdigest_spark.operators.rollup import (
        add_values, add_weighted_values,
    )
    import gr_tdigest_spark.functions as Fn

    li = _li(spark, sf_dir)
    early = li.filter(F.col("l_shipdate") < "1997-01-01")
    late = li.filter(F.col("l_shipdate") >= "1997-01-01")
    base = tdigest_agg(early, ["l_returnflag"], "l_quantity", **UNCOMPRESSED)
    full = add_values(
        base, late, ["l_returnflag"], "l_quantity", **UNCOMPRESSED
    )
    new_rows = (
        li.select("l_returnflag").distinct()
        .crossJoin(spark.createDataFrame(
            [(3.5, 3.0), (97.5, 2.0)], "qv double, w double"
        ))
    )
    fullw = add_weighted_values(
        full, new_rows, ["l_returnflag"], "qv", "w", **UNCOMPRESSED
    )
    a = full.select(
        "l_returnflag",
        Fn.tdigest_quantile("tdigest", Q1).alias("q_qty"),
        Fn.tdigest_count("tdigest").alias("n"),
    )
    b = fullw.select(
        "l_returnflag",
        Fn.tdigest_quantile("tdigest", Q1).alias("q_qty_w"),
        Fn.tdigest_count("tdigest").alias("n_w"),
    )
    return a.join(b, "l_returnflag")


def q_td_infer_precision(spark, sf_dir):
    """infer_column_precision sniffs wire precision from blob headers
    (reference __init__.py:207-257); pinned-constant oracle — a broken
    sniffer mismatches."""
    from gr_tdigest_spark.operators import tdigest_agg
    import gr_tdigest_spark.functions as Fn

    li = _li(spark, sf_dir)
    dg64 = tdigest_agg(li, ["l_returnflag"], "l_quantity", max_size=100)
    dg32 = tdigest_agg(li, ["l_returnflag"], "l_quantity", max_size=100,
                       precision="f32")
    rows = [
        ("f64_col", Fn.infer_column_precision(dg64, "tdigest")),
        ("f32_col", Fn.infer_column_precision(dg32, "tdigest")),
    ]
    return spark.createDataFrame(rows, "name string, precision string")


def q_td_struct_roundtrip(spark, sf_dir):
    """Blob → struct → blob round-trip preserves queries (the struct form
    carries kind + config — SURVEY §1.3)."""
    from gr_tdigest_spark.operators import tdigest_agg
    import gr_tdigest_spark.functions as Fn

    dg = tdigest_agg(
        _li(spark, sf_dir), ["l_returnflag"], "l_quantity", **UNCOMPRESSED
    )
    rt = dg.select(
        "l_returnflag",
        Fn.tdigest_from_struct(
            Fn.tdigest_to_struct("tdigest")
        ).alias("tdigest"),
    )
    return rt.select(
        "l_returnflag",
        Fn.tdigest_quantile("tdigest", Q1).alias("q_qty"),
    )


def q_td_cdf_col(spark, sf_dir):
    """Per-row probe column: digest table ⋈ probe values (the reference's
    probe-broadcast pattern, polars_expr.rs:920-983)."""
    from gr_tdigest_spark.operators import tdigest_agg
    from gr_tdigest_spark.functions import tdigest_cdf_col

    li = _li(spark, sf_dir)
    dg = tdigest_agg(li, ["l_returnflag"], "l_quantity", **UNCOMPRESSED)
    probes = spark.range(5, 50, 10).select(
        F.col("id").cast("double").alias("x")
    )
    joined = dg.crossJoin(F.broadcast(probes))
    return joined.select(
        "l_returnflag", "x",
        tdigest_cdf_col(F.col("tdigest"), F.col("x")).alias("cdf_x"),
    )


def q_td_over_group(spark, sf_dir):
    """Per-row group quantile (the Polars `.over(g)` pattern, SURVEY
    §2.8): digest table broadcast-joined back onto rows."""
    from gr_tdigest_spark.operators.window import with_group_quantile

    li = _li(spark, sf_dir)
    out = with_group_quantile(
        li, ["l_returnflag", "l_linestatus"], "l_extendedprice", Q1,
        out_col="q_group", **UNCOMPRESSED,
    )
    return out.select("l_orderkey", "l_linenumber", "q_group")


def q_td_sql(spark, sf_dir):
    """SQL-string surface: registered UDFs over a digest temp view."""
    from gr_tdigest_spark.operators import tdigest_agg
    import gr_tdigest_spark.functions as Fn

    Fn.register_sql(spark)
    dg = tdigest_agg(
        _li(spark, sf_dir), ["l_returnflag"], "l_quantity", **UNCOMPRESSED
    )
    dg.createOrReplaceTempView("qdigests")
    return spark.sql(
        f"""
        SELECT l_returnflag,
               tdigest_quantile(tdigest, {Q1}) AS q_qty,
               tdigest_cdf(tdigest, 25.0) AS cdf_25,
               tdigest_count(tdigest) AS n
        FROM qdigests
        """
    )


def q_td_cube(spark, sf_dir):
    """Grouping sets over mergeable digests (SURVEY §2.7): Spark `cube`
    with merge_tdigests re-aggregates fine digests into every grouping
    set without rescanning raw data."""
    from gr_tdigest_spark.operators import tdigest_agg
    import gr_tdigest_spark.functions as Fn

    fine = tdigest_agg(
        _li(spark, sf_dir), ["l_returnflag", "l_linestatus"],
        "l_quantity", **UNCOMPRESSED,
    )
    cube = fine.cube("l_returnflag", "l_linestatus").agg(
        Fn.merge_tdigests("tdigest").alias("tdigest")
    )
    return cube.select(
        "l_returnflag", "l_linestatus",
        Fn.tdigest_quantile("tdigest", Q1).alias("q_qty"),
        Fn.tdigest_count("tdigest").alias("n"),
    )


def q_sketch_sql(spark, sf_dir):
    """Pure-SQL companion surface (register_companion_sql): fine
    per-(flag, status) HLLs roll up to per-flag estimates entirely in
    SQL — ``hll_estimate(hll_merge(hll)) GROUP BY`` — the sketch-table
    workflow a SQL-only user runs. Bound-boolean vs exact distinct."""
    from gr_tdigest_spark.operators.companions import (
        hll_agg, register_companion_sql,
    )

    register_companion_sql(spark)
    li = _li(spark, sf_dir)
    fine = hll_agg(li, ["l_returnflag", "l_linestatus"], "l_orderkey", p=14)
    fine.createOrReplaceTempView("fine_sketches")
    est = spark.sql(
        "SELECT l_returnflag, hll_estimate(hll_merge(hll)) AS est "
        "FROM fine_sketches GROUP BY l_returnflag"
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_distinct")
    )
    bound = 5 * (1.04 / (2 ** 14) ** 0.5)
    return (
        est.join(exact, "l_returnflag")
        .select(
            "l_returnflag", "exact_distinct",
            (
                F.abs(F.col("est") - F.col("exact_distinct"))
                <= F.greatest(
                    F.lit(bound) * F.col("exact_distinct"), F.lit(3.0)
                )
            ).alias("within_bound"),
        )
        .orderBy("l_returnflag")
    )


def q_hll_cube(spark, sf_dir):
    """Grouping sets over ANY mergeable sketch (generic
    `merge_sketches`): fine per-(flag, status) HLLs cube-merge into
    every grouping set without rescanning facts — the sketch-world
    OLAP subtotal. Estimates must sit within 5σ of 1.04/√m of the
    exact distinct count per grouping set."""
    from gr_tdigest_spark.operators.companions import (
        HLLSpec, hll_agg, hll_estimate, merge_sketches,
    )

    li = _li(spark, sf_dir)
    fine = hll_agg(li, ["l_returnflag", "l_linestatus"], "l_orderkey", p=14)
    cube = fine.cube("l_returnflag", "l_linestatus").agg(
        merge_sketches("hll", HLLSpec(p=14)).alias("hll")
    )
    est = cube.select(
        "l_returnflag", "l_linestatus", hll_estimate("hll").alias("est")
    )
    exact = li.cube("l_returnflag", "l_linestatus").agg(
        F.countDistinct("l_orderkey").alias("exact_distinct")
    )
    bound = 5 * (1.04 / (2 ** 14) ** 0.5)
    ex = exact.select(
        F.col("l_returnflag").alias("rf"),
        F.col("l_linestatus").alias("ls"),
        "exact_distinct",
    )
    return (
        # null-safe equality: cube subtotal rows carry NULL keys, which
        # plain join equality would silently drop
        est.join(
            ex,
            est["l_returnflag"].eqNullSafe(ex["rf"])
            & est["l_linestatus"].eqNullSafe(ex["ls"]),
            "inner",
        )
        .select(
            "l_returnflag", "l_linestatus", "exact_distinct",
            (
                F.abs(F.col("est") - F.col("exact_distinct"))
                <= F.greatest(
                    F.lit(bound) * F.col("exact_distinct"), F.lit(3.0)
                )
            ).alias("within_bound"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_sketch_rollup_consistency(spark, sf_dir):
    """Merge associativity of the companion sketches on Spark: per-group
    sketches merged == sketch built directly on everything (exact state
    equality for HLL/CMS/Bloom by construction)."""
    from gr_tdigest_spark.operators.companions import (
        bloom_agg, cms_agg, hll_agg,
    )
    from gr_tdigest_spark.sketches.bloom import BloomFilter
    from gr_tdigest_spark.sketches.cms import CMS
    from gr_tdigest_spark.sketches.hll import HLL
    import numpy as _np

    ev = _ev(spark, sf_dir)

    def merged_vs_direct(agg_fn, decode, col):
        per_group = agg_fn(ev, ["event_type"], col)
        blobs = [bytes(r[1]) for r in per_group.collect()]
        states = [decode(b) for b in blobs]
        m = states[0]
        for s in states[1:]:
            m = m.merge(s)
        direct = decode(bytes(agg_fn(ev, None, col).collect()[0][0]))
        return m, direct

    h_m, h_d = merged_vs_direct(
        lambda df, k, c: hll_agg(df, k, c, p=12), HLL.from_bytes, "user_id"
    )
    c_m, c_d = merged_vs_direct(
        lambda df, k, c: cms_agg(df, k, c), CMS.from_bytes, "event_type"
    )
    b_m, b_d = merged_vs_direct(
        lambda df, k, c: bloom_agg(df, k, c, m_bits=1 << 16),
        BloomFilter.from_bytes, "user_id",
    )
    rows = [
        ("hll", bool(_np.array_equal(h_m.registers, h_d.registers))),
        ("cms", bool(_np.array_equal(c_m.table, c_d.table))),
        ("bloom", bool(_np.array_equal(b_m.words, b_d.words))),
    ]
    return spark.createDataFrame(rows, "sketch string, merged_equals_direct boolean")


# --------------------------------------------------------------------- #
# companion sketches
# --------------------------------------------------------------------- #

def q_hll_bound(spark, sf_dir):
    """HLL estimate must sit inside 5σ of 1.04/√m of the exact distinct
    count — the bound check is computed Spark-side; the oracle pins the
    expected booleans."""
    from gr_tdigest_spark.operators.companions import hll_agg, hll_estimate

    ev = _ev(spark, sf_dir)
    h = hll_agg(ev, ["event_type"], "user_id", p=14)
    est = h.select("event_type", hll_estimate("hll").alias("est"))
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact")
    )
    bound = 5 * (1.04 / (2 ** 14) ** 0.5)
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            (
                F.abs(F.col("est") - F.col("exact"))
                <= F.greatest(F.lit(bound) * F.col("exact"), F.lit(3.0))
            ).alias("within_bound"),
        )
    )


def q_hll_intersect(spark, sf_dir):
    """Inclusion–exclusion HLL intersection (SURVEY §2.8): for every
    event-type pair, the estimate must sit within the documented bound
    (3 estimates, each ±1.04/√m of its own cardinality — tolerance is
    3·5σ of the exact UNION, floor 3). At these cardinalities (≪ m)
    HLL is in its linear-counting regime, so the check is tight."""
    from gr_tdigest_spark.operators.companions import (
        hll_agg, hll_intersect_estimate,
    )

    ev = _ev(spark, sf_dir)
    h = hll_agg(ev, ["event_type"], "user_id", p=14)
    a = h.select(F.col("event_type").alias("et_a"), F.col("hll").alias("ha"))
    b = h.select(F.col("event_type").alias("et_b"), F.col("hll").alias("hb"))
    est = a.join(b, F.col("et_a") < F.col("et_b")).select(
        "et_a", "et_b", hll_intersect_estimate("ha", "hb").alias("est")
    )
    du = ev.select("event_type", "user_id").distinct()
    inter = (
        du.select(F.col("event_type").alias("et_a"), "user_id")
        .join(du.select(F.col("event_type").alias("et_b"), "user_id"),
              "user_id")
        .where(F.col("et_a") < F.col("et_b"))
        .groupBy("et_a", "et_b")
        .agg(F.countDistinct("user_id").alias("exact_inter"))
    )
    per_type = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    sigma = 1.04 / (2 ** 14) ** 0.5
    return (
        est.join(inter, ["et_a", "et_b"])
        .join(per_type.select(F.col("event_type").alias("et_a"),
                              F.col("n_users").alias("na")), "et_a")
        .join(per_type.select(F.col("event_type").alias("et_b"),
                              F.col("n_users").alias("nb")), "et_b")
        .select(
            "et_a", "et_b",
            (
                F.abs(F.col("est") - F.col("exact_inter"))
                <= F.greatest(
                    F.lit(3 * 5 * sigma)
                    * (F.col("na") + F.col("nb") - F.col("exact_inter")),
                    F.lit(3.0),
                )
            ).alias("within_bound"),
        )
    )


def q_minhash_jaccard(spark, sf_dir):
    """MinHash set-similarity between groups: per-l_returnflag signature
    over the l_orderkey SET, pairwise Jaccard from the 3-row sketch
    table only (the fact table is touched once, for the signatures).
    Exact inter/union counts pin the arithmetic; the estimate must sit
    within 5σ of Binomial(k, J)/k (floor 0.02 for the degenerate
    ends). k=512 → σ = sqrt(J(1−J)/512) ≤ 2.2%."""
    from gr_tdigest_spark.operators.companions import (
        minhash_agg, minhash_jaccard,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # persist the sketch-sized table: the pairwise self-join would
    # otherwise recompute the build (i.e. rescan the fact table) per side
    mh = _persist_replacing(
        minhash_agg(li, ["l_returnflag"], "l_orderkey", k=512),
        "minhash_jaccard",
    )
    a = mh.select(F.col("l_returnflag").alias("fa"),
                  F.col("minhash").alias("ma"))
    b = mh.select(F.col("l_returnflag").alias("fb"),
                  F.col("minhash").alias("mb"))
    est = a.join(b, F.col("fa") < F.col("fb")).select(
        "fa", "fb", minhash_jaccard("ma", "mb").alias("est")
    )
    ds = li.select("l_returnflag", "l_orderkey").distinct()
    da = ds.select(F.col("l_returnflag").alias("fa"),
                   F.col("l_orderkey").alias("ka"))
    db = ds.select(F.col("l_returnflag").alias("fb"),
                   F.col("l_orderkey").alias("kb"))
    inter = (
        da.join(db, (F.col("fa") < F.col("fb"))
                & (F.col("ka") == F.col("kb")))
        .groupBy("fa", "fb").agg(F.count("*").alias("exact_inter"))
    )
    sizes = ds.groupBy("l_returnflag").agg(
        F.count("*").alias("n_keys")
    )
    return (
        est.join(inter, ["fa", "fb"])
        .join(sizes.select(F.col("l_returnflag").alias("fa"),
                           F.col("n_keys").alias("na")), "fa")
        .join(sizes.select(F.col("l_returnflag").alias("fb"),
                           F.col("n_keys").alias("nb")), "fb")
        .withColumn(
            "exact_union",
            F.col("na") + F.col("nb") - F.col("exact_inter"),
        )
        .withColumn("j", F.col("exact_inter") / F.col("exact_union"))
        .select(
            "fa", "fb", "exact_inter", "exact_union",
            (
                F.abs(F.col("est") - F.col("j"))
                <= F.greatest(
                    F.lit(5.0)
                    * F.sqrt(F.col("j") * (1 - F.col("j")) / F.lit(512.0)),
                    F.lit(0.02),
                )
            ).alias("within_bound"),
        )
        .orderBy("fa", "fb")
    )


_MINHASH_TOOLS = ["tool_00", "tool_01", "tool_02", "tool_49"]

# bounded persist: query functions can't unpersist after their caller
# collects, so each slot evicts the PREVIOUS invocation's cache —
# repeated harness runs hold at most one cached copy per query
_PERSIST_SLOTS: dict[str, object] = {}


def _persist_replacing(df, slot: str):
    prev = _PERSIST_SLOTS.get(slot)
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:
            pass
    _PERSIST_SLOTS[slot] = df.persist()
    return _PERSIST_SLOTS[slot]


def q_minhash_tools(spark, sf_dir):
    """North-star tie-in: which tools serve the same CONVERSATIONS —
    per-tool MinHash signature over the conv_id set on the transcript
    table, pairwise Jaccard from the (4-row) sketch table. At 10^12
    turns the fact table is scanned once for signatures; the similarity
    matrix never touches it. Exact inter/union pin the arithmetic; the
    estimate must sit within 5σ of Binomial(k, J)/k (floor 0.02)."""
    from gr_tdigest_spark.operators.companions import (
        minhash_agg, minhash_jaccard,
    )

    t = _transcript_table(spark).where(F.col("tool").isin(_MINHASH_TOOLS))
    # persist: the pairwise self-join must not rebuild the signatures
    mh = _persist_replacing(
        minhash_agg(t, ["tool"], "conv_id", k=512, pre_aggregate=True),
        "minhash_tools",
    )
    a = mh.select(F.col("tool").alias("ta"), F.col("minhash").alias("ma"))
    b = mh.select(F.col("tool").alias("tb"), F.col("minhash").alias("mb"))
    est = a.join(b, F.col("ta") < F.col("tb")).select(
        "ta", "tb", minhash_jaccard("ma", "mb").alias("est")
    )
    ds = t.select("tool", "conv_id").distinct()
    da = ds.select(F.col("tool").alias("ta"), F.col("conv_id").alias("ka"))
    db = ds.select(F.col("tool").alias("tb"), F.col("conv_id").alias("kb"))
    inter = (
        da.join(db, (F.col("ta") < F.col("tb"))
                & (F.col("ka") == F.col("kb")))
        .groupBy("ta", "tb").agg(F.count("*").alias("exact_inter"))
    )
    sizes = ds.groupBy("tool").agg(F.count("*").alias("n_convs"))
    return (
        est.join(inter, ["ta", "tb"])
        .join(sizes.select(F.col("tool").alias("ta"),
                           F.col("n_convs").alias("na")), "ta")
        .join(sizes.select(F.col("tool").alias("tb"),
                           F.col("n_convs").alias("nb")), "tb")
        .withColumn(
            "exact_union",
            F.col("na") + F.col("nb") - F.col("exact_inter"),
        )
        .withColumn("j", F.col("exact_inter") / F.col("exact_union"))
        .select(
            "ta", "tb", "exact_inter", "exact_union",
            (
                F.abs(F.col("est") - F.col("j"))
                <= F.greatest(
                    F.lit(5.0)
                    * F.sqrt(F.col("j") * (1 - F.col("j")) / F.lit(512.0)),
                    F.lit(0.02),
                )
            ).alias("within_bound"),
        )
        .orderBy("ta", "tb")
    )


def q_cms_join_size(spark, sf_dir):
    """Join-size estimation from two independent sketches (CMS inner
    product): |orders ⋈ customer on custkey| costed WITHOUT shuffling
    either table — the 100 TB use is join planning from sketch blobs.
    Lower bound is deterministic (est ≥ exact: collisions only add);
    upper bound ε·N_a·N_b holds w.p. ≥ 1−e^−depth."""
    from gr_tdigest_spark.operators.companions import (
        cms_agg, cms_inner_product,
    )

    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cu = spark.read.parquet(f"{sf_dir}/customer.parquet")
    depth, width = 7, 1 << 16
    sa = cms_agg(od, None, "o_custkey", depth=depth, width=width)
    sb = cms_agg(cu, None, "c_custkey", depth=depth, width=width)
    # cms_agg names both out cols "cms"; disambiguate via rename
    sa2 = sa.select(F.col("cms").alias("cms_a"))
    sb2 = sb.select(F.col("cms").alias("cms_b"))
    est = sa2.crossJoin(sb2).select(
        cms_inner_product("cms_a", "cms_b").alias("est")
    )
    exact = od.join(
        cu, od["o_custkey"] == cu["c_custkey"]
    ).agg(F.count("*").alias("exact_join"))
    na = od.agg(F.count("o_custkey").alias("na"))
    nb = cu.agg(F.count("c_custkey").alias("nb"))
    eps = 2.718281828459045 / width
    return (
        est.crossJoin(exact).crossJoin(na).crossJoin(nb)
        .select(
            "exact_join",
            (F.col("est") >= F.col("exact_join")).alias("lower_ok"),
            (
                F.col("est")
                <= F.col("exact_join")
                + F.lit(eps) * F.col("na") * F.col("nb")
            ).alias("upper_ok"),
        )
    )


def q_cms_topk(spark, sf_dir):
    """Global heavy-hitter top-k — fully distributed (per-partition
    candidate tracking + broadcast CMS re-estimation), no driver-side
    candidate collection."""
    from gr_tdigest_spark.operators.companions import cms_topk

    return cms_topk(_ev(spark, sf_dir), None, "event_type", k=5,
                    width=1 << 16)


def q_hh_topk_tools(spark, sf_dir):
    """North-star 'heavy-hitter tools': per-role top-3 tools on the
    transcript table via the grouped distributed top-k (window rank over
    the candidate set, never the raw rows)."""
    from gr_tdigest_spark.operators.companions import cms_topk

    t = _transcript_table(spark)
    return cms_topk(t, ["role"], "tool", k=3, width=1 << 16)


def q_hh_topk_users(spark, sf_dir):
    """Grouped top-k under NEAR-UNIFORM counts — the adversarial case
    for candidate tracking: m is sized above the per-group cardinality
    (150 users) so the candidate set is complete; skewed data (the
    normal heavy-hitter case, q_hh_topk_tools) doesn't need that."""
    from gr_tdigest_spark.operators.companions import cms_topk

    ev = _ev(spark, sf_dir)
    return cms_topk(ev, ["event_type"], "user_id", k=3, m=512,
                    width=1 << 16)


def q_bloom_members(spark, sf_dir):
    from gr_tdigest_spark.operators.companions import bloom_agg, bloom_contains

    ev = _ev(spark, sf_dir)
    bl = bloom_agg(
        ev.filter(F.col("event_type") == "click"), None, "user_id",
        m_bits=1 << 20,
    )
    users = ev.select("user_id").distinct()
    probed = users.crossJoin(F.broadcast(bl)).select(
        "user_id", bloom_contains("bloom", "user_id").alias("m")
    )
    return probed.filter("m").agg(F.count("*").alias("n_members"))


def q_bloom_semi_filter(spark, sf_dir):
    """Ship-the-filter semi-join: Bloom of high-value order keys
    pre-filters lineitem without shuffling it. The filter is SIZED for
    the key count (optimal_bloom at FPR 1e-12), so the surviving count
    equals the exact semi-join at ANY scale factor — a fixed m_bits
    would start leaking false positives as the key set grows (observed:
    +10 rows at sf0.1 with a fixed 2^20). Sizing from a count of the
    small dimension side is the production pattern too."""
    from gr_tdigest_spark.operators.companions import (
        bloom_agg, bloom_filter_rows,
    )
    from gr_tdigest_spark.sketches.bloom import optimal_bloom

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    hot = orders.where(F.col("o_totalprice") > 400000.0)
    proto = optimal_bloom(max(hot.count(), 1), fpr=1e-12)
    bl = bloom_agg(hot, None, "o_orderkey",
                   m_bits=proto.m_bits, k=proto.k)
    li = _li(spark, sf_dir)
    kept = bloom_filter_rows(li, "l_orderkey", bl)
    return kept.agg(
        F.count("*").alias("n_rows"),
        F.sum("l_quantity").alias("tot_qty"),
    )


def q_kll_quantile_docs(spark, sf_dir):
    from gr_tdigest_spark.operators.companions import kll_agg, kll_quantile

    d = _docs(spark, sf_dir).withColumn(
        "len_chars", F.col("n_chars").cast("double")
    )
    k = kll_agg(d, ["source"], "len_chars", k=4096)
    return k.select(
        "source", kll_quantile("kll", 0.5).alias("med_chars")
    )


# --------------------------------------------------------------------- #
# training-data extras
# --------------------------------------------------------------------- #

def q_kll_rank_docs(spark, sf_dir):
    """KLL rank query (fraction ≤ x); exact below the compaction
    threshold, so the oracle is the exact empirical CDF — ratio of
    integer counts (tie-proof)."""
    from gr_tdigest_spark.operators.companions import kll_agg, kll_rank

    d = _docs(spark, sf_dir).withColumn(
        "len_chars", F.col("n_chars").cast("double")
    )
    k = kll_agg(d, ["source"], "len_chars", k=4096)
    return k.select(
        "source", F.round(kll_rank("kll", 1000.0), 6).alias("rank_1k")
    )


def q_dedup_exact(spark, sf_dir):
    """Exact dedup fingerprints + PII detection counts + benchmark
    decontamination (r6).

    The fixture corpus contains no PII, which would make the email
    columns a vacuous 0 == 0 — so the query APPENDS deterministic
    email-bearing rows built from doc_id (the media_stats synthesize-
    what-you-test pattern; the oracle constructs the identical rows in
    SQL).  redact_pii's email pattern is plain character classes, so
    Java regex and RE2 agree and the counts hash-match exactly; a
    broken redaction now shows up as n_email_after_redact != 0.

    Decontamination gate: docs with doc_id % 17 == 0 play the
    "benchmark"; contamination_scores (5-gram, exact join path) runs
    over the whole corpus and the aggregate pins total gram/hit counts
    plus the ≥0.35-contaminated doc count — the oracle rebuilds the
    identical n-gram sets with DuckDB list comprehensions (every gram
    is compared as a STRING, so there is no cross-engine hash to
    disagree on).  Every benchmark doc self-hits at 1.0 and each synth
    email row embeds its base doc's text, so the contaminated set is
    non-trivially larger than the benchmark itself."""
    from gr_tdigest_spark.operators.contamination import (
        contamination_scores,
    )
    from gr_tdigest_spark.operators.text import (
        PII_PATTERNS, redact_pii, with_fingerprint,
    )

    base = _docs(spark, sf_dir).select("doc_id", "text")
    synth = base.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(
            F.lit("contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com about "), F.col("text"),
        ).alias("text"),
    )
    d = with_fingerprint(base.unionByName(synth), "text", "fp")
    red = redact_pii(d, "text", out_col="red")
    benchmark = base.filter(F.col("doc_id") % 17 == 0)
    scored = contamination_scores(red, "doc_id", benchmark, n=5)
    # token-SPAN contamination gate (r6): tokens covered by the union
    # of matched 5-gram spans, summed corpus-wide.  The bloom filter
    # at fpr=1e-12 makes a false positive across the corpus's probed
    # grams ~1e-7-improbable AND deterministic, so the exact DuckDB
    # range-join replica hash-matches
    from gr_tdigest_spark.operators.contamination import (
        token_contamination,
    )

    scored = token_contamination(scored, benchmark, n=5,
                                 bloom_fpr=1e-12)
    # corpus-overlap gate (r6): two overlapping dumps carved from the
    # docs table by doc_id % 10 (A: 0-6, B: 5-9 → docs 5-6 shared);
    # unit='doc' with k=65536 keeps the KMV sketches below capacity at
    # every driver SF, so every returned figure is EXACT and the
    # oracle recomputes the identical set arithmetic on distinct texts
    from gr_tdigest_spark.operators.contamination import corpus_overlap

    ov = corpus_overlap(
        base.filter(F.col("doc_id") % 10 < 7),
        base.filter(F.col("doc_id") % 10 >= 5),
        unit="doc", k=65536,
    ).select(
        F.col("distinct_a").alias("ov_distinct_a"),
        F.col("distinct_b").alias("ov_distinct_b"),
        F.col("intersection_size").alias("ov_intersection"),
        F.col("jaccard").alias("ov_jaccard"),
    )
    return scored.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("fp").alias("n_unique"),
        F.sum(
            F.col("text").rlike(PII_PATTERNS["email"]).cast("long")
        ).alias("n_email_docs"),
        # after redaction no email pattern may survive
        F.sum(
            F.col("red").rlike(PII_PATTERNS["email"]).cast("long")
        ).alias("n_email_after_redact"),
        F.sum("n_grams").alias("tot_grams"),
        F.sum("n_hit").alias("tot_hits"),
        F.sum(
            (F.col("contamination") >= 0.35).cast("long")
        ).alias("n_contaminated"),
        F.sum("n_contaminated_tokens").alias("tot_contam_tokens"),
    ).crossJoin(ov)


def q_text_stats(spark, sf_dir):
    """Integer-only text statistics per language.

    Round-2 verdict: the rounded-double ratio (Spark HALF_UP BigDecimal
    vs DuckDB double rounding) and ``\\s``-class tokenization (Java
    ``\\s`` includes ``\\x0B``, RE2's does not) are cross-engine tie
    hazards. So: exact integer sums only, and tokens are counted as
    maximal runs of the explicit ASCII class ``[^ \\t\\n\\r\\f]+`` —
    identical semantics in Java regex and RE2, and immune to
    trailing-empty-split differences.
    """
    from gr_tdigest_spark.operators.text import BPE_TOKEN_PATTERN

    t = F.col("text")
    base = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    # the fixture docs are single-line, which would leave the
    # duplicate-line column a vacuous 0 == 0: append deterministic
    # multiline rows (text repeated over '\n') so the dup-line
    # expression is genuinely exercised (oracle builds the same rows)
    src = base.unionByName(
        base.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            "lang",
            F.concat(t, F.lit("\n"), t, F.lit("\n"), t).alias("text"),
        )
    )
    d = src.select(
        "lang",
        F.regexp_count(t, F.lit(r"[^ \t\n\r\f]+")).alias("n_tok"),
        F.length(t).alias("n_chars"),
        F.length(
            F.regexp_replace(t, r"[^.,;:!?'\"()\[\]-]", "")
        ).alias("n_punct"),
        # GPT-2-style pre-tokenizer piece count (text.py
        # BPE_TOKEN_PATTERN): Java regex and RE2 agree on both the
        # \p{L}/\p{N} classes and leftmost-first alternation, verified
        # exact across engines on this table
        F.regexp_count(t, F.lit(BPE_TOKEN_PATTERN)).alias("n_bpe"),
        # duplicate-line signal (repetition-filter family): nonempty
        # lines minus distinct nonempty lines — integer, so the
        # cross-engine hash is exact
        (
            F.size(F.filter(
                F.split(t, "\n"), lambda ln: F.trim(ln) != ""
            ))
            - F.size(F.array_distinct(F.filter(
                F.split(t, "\n"), lambda ln: F.trim(ln) != ""
            )))
        ).alias("n_dup_lines"),
    )
    agg = d.groupBy("lang").agg(
        F.sum("n_tok").alias("tot_tokens"),
        F.sum("n_chars").alias("tot_chars"),
        F.sum("n_punct").alias("tot_punct"),
        F.sum("n_bpe").alias("tot_bpe_tokens"),
        F.sum("n_dup_lines").alias("tot_dup_lines"),
    )
    # corpus-level line dedup gate (r6): keep_first removes every later
    # occurrence of a line across docs — here each synthesized
    # multiline row repeats a base doc's line 3x, so per lang exactly
    # 3 x (synth docs) lines are removed, and the winner election is a
    # genuinely global (doc_id, idx) min the oracle replicates with a
    # window.  Integer totals -> exact cross-engine hash.
    from gr_tdigest_spark.operators.dedup import dedup_lines

    ded = dedup_lines(src, "doc_id").groupBy("lang").agg(
        F.sum("n_lines_kept").alias("tot_lines_kept"),
        F.sum("n_lines_removed").alias("tot_lines_removed"),
    )
    return agg.join(F.broadcast(ded), on="lang", how="inner")


def q_quality_score(spark, sf_dir):
    """Pretraining-filter quality score: docs per score decile. The
    oracle replicates the exact expression tree (same op order → IEEE
    doubles are bit-identical across engines)."""
    from gr_tdigest_spark.operators.text import with_quality_score

    d = with_quality_score(_docs(spark, sf_dir), "text")
    return (
        d.groupBy(F.floor(F.col("quality_score") * 10).alias("decile"))
        .agg(F.count("*").alias("n_docs"))
    )


def q_media_stats(spark, sf_dir):
    """Multimodal contract: synthesize deterministic PPM (P6) images
    and WAV (PCM16) audio payloads from doc_id, REALLY decode them
    (operators/multimodal.py struct/numpy parsers — no codec libs), and
    report per-kind payload size stats plus a decoded-feature check.

    The decode check is analytic: images are top-half 0 / bottom-half
    200, so after 4×4 grid featurization feature[1] is exactly 0 and
    feature[48] is 1/sqrt(24); audio is half silence / half amplitude
    0.5, so RMS bin 9 is 1/sqrt(8).  A misparsed header geometry or
    sample offset moves the split and breaks the invariant — n_ok == n
    only when the real decoders work.  The oracle computes payload
    sizes and ok-counts in closed form from the same doc_id formulas.
    """
    import math
    import struct as _struct
    from gr_tdigest_spark.operators.multimodal import (
        decode_audio_features, decode_image_features, media_stats,
    )

    docs = _docs(spark, sf_dir).select("doc_id")

    def gen(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            ids, kinds, payloads = [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 2 == 0:
                    w = 4 * (did % 3 + 1)
                    h = 4 * (did % 2 + 1)
                    img = np.zeros((h, w, 3), dtype=np.uint8)
                    img[h // 2:, :, :] = 200
                    payload = (b"P6\n%d %d\n255\n" % (w, h)) + img.tobytes()
                    kind = "image"
                else:
                    n = 160 * (did % 4 + 1)
                    s = np.zeros(n, dtype="<i2")
                    s[n // 2:] = 16384  # 0.5 amplitude
                    data = s.tobytes()
                    payload = (
                        b"RIFF" + _struct.pack("<I", 36 + len(data))
                        + b"WAVE"
                        + b"fmt " + _struct.pack(
                            "<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
                        + b"data" + _struct.pack("<I", len(data)) + data
                    )
                    kind = "audio"
                ids.append(did)
                kinds.append(kind)
                payloads.append(payload)
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "payload": payloads}
            )

    # three consumers (stats + both decode passes) — persist so the
    # documents scan + payload synthesis run once, not three times
    media = _persist_replacing(
        docs.mapInPandas(
            gen, "media_id long, kind string, payload binary"
        ),
        "media_stats",
    )
    stats = media_stats(media).select(
        "kind",
        F.col("n").cast("long").alias("n"),
        F.col("total_bytes").cast("long").alias("total_bytes"),
    )
    c24 = 1.0 / math.sqrt(24.0)
    c8 = 1.0 / math.sqrt(8.0)
    img_ok = decode_image_features(
        media.filter(F.col("kind") == "image"), stub_mode="strict"
    ).select(
        F.lit("image").alias("kind"),
        (
            (F.abs(F.element_at("features", 1)) < 1e-5)
            & (F.abs(F.element_at("features", 48) - c24) < 1e-5)
        ).cast("long").alias("ok"),
    )
    aud_ok = decode_audio_features(
        media.filter(F.col("kind") == "audio"), stub_mode="strict"
    ).select(
        F.lit("audio").alias("kind"),
        (
            (F.abs(F.element_at("features", 1)) < 1e-6)
            & (F.abs(F.element_at("features", 9) - c8) < 1e-5)
        ).cast("long").alias("ok"),
    )
    oks = img_ok.unionByName(aud_ok).groupBy("kind").agg(
        F.sum("ok").alias("n_ok")
    )
    return stats.join(oks, "kind")


def q_sample_docs(spark, sf_dir):
    """Deterministic stratified sampling + KMV distinct via the
    bottom-k sketch (operators/sample.py, sketches/bottomk.py).

    Per source: the sketch-method stratified sample must contain
    exactly least(k, distinct doc_ids) distinct documents (the oracle
    computes that count exactly), and the KMV distinct estimate must
    sit within 5·(1/√(k−2)) of the exact distinct count (bound-boolean
    oracle pattern, like hll_bound)."""
    from gr_tdigest_spark.operators.companions import (
        bottomk_agg, bottomk_distinct,
    )
    from gr_tdigest_spark.operators.sample import stratified_sample

    d = _docs(spark, sf_dir)
    samp = stratified_sample(d, "source", 16, "doc_id", seed=11)
    n_samp = samp.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_sample")
    )
    k = 256
    est = bottomk_agg(d, ["source"], "doc_id", k=k).select(
        "source", bottomk_distinct("bottomk").alias("est")
    )
    exact = d.groupBy("source").agg(
        F.countDistinct("doc_id").alias("exact")
    )
    bound = 5.0 / (k - 2) ** 0.5
    kmv = est.join(exact, "source").select(
        "source",
        (
            F.abs(F.col("est") - F.col("exact"))
            <= F.greatest(F.lit(bound) * F.col("exact"), F.lit(2.0))
        ).alias("kmv_ok"),
    )

    # global sampling/split contracts, attached as constant booleans
    # (bound-boolean oracle pattern): uniform and weighted samples must
    # return exactly least(k, eligible rows); assign_split must cover
    # every row with every declared split non-empty
    from gr_tdigest_spark.operators.sample import (
        assign_split, uniform_sample, weighted_sample,
    )

    split_counts = {
        r["split"]: r["n"]
        for r in assign_split(
            d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1},
            seed=7,
        ).groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    n_total = sum(split_counts.values())  # assign covers every row
    n_uni = uniform_sample(d, 100, "doc_id", seed=7).count()
    weighted = d.withColumn(
        "w", (F.length("text") % 7 + 1).cast("double")
    )
    # expected size counts the operator's OWN eligibility rule (NULL /
    # NaN / non-positive weights are never sampled), so a future
    # fixture with NULL texts cannot false-fail the gate
    w = F.col("w")
    n_elig = weighted.filter(
        w.isNotNull() & ~F.isnan(w) & (w > 0.0)
    ).count()
    n_wtd = weighted_sample(weighted, 100, "doc_id", "w", seed=7).count()
    # keyed weighted sampling through the bounded-state sketch path
    # (operators/sample.py method='sketch'): per source, exactly
    # least(20, distinct eligible doc_ids) distinct documents
    kw_sizes = {
        r["source"]: r["n"]
        for r in weighted_sample(weighted, 20, "doc_id", "w", seed=7,
                                 keys="source")
        .groupBy("source").agg(F.countDistinct("doc_id").alias("n"))
        .collect()
    }
    kw_expect = {
        r["source"]: r["n"]
        for r in weighted.filter(
            w.isNotNull() & ~F.isnan(w) & (w > 0.0)
            & F.col("doc_id").isNotNull()
        ).groupBy("source").agg(F.countDistinct("doc_id").alias("n"))
        .collect()
    }
    # sequence packing (operators/pack.py): every positive-count doc
    # gets a pack; per-pack totals stay under max_tokens + that pack's
    # longest doc (offset-packing bound); slots are contiguous per
    # bucket — the full pytest property surface, driver-gated
    from gr_tdigest_spark.operators.pack import pack_sequences

    max_tok = 50_000
    packed = pack_sequences(d, "doc_id", "n_chars", max_tok,
                            n_buckets=8, seed=7)
    pk = packed.groupBy("__pack_bucket", "__pack_slot").agg(
        F.sum("n_chars").alias("tot"), F.max("n_chars").alias("big"),
        F.count("*").alias("n"),
    ).collect()
    n_packable = d.filter(
        F.col("n_chars").isNotNull() & (F.col("n_chars") > 0)
    ).count()
    slots_by_bucket = {}
    for r in pk:
        if r["__pack_slot"] is not None:
            slots_by_bucket.setdefault(r["__pack_bucket"], set()).add(
                r["__pack_slot"]
            )
    pack_ok = (
        sum(r["n"] for r in pk if r["__pack_slot"] is not None)
        == n_packable
        and all(r["tot"] < max_tok + r["big"] for r in pk
                if r["__pack_slot"] is not None)
        and all(s == set(range(max(s) + 1))
                for s in slots_by_bucket.values())
    )
    # nextfit (no-split) packing, driver-gated (r5 verdict task 1):
    # strict budget — every pack total ≤ max_tokens EXACTLY; docs
    # LONGER than max_tokens get a NULL pack (nf_max=400 sits inside
    # the fixture's n_chars range, so both branches are non-vacuous);
    # every other packable doc is covered; slots contiguous per bucket
    nf_max = 400
    nf = pack_sequences(d, "doc_id", "n_chars", nf_max, n_buckets=8,
                        seed=7, method="nextfit")
    nf_rows = nf.groupBy("__pack_bucket", "__pack_slot").agg(
        F.sum("n_chars").alias("tot"), F.count("*").alias("n"),
    ).collect()
    n_nf_packable = d.filter(
        F.col("n_chars").isNotNull() & (F.col("n_chars") > 0)
        & (F.col("n_chars") <= nf_max) & F.col("doc_id").isNotNull()
    ).count()
    n_oversize = d.filter(F.col("n_chars") > nf_max).count()
    n_oversize_packed = nf.filter(
        (F.col("n_chars") > nf_max) & F.col("__pack_slot").isNotNull()
    ).count()
    nf_slots = {}
    for r in nf_rows:
        if r["__pack_slot"] is not None:
            nf_slots.setdefault(r["__pack_bucket"], set()).add(
                r["__pack_slot"]
            )
    nextfit_ok = (
        sum(r["n"] for r in nf_rows if r["__pack_slot"] is not None)
        == n_nf_packable
        and all(r["tot"] <= nf_max for r in nf_rows
                if r["__pack_slot"] is not None)
        and n_oversize > 0          # the NULL-pack branch is exercised
        and n_oversize_packed == 0  # ... and every oversize doc is NULL
        and all(s == set(range(max(s) + 1)) for s in nf_slots.values())
    )
    ok = (
        n_uni == min(100, n_total)
        and n_wtd == min(100, n_elig)
        and all(split_counts.get(s, 0) > 0
                for s in ("train", "val", "test"))
        and set(kw_sizes) == set(kw_expect)
        and all(kw_sizes[s] == min(20, n) for s, n in kw_expect.items())
        and pack_ok
    )
    return n_samp.join(kmv, "source").withColumn(
        "sampling_ok", F.lit(bool(ok))
    ).withColumn("nextfit_ok", F.lit(bool(nextfit_ok)))


def q_embed_topk(spark, sf_dir):
    """Brute-force cosine top-k, cross-checked against the IVF index:
    at nprobe == n_lists the inverted file degrades to the exact
    answer (similarity.py ivf_index_topk contract), so joining the two
    results must reproduce every (vec_id, cosine) pair — the oracle
    sees TRUE booleans and a row-count mismatch if IVF ever diverges."""
    import os
    from gr_tdigest_spark.operators.similarity import (
        build_ivf_index, cosine_topk, ivf_index_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    rest = emb.filter(F.col("vec_id") != 0)
    top = cosine_topk(rest, qvec, k=5)

    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    path = f"/root/repo/.cache/ivfidx_{sf_tag}"
    n_lists = 4
    build_ivf_index(rest, path, n_lists=n_lists, n_iter=5, seed=29)
    ivf = ivf_index_topk(spark, path, qvec, k=5, nprobe=n_lists)

    # partition-pruning gate (similarity.py:237-243 claims query cost
    # scales with selectivity): a 1-list probe's index scan must carry a
    # NON-EMPTY PartitionFilters on list_id — i.e. Spark prunes the
    # unprobed list directories at planning time, it doesn't scan the
    # whole index and filter rows. Checked on the executed plan of the
    # actual pruned query, attached as a bound boolean the oracle
    # expects TRUE (hash-fails the day pruning stops happening).
    pruned = ivf_index_topk(spark, path, qvec, k=5, nprobe=1)
    pruned_plan = pruned._jdf.queryExecution().executedPlan().toString()
    after = pruned_plan.split("PartitionFilters: [", 1)
    pruning_ok = (
        len(after) == 2
        and not after[1].lstrip().startswith("]")
        and "list_id" in after[1][:300]
        and pruned.count() >= 1
    )

    # batched ANN cross-check (similarity.ivf_index_topk_batch): the
    # batch operator at full probe must reproduce the single-query
    # operator's (vec_id, cosine) pairs exactly for this query
    from gr_tdigest_spark.operators.similarity import ivf_index_topk_batch

    qdf = spark.createDataFrame(
        [(0, [float(x) for x in qvec])],
        "query_id long, query_vec array<double>",
    )
    batch_pairs = sorted(
        (r["vec_id"], round(r["cosine"], 9))
        for r in ivf_index_topk_batch(
            spark, path, qdf, k=5, nprobe=n_lists
        ).collect()
    )
    single_pairs = sorted(
        (r["vec_id"], round(r["cosine"], 9)) for r in ivf.collect()
    )
    batch_ok = batch_pairs == single_pairs and len(batch_pairs) == 5

    return (
        top.select("vec_id", F.round("cosine", 6).alias("cos_sim"))
        .join(
            ivf.select(
                "vec_id", F.round("cosine", 6).alias("__cos_ivf")
            ),
            "vec_id",
        )
        .select(
            "vec_id", "cos_sim",
            (F.col("cos_sim") == F.col("__cos_ivf")).alias("ivf_exact"),
        )
        .withColumn("pruned_scan_ok", F.lit(bool(pruning_ok)))
        .withColumn("batch_ok", F.lit(bool(batch_ok)))
    )


_EMB768_PATH = "/root/repo/.cache/embeddings768.parquet"
_PLANES768_PATH = "/root/repo/.cache/lsh_planes768.parquet"


def _write_pa(path, table):
    import os
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    pq.write_table(table, os.path.join(path, "part-00000.parquet"))
    open(os.path.join(path, "_SUCCESS"), "w").close()


def _ensure_emb768_fixture():
    """Seeded 400 × 768-dim float32 embedding fixture (clustered so
    buckets have genuine neighbors) + the LSH hyperplane matrix,
    materialized once (pyarrow — no SparkSession needed, so oracle_sql()
    can guarantee existence regardless of which side the driver runs
    first); both engines read identical values."""
    import os
    import numpy as np
    import pyarrow as pa
    from gr_tdigest_spark.operators.similarity import _hyperplanes

    if os.path.exists(os.path.join(_EMB768_PATH, "_SUCCESS")):
        return
    rng = np.random.default_rng(2024)
    n, dim = 400, 768
    base = rng.standard_normal((20, dim))
    M = (
        base[rng.integers(0, 20, n)]
        + 0.22 * rng.standard_normal((n, dim))
    ).astype(np.float32)
    _write_pa(_EMB768_PATH, pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(M), type=pa.list_(pa.float32())),
    }))
    planes = _hyperplanes(dim, 16, seed=23)
    _write_pa(_PLANES768_PATH, pa.table({
        "bit": pa.array((1 << np.arange(16)).astype(np.int64)),
        "vec": pa.array(list(planes.astype(np.float64)),
                        type=pa.list_(pa.float64())),
    }))


def _emb768_table(spark):
    _ensure_emb768_fixture()
    return spark.read.parquet(_EMB768_PATH)


def q_lsh_bucket_topk(spark, sf_dir):
    """LSH-bucketed ANN top-k at a REAL embedding dim (768): bucket ids
    come from one numpy matmul per Arrow batch (not 12k inlined plan
    literals). Oracle replicates buckets from the materialized plane
    matrix and takes exact cosine top-k within hamming ≤ 2 buckets —
    the same candidate set by construction."""
    import os

    from gr_tdigest_spark.operators.similarity import (
        ann_index_topk, ann_index_topk_batch, build_ann_index,
        lsh_bucket_topk,
    )

    emb = _emb768_table(spark)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    top = lsh_bucket_topk(
        emb.filter(F.col("vec_id") != 0), qvec, k=10,
        n_planes=16, seed=23, multiprobe=2,
    )
    # persisted-index batch gate (similarity.ann_index_topk_batch, the
    # hyperplane twin of the IVF batch operator): the batched operator
    # must reproduce the per-query operator's (vec_id, cosine) pairs
    # exactly on an index built from the same fixture
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    idx = f"/root/repo/.cache/annidx768_{sf_tag}"
    build_ann_index(
        emb.filter(F.col("vec_id") != 0), idx, n_planes=6, seed=23
    )
    qdf = spark.createDataFrame(
        [(0, [float(x) for x in qvec])],
        "query_id long, query_vec array<double>",
    )
    b = sorted(
        (r["vec_id"], round(r["cosine"], 9))
        for r in ann_index_topk_batch(
            spark, idx, qdf, k=10, multiprobe=1
        ).collect()
    )
    s = sorted(
        (r["vec_id"], round(r["cosine"], 9))
        for r in ann_index_topk(
            spark, idx, qvec, k=10, multiprobe=1
        ).collect()
    )
    lsh_batch_ok = b == s and len(b) == 10
    return top.select(
        "vec_id", F.round("cosine", 6).alias("cos_sim")
    ).withColumn("lsh_batch_ok", F.lit(bool(lsh_batch_ok)))


def q_embed_near_dups(spark, sf_dir):
    """Embedding near-duplicate pairs at dim=768 (matmul bucketing):
    same-bucket self-join + exact cosine ≥ threshold. Oracle replicates
    the bucketing from the materialized plane matrix — same candidate
    semantics (bucket equality) by construction."""
    from gr_tdigest_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    emb = _emb768_table(spark)
    pairs = embedding_near_dup_pairs(
        emb, threshold=0.9, n_planes=16, seed=23
    )
    return pairs.select("a", "b", F.round("cosine", 6).alias("cos_sim"))


def q_minhash_near_dups(spark, sf_dir):
    """MinHash LSH near-dup pairs. Oracle: exact character-5-gram
    Jaccard over all pairs — at this scale the 64-hash/16-band LSH
    recalls every pair above threshold, so the candidate-pruned result
    equals the exhaustive one (verified; banding is deterministic)."""
    from gr_tdigest_spark.operators.dedup import near_dup_pairs_minhash

    d = _docs(spark, sf_dir)
    return near_dup_pairs_minhash(
        d, "doc_id", "text", n_hashes=64, bands=16, threshold=0.5
    ).select("a", "b", F.round("jaccard", 6).alias("jaccard"))


def q_near_dup_clusters(spark, sf_dir):
    """Connected components over the MinHash near-dup pairs → canonical
    keeper per document (min id in component), PLUS the keep-best
    materialization step (r6): rep_id = the longest document in each
    cluster (ties → min id, cluster_representatives), and kept_ok
    asserts dedup_keep_best's corpus is exactly
    (unclustered ∪ representatives) — multiset-equal, both directions.
    Oracle: recursive-CTE reachability closure over the exact-Jaccard
    pair set + argmax-by-length representative election in SQL."""
    from gr_tdigest_spark.operators.dedup import (
        cluster_representatives, dedup_keep_best, near_dup_clusters,
        near_dup_pairs_minhash,
    )

    d = _docs(spark, sf_dir)
    pairs = near_dup_pairs_minhash(
        d, "doc_id", "text", n_hashes=64, bands=16, threshold=0.5,
    )
    clusters = near_dup_clusters(pairs)
    dl = d.withColumn("__len", F.length("text"))
    reps = cluster_representatives(dl, clusters, "doc_id", "__len")
    # keep-best contract (bound-boolean): the materialized corpus ids
    # must equal all-unclustered plus exactly the winner per cluster
    kept = dedup_keep_best(dl, clusters, "doc_id", "__len", reps=reps)
    expected = dl.join(
        clusters.select(F.col("id").alias("doc_id")), "doc_id",
        "left_anti",
    ).select("doc_id").unionByName(
        reps.select(F.col("rep_id").alias("doc_id"))
    )
    n_extra = kept.select("doc_id").exceptAll(expected).count()
    n_missing = expected.exceptAll(kept.select("doc_id")).count()
    kept_ok = n_extra == 0 and n_missing == 0
    return (
        clusters.join(reps, "cluster")
        .select("id", "cluster", "rep_id")
        .withColumn("kept_ok", F.lit(bool(kept_ok)))
    )


def q_simhash_near_dups(spark, sf_dir):
    """Simhash near-dup pairs. Oracle: full simhash replica in SQL —
    token hash is md5-derived (bit-identical across engines), votes and
    banding are deterministic, and the pigeonhole block join is
    recall-complete, so the bucketed Spark result equals the exhaustive
    all-pairs set the oracle computes."""
    from gr_tdigest_spark.operators.dedup import simhash_near_dups

    return simhash_near_dups(_docs(spark, sf_dir), "doc_id", "text",
                             max_hamming=8)


def q_lang_id(spark, sf_dir):
    """Stopword language-ID heuristic counts; oracle replicates the
    (score, lang)-max tie-break with zero-padded sort keys."""
    from gr_tdigest_spark.operators.text import with_language_id

    d = with_language_id(_docs(spark, sf_dir), "text")
    return d.groupBy("lang_id").agg(F.count("*").alias("n"))


_TRANSCRIPT_ORACLE_PATH = "/root/repo/.cache/transcripts_oracle.parquet"


def _ensure_transcript_fixture():
    """Materialize the seeded transcript table to a deterministic
    parquet path so DuckDB reads the IDENTICAL rows (same pattern the
    TPC-H tables get for free). pyarrow writer — no SparkSession needed,
    so oracle_sql() can guarantee existence regardless of which side
    the driver runs first. Timestamps are UTC-localized so Spark reads
    TIMESTAMP (unix_micros works) and DuckDB reads TIMESTAMPTZ
    (epoch_us works) with identical microsecond values."""
    import os
    import pyarrow as pa
    from gr_tdigest_spark.sources.transcripts import transcripts_pandas

    if os.path.exists(os.path.join(_TRANSCRIPT_ORACLE_PATH, "_SUCCESS")):
        return
    pdf = transcripts_pandas(n_convs=150, seed=42)
    pdf = pdf.assign(ts=pdf["ts"].dt.tz_localize("UTC"))
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    # Spark rejects TIMESTAMP(NANOS) parquet — store microseconds
    # (the generator works in µs, so the cast is lossless)
    ts_type = pa.timestamp("us", tz="UTC")
    idx = table.schema.get_field_index("ts")
    table = table.set_column(
        idx, pa.field("ts", ts_type), table.column("ts").cast(ts_type)
    )
    _write_pa(_TRANSCRIPT_ORACLE_PATH, table)


def _transcript_table(spark):
    _ensure_transcript_fixture()
    return spark.read.parquet(_TRANSCRIPT_ORACLE_PATH)


def q_transcript_window_hll(spark, sf_dir):
    """Time-windowed sketch rollup on the transcript table: per-hour
    HLLs of conv_id (date_trunc keys), then the DAY rollup computed by
    MERGING the hour sketches (`merge_sketches` grouped agg) — never
    rescanning turns. Both granularities checked against exact distinct
    counts (5σ of 1.04/√m, floor 3). Hours emit as unix micros — the
    cross-engine-stable timestamp form (fixture stores UTC micros)."""
    from gr_tdigest_spark.operators.companions import (
        HLLSpec, hll_agg, hll_estimate, merge_sketches,
    )

    # arithmetic epoch buckets, NOT date_trunc: truncation of a
    # TIMESTAMPTZ is session-timezone-sensitive in both engines —
    # floor(epoch/width) is not
    t = _transcript_table(spark).withColumn(
        "hour_us", F.floor(F.unix_micros("ts") / F.lit(3_600_000_000))
    ).withColumn(
        "day_us", F.floor(F.unix_micros("ts") / F.lit(86_400_000_000))
    )
    # persisted (bounded slot): both the hour estimates and the day
    # rollup consume this table — without the cache the turn scan runs
    # twice; at production scale, materialize the sketch table instead
    hourly = _persist_replacing(
        hll_agg(t, ["day_us", "hour_us"], "conv_id", p=14),
        "transcript_window_hll",
    )
    h_est = hourly.select(
        "hour_us", F.lit("hour").alias("grain"),
        hll_estimate("hll").alias("est"),
    )
    d_est = (
        hourly.groupBy("day_us")
        .agg(merge_sketches("hll", HLLSpec(p=14)).alias("hll"))
        .select(F.col("day_us").alias("hour_us"),
                F.lit("day").alias("grain"),
                hll_estimate("hll").alias("est"))
    )
    exact = (
        t.groupBy("hour_us")
        .agg(F.countDistinct("conv_id").alias("exact_distinct"))
        .withColumn("grain", F.lit("hour"))
        .unionByName(
            t.groupBy("day_us")
            .agg(F.countDistinct("conv_id").alias("exact_distinct"))
            .withColumn("grain", F.lit("day"))
            .withColumnRenamed("day_us", "hour_us")
        )
    )
    bound = 5 * (1.04 / (2 ** 14) ** 0.5)
    return (
        h_est.unionByName(d_est)
        .join(exact, ["hour_us", "grain"])
        .select(
            F.col("hour_us").alias("bucket_us"), "grain", "exact_distinct",
            (
                F.abs(F.col("est") - F.col("exact_distinct"))
                <= F.greatest(
                    F.lit(bound) * F.col("exact_distinct"), F.lit(3.0)
                )
            ).alias("within_bound"),
        )
        .orderBy("grain", "bucket_us")
    )


def q_transcript_latency(spark, sf_dir):
    """North-star query on the synthesized transcript table: per-role
    p50/p95 of inter-turn latency. Exact oracle via the uncompressed-
    digest trick (quantile at non-integer q·N == quantile_disc) over the
    materialized parquet both engines read."""
    from pyspark.sql.window import Window
    from gr_tdigest_spark.operators import tdigest_agg
    import gr_tdigest_spark.functions as Fn

    t = _transcript_table(spark)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    lat = t.withColumn(
        "latency_s",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))) / 1e6,
    ).where(F.col("latency_s").isNotNull())
    # at n_convs=150 every role has <14k latency rows, safely inside
    # the 20k uncompressed bound (exact oracle)
    dg = tdigest_agg(lat, ["role"], "latency_s", **UNCOMPRESSED)
    return dg.select(
        "role",
        Fn.tdigest_quantile("tdigest", 0.503173).alias("p50_latency"),
        Fn.tdigest_quantile("tdigest", 0.953171).alias("p95_latency"),
        Fn.tdigest_count("tdigest").alias("n_turns"),
    )


def q_transcript_tool_lengths(spark, sf_dir):
    """North-star letter: per-TOOL text-length quantiles on the
    transcript table (uncompressed exact oracle; ~90 turns per tool)."""
    from gr_tdigest_spark.operators import tdigest_agg
    import gr_tdigest_spark.functions as Fn

    t = _transcript_table(spark).where(F.col("tool").isNotNull())
    src = t.withColumn("len", F.length("text").cast("double"))
    dg = tdigest_agg(src, ["tool"], "len", **UNCOMPRESSED)
    return dg.select(
        "tool",
        Fn.tdigest_quantile("tdigest", Q1).alias("q_len"),
        Fn.tdigest_count("tdigest").alias("n"),
    )


def q_transcript_conv_counts(spark, sf_dir):
    """North-star letter: distinct conv_id per role via HLL, reported
    as a within-±1.04/√m bound check (the oracle emits the expected
    booleans, same pattern as hll_bound)."""
    from gr_tdigest_spark.operators.companions import hll_agg, hll_estimate

    t = _transcript_table(spark)
    est = hll_agg(t, ["role"], "conv_id", p=14).select(
        "role", hll_estimate("hll").alias("est")
    )
    exact = t.groupBy("role").agg(
        F.countDistinct("conv_id").alias("exact")
    )
    bound = 5 * (1.04 / (2 ** 14) ** 0.5)
    return est.join(exact, "role").select(
        "role",
        (
            F.abs(F.col("est") - F.col("exact"))
            <= F.greatest(F.lit(bound) * F.col("exact"), F.lit(3.0))
        ).alias("within_bound"),
    )


# --------------------------------------------------------------------- #
# contract
# --------------------------------------------------------------------- #

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: p50/p95/p99 text... of l_extendedprice per returnflag
    on sf0.001 via the two-phase t-digest aggregate."""
    from gr_tdigest_spark.operators import tdigest_agg
    import gr_tdigest_spark.functions as Fn

    li = _li(spark, "/root/testdata/sf0.001")
    dg = tdigest_agg(li, ["l_returnflag"], "l_extendedprice", max_size=1000)
    return dg.select(
        "l_returnflag",
        Fn.tdigest_quantile("tdigest", 0.5).alias("p50"),
        Fn.tdigest_quantile("tdigest", 0.95).alias("p95"),
        Fn.tdigest_quantile("tdigest", 0.99).alias("p99"),
        Fn.tdigest_count("tdigest").alias("n"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "td_quantile_group": q_td_quantile_group,
        "td_quantiles_multi": q_td_quantiles_multi,
        "td_cdf_probe": q_td_cdf_probe,
        "td_stats": q_td_stats,
        "td_median": q_td_median,
        "td_summary": q_td_summary,
        "td_pileagg": q_td_pileagg,
        "td_trimmed_mean": q_td_trimmed_mean,
        "td_merge_rollup": q_td_merge_rollup,
        "td_weighted": q_td_weighted,
        "td_scale": q_td_scale,
        "td_wire": q_td_wire,
        "td_add": q_td_add,
        "td_infer_precision": q_td_infer_precision,
        "td_struct_roundtrip": q_td_struct_roundtrip,
        "td_cdf_col": q_td_cdf_col,
        "td_cube": q_td_cube,
        "td_over_group": q_td_over_group,
        "td_sql": q_td_sql,
        "sketch_rollup_consistency": q_sketch_rollup_consistency,
        "sketch_sql": q_sketch_sql,
        "hll_cube": q_hll_cube,
        "hll_bound": q_hll_bound,
        "hll_intersect": q_hll_intersect,
        "minhash_jaccard": q_minhash_jaccard,
        "minhash_tools": q_minhash_tools,
        "cms_join_size": q_cms_join_size,
        "cms_topk": q_cms_topk,
        "hh_topk_tools": q_hh_topk_tools,
        "hh_topk_users": q_hh_topk_users,
        "bloom_members": q_bloom_members,
        "bloom_semi_filter": q_bloom_semi_filter,
        "kll_quantile_docs": q_kll_quantile_docs,
        "kll_rank_docs": q_kll_rank_docs,
        "dedup_exact": q_dedup_exact,
        "text_stats": q_text_stats,
        "quality_score": q_quality_score,
        "media_stats": q_media_stats,
        "sample_docs": q_sample_docs,
        "embed_topk": q_embed_topk,
        "lsh_bucket_topk": q_lsh_bucket_topk,
        "embed_near_dups": q_embed_near_dups,
        "minhash_near_dups": q_minhash_near_dups,
        "near_dup_clusters": q_near_dup_clusters,
        "simhash_near_dups": q_simhash_near_dups,
        "lang_id": q_lang_id,
        "transcript_window_hll": q_transcript_window_hll,
        "transcript_latency": q_transcript_latency,
        "transcript_tool_lengths": q_transcript_tool_lengths,
        "transcript_conv_counts": q_transcript_conv_counts,
    }


_GROUPED = "FROM lineitem GROUP BY l_returnflag, l_linestatus"


def oracle_sql() -> dict[str, str]:
    # generated-table fixtures must exist before DuckDB reads them,
    # whichever side the driver evaluates first — generation is
    # Spark-free (pyarrow) and deterministic, so this is idempotent
    _ensure_transcript_fixture()
    _ensure_emb768_fixture()
    return {
        "td_quantile_group": (
            f"SELECT l_returnflag, l_linestatus, "
            f"quantile_disc(l_extendedprice, {Q1}) AS q_price {_GROUPED}"
        ),
        "td_pileagg": (
            f"SELECT l_returnflag, l_linestatus, "
            f"quantile_disc(l_extendedprice, {Q1}) AS q_price {_GROUPED}"
        ),
        "td_quantiles_multi": (
            f"SELECT l_returnflag, l_linestatus, "
            f"quantile_disc(l_extendedprice, {QA}) AS p25, "
            f"quantile_disc(l_extendedprice, {QB}) AS p50, "
            f"quantile_disc(l_extendedprice, {QC}) AS p97 {_GROUPED}"
        ),
        "td_cdf_probe": (
            "SELECT l_returnflag, l_linestatus, "
            "(count(*) FILTER (l_extendedprice < 30000) + "
            " 0.5 * count(*) FILTER (l_extendedprice = 30000)) / count(*) "
            "AS cdf_30k, "
            "(count(*) FILTER (l_extendedprice < 90000) + "
            " 0.5 * count(*) FILTER (l_extendedprice = 90000)) / count(*) "
            f"AS cdf_90k {_GROUPED}"
        ),
        "td_stats": (
            "SELECT l_returnflag, l_linestatus, "
            "count(*)::DOUBLE AS n, min(l_extendedprice) AS min_price, "
            "max(l_extendedprice) AS max_price, "
            "round(sum(l_extendedprice), 2) AS sum_price, "
            f"round(avg(l_extendedprice), 4) AS avg_price {_GROUPED}"
        ),
        "td_median": (
            "SELECT l_returnflag, l_linestatus, "
            f"median(l_extendedprice) AS median_price {_GROUPED}"
        ),
        "td_summary": (
            """
            WITH v AS (
              SELECT ((i*i) % 9973)::DOUBLE AS x FROM range(1, 102) t(i)
            ), s AS (
              SELECT count(*)::DOUBLE AS n, min(x) AS mn, max(x) AS mx,
                     quantile_disc(x, 0.5) AS p50
              FROM v
            )
            SELECT 'TDigest(n=' || printf('%g', n)
                || ', k=20000, min=' || printf('%g', mn)
                || ', p50=' || printf('%g', p50)
                || ', max=' || printf('%g', mx)
                || ', centroids=101, scale=k2, policy=off, f64)'
              AS summary
            FROM s
            """
        ),
        "td_trimmed_mean": (
            """
            WITH piles AS (
              SELECT l_returnflag, l_linestatus, l_extendedprice AS x,
                     count(*)::DOUBLE AS w
              FROM lineitem GROUP BY 1, 2, 3
            ), c AS (
              SELECT *, sum(w) OVER (PARTITION BY l_returnflag, l_linestatus
                                     ORDER BY x) AS cum_hi,
                        sum(w) OVER (PARTITION BY l_returnflag, l_linestatus)
                                     AS n
              FROM piles
            )
            SELECT l_returnflag, l_linestatus,
                   round(sum(x * take) / sum(take), 6) AS tmean_price
            FROM (
              SELECT l_returnflag, l_linestatus, x,
                     greatest(least(cum_hi, 0.75 * n) -
                              greatest(cum_hi - w, 0.25 * n), 0) AS take
              FROM c
            ) WHERE take > 0
            GROUP BY l_returnflag, l_linestatus
            """
        ),
        "td_merge_rollup": (
            f"SELECT l_returnflag, quantile_disc(l_quantity, {Q1}) AS q_qty, "
            "count(*)::DOUBLE AS n FROM lineitem GROUP BY l_returnflag"
        ),
        "td_weighted": (
            f"""
            SELECT p_brand, quantile_disc(p_retailprice, {QW}) AS q_wprice,
                   count(*)::DOUBLE AS total_w
            FROM (
              SELECT p_brand, p_retailprice, p_size,
                     unnest(range(p_size)) AS _i
              FROM part
            ) GROUP BY p_brand
            """
        ),
        "td_scale": (
            f"SELECT l_returnflag, "
            f"quantile_disc(l_quantity * 4.0, {Q1}) AS q_qty4, "
            "max(l_quantity * 4.0) AS max_qty4, "
            f"quantile_disc(l_quantity, {Q1}) AS q_qty, "
            "2.0 * count(*) AS n2 "
            "FROM lineitem GROUP BY l_returnflag"
        ),
        "td_wire": (
            f"SELECT l_returnflag, quantile_disc(l_quantity, {Q1}) AS q_qty, "
            "'f64' AS prec, "
            f"quantile_disc(l_quantity, {Q1}) AS q_qty32, "
            "'f32' AS prec32 FROM lineitem GROUP BY l_returnflag"
        ),
        "td_add": (
            f"""
            WITH added AS (
              SELECT l_returnflag, qv AS l_quantity
              FROM (SELECT DISTINCT l_returnflag FROM lineitem),
                   (VALUES (3.5::DOUBLE, 3), (97.5::DOUBLE, 2)) AS t(qv, w),
                   unnest(range(w)) AS u(_i)
            ), allrows AS (
              SELECT l_returnflag, l_quantity FROM lineitem
              UNION ALL SELECT l_returnflag, l_quantity FROM added
            ), a AS (
              SELECT l_returnflag, quantile_disc(l_quantity, {Q1}) AS q_qty,
                     count(*)::DOUBLE AS n
              FROM lineitem GROUP BY l_returnflag
            ), b AS (
              SELECT l_returnflag,
                     quantile_disc(l_quantity, {Q1}) AS q_qty_w,
                     count(*)::DOUBLE AS n_w
              FROM allrows GROUP BY l_returnflag
            )
            SELECT a.l_returnflag, a.q_qty, a.n, b.q_qty_w, b.n_w
            FROM a JOIN b USING (l_returnflag)
            """
        ),
        "td_infer_precision": (
            "SELECT 'f64_col' AS name, 'f64' AS precision "
            "UNION ALL SELECT 'f32_col', 'f32'"
        ),
        "td_struct_roundtrip": (
            f"SELECT l_returnflag, quantile_disc(l_quantity, {Q1}) AS q_qty "
            "FROM lineitem GROUP BY l_returnflag"
        ),
        "td_cdf_col": (
            """
            WITH probes AS (
              SELECT x::DOUBLE AS x FROM (SELECT unnest(range(5, 50, 10)) x)
            )
            SELECT l_returnflag, x,
                   (count(*) FILTER (l_quantity < x)
                    + 0.5 * count(*) FILTER (l_quantity = x)) / count(*)
                     AS cdf_x
            FROM lineitem, probes GROUP BY l_returnflag, x
            """
        ),
        "td_over_group": (
            f"""
            SELECT l_orderkey, l_linenumber,
                   quantile_disc(l_extendedprice, {Q1})
                     OVER (PARTITION BY l_returnflag, l_linestatus)
                     AS q_group
            FROM lineitem
            """
        ),
        "td_sql": (
            f"""
            SELECT l_returnflag, quantile_disc(l_quantity, {Q1}) AS q_qty,
                   (count(*) FILTER (l_quantity < 25.0)
                    + 0.5 * count(*) FILTER (l_quantity = 25.0)) / count(*)
                     AS cdf_25,
                   count(*)::DOUBLE AS n
            FROM lineitem GROUP BY l_returnflag
            """
        ),
        "td_cube": (
            f"""
            SELECT l_returnflag, l_linestatus,
                   quantile_disc(l_quantity, {Q1}) AS q_qty,
                   count(*)::DOUBLE AS n
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
            """
        ),
        "sketch_rollup_consistency": (
            "SELECT unnest(['hll','cms','bloom']) AS sketch, "
            "TRUE AS merged_equals_direct"
        ),
        "sketch_sql": (
            "SELECT l_returnflag, "
            "count(DISTINCT l_orderkey) AS exact_distinct, "
            "TRUE AS within_bound "
            "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
        ),
        "hll_cube": (
            "SELECT l_returnflag, l_linestatus, "
            "count(DISTINCT l_orderkey) AS exact_distinct, "
            "TRUE AS within_bound "
            "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus) "
            "ORDER BY l_returnflag, l_linestatus"
        ),
        "hll_bound": (
            "SELECT event_type, TRUE AS within_bound "
            "FROM events GROUP BY event_type"
        ),
        "hll_intersect": (
            "SELECT a.event_type AS et_a, b.event_type AS et_b, "
            "TRUE AS within_bound "
            "FROM (SELECT DISTINCT event_type FROM events) a "
            "JOIN (SELECT DISTINCT event_type FROM events) b "
            "ON a.event_type < b.event_type"
        ),
        "minhash_jaccard": (
            """
            WITH ds AS (
              SELECT DISTINCT l_returnflag, l_orderkey FROM lineitem
            ), inter AS (
              SELECT a.l_returnflag AS fa, b.l_returnflag AS fb,
                     count(*) AS exact_inter
              FROM ds a JOIN ds b
                ON a.l_returnflag < b.l_returnflag
               AND a.l_orderkey = b.l_orderkey
              GROUP BY 1, 2
            ), sizes AS (
              SELECT l_returnflag, count(*) AS n_keys FROM ds GROUP BY 1
            )
            SELECT i.fa, i.fb, i.exact_inter,
                   sa.n_keys + sb.n_keys - i.exact_inter AS exact_union,
                   TRUE AS within_bound
            FROM inter i
            JOIN sizes sa ON sa.l_returnflag = i.fa
            JOIN sizes sb ON sb.l_returnflag = i.fb
            ORDER BY i.fa, i.fb
            """
        ),
        "minhash_tools": (
            f"""
            WITH ds AS (
              SELECT DISTINCT tool, conv_id
              FROM read_parquet('{_TRANSCRIPT_ORACLE_PATH}/*.parquet')
              WHERE tool IN ('tool_00', 'tool_01', 'tool_02', 'tool_49')
            ), inter AS (
              SELECT a.tool AS ta, b.tool AS tb, count(*) AS exact_inter
              FROM ds a JOIN ds b
                ON a.tool < b.tool AND a.conv_id = b.conv_id
              GROUP BY 1, 2
            ), sizes AS (
              SELECT tool, count(*) AS n_convs FROM ds GROUP BY 1
            )
            SELECT i.ta, i.tb, i.exact_inter,
                   sa.n_convs + sb.n_convs - i.exact_inter AS exact_union,
                   TRUE AS within_bound
            FROM inter i
            JOIN sizes sa ON sa.tool = i.ta
            JOIN sizes sb ON sb.tool = i.tb
            ORDER BY i.ta, i.tb
            """
        ),
        "cms_join_size": (
            "SELECT (SELECT count(*) FROM orders o JOIN customer c "
            "ON o.o_custkey = c.c_custkey) AS exact_join, "
            "TRUE AS lower_ok, TRUE AS upper_ok"
        ),
        "cms_topk": (
            "SELECT event_type, count(*) AS est_count FROM events "
            "GROUP BY event_type ORDER BY est_count DESC, event_type LIMIT 5"
        ),
        "hh_topk_tools": (
            f"""
            WITH c AS (
              SELECT role, tool, count(*) AS est_count
              FROM read_parquet(
                '{_TRANSCRIPT_ORACLE_PATH}/*.parquet')
              WHERE tool IS NOT NULL GROUP BY role, tool
            ), r AS (
              SELECT role, tool, est_count,
                     row_number() OVER (PARTITION BY role
                       ORDER BY est_count DESC, tool) AS rk
              FROM c
            )
            SELECT role, tool, est_count FROM r WHERE rk <= 3
            """
        ),
        "hh_topk_users": (
            """
            WITH c AS (
              SELECT event_type, user_id, count(*) AS est_count
              FROM events WHERE user_id IS NOT NULL
              GROUP BY event_type, user_id
            ), r AS (
              SELECT event_type, user_id, est_count,
                     row_number() OVER (PARTITION BY event_type
                       ORDER BY est_count DESC, user_id) AS rk
              FROM c
            )
            SELECT event_type, user_id, est_count FROM r WHERE rk <= 3
            """
        ),
        "bloom_members": (
            "SELECT count(DISTINCT user_id) AS n_members FROM events "
            "WHERE event_type = 'click'"
        ),
        "bloom_semi_filter": (
            """
            SELECT count(*) AS n_rows, sum(l_quantity) AS tot_qty
            FROM lineitem
            WHERE l_orderkey IN (
              SELECT o_orderkey FROM orders WHERE o_totalprice > 400000.0
            )
            """
        ),
        "kll_quantile_docs": (
            "SELECT source, quantile_disc(n_chars::DOUBLE, 0.5) AS med_chars "
            "FROM documents GROUP BY source"
        ),
        "kll_rank_docs": (
            "SELECT source, round(sum(CASE WHEN n_chars <= 1000 THEN 1 "
            "ELSE 0 END) * 1.0 / count(*), 6) AS rank_1k "
            "FROM documents GROUP BY source"
        ),
        "dedup_exact": (
            """
            WITH synth AS (
              SELECT doc_id + 1000000 AS doc_id,
                     'contact user' || doc_id::VARCHAR
                       || '@example.com about ' || text AS text
              FROM documents WHERE doc_id % 10 = 0
            ), corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL SELECT doc_id, text FROM synth
            ), toks AS (
              SELECT doc_id, list_filter(string_split(lower(
                       regexp_replace(text, '[ \\t\\n\\r\\f]+', ' ', 'g')),
                       ' '), x -> x <> '') AS tk
              FROM corpus
            ), grams AS (
              SELECT doc_id,
                     CASE WHEN len(tk) >= 5 THEN list_distinct(
                       [array_to_string(tk[i+1:i+5], ' ')
                        for i in range(0, len(tk) - 4)])
                     ELSE [] END AS g
              FROM toks
            ), bench AS (
              SELECT DISTINCT unnest(g) AS gram FROM grams
              WHERE doc_id % 17 = 0 AND doc_id < 1000000
            ), hits AS (
              SELECT dg.doc_id, count(*) AS n_hit
              FROM (SELECT doc_id, unnest(g) AS gram FROM grams) dg
              JOIN bench b ON dg.gram = b.gram
              GROUP BY dg.doc_id
            ), scored AS (
              SELECT g.doc_id, len(g.g) AS n_grams,
                     coalesce(h.n_hit, 0) AS n_hit
              FROM grams g LEFT JOIN hits h USING (doc_id)
            ), pgrams AS (
              SELECT doc_id,
                     unnest(CASE WHEN len(tk) >= 5 THEN
                       [array_to_string(tk[i+1:i+5], ' ')
                        for i in range(0, len(tk) - 4)]
                     ELSE [] END) AS gram,
                     unnest(CASE WHEN len(tk) >= 5 THEN
                       range(0, len(tk) - 4) ELSE [] END) AS gpos
              FROM toks
            ), thits AS (
              SELECT DISTINCT p.doc_id, p.gpos
              FROM pgrams p JOIN bench b ON p.gram = b.gram
            ), tok_pos AS (
              SELECT doc_id, unnest(range(0, len(tk))) AS pos FROM toks
            ), cov AS (
              SELECT count(*) AS tot_contam_tokens FROM (
                SELECT DISTINCT t.doc_id, t.pos
                FROM tok_pos t JOIN thits h
                  ON t.doc_id = h.doc_id
                 AND t.pos BETWEEN h.gpos AND h.gpos + 4
              )
            ), ta AS (
              SELECT DISTINCT text FROM documents WHERE doc_id % 10 < 7
            ), tb AS (
              SELECT DISTINCT text FROM documents WHERE doc_id % 10 >= 5
            ), ov AS (
              SELECT (SELECT count(*) FROM ta)::DOUBLE AS ov_distinct_a,
                     (SELECT count(*) FROM tb)::DOUBLE AS ov_distinct_b,
                     (SELECT count(*) FROM ta JOIN tb USING (text))
                       ::DOUBLE AS ov_intersection
            )
            SELECT count(*) AS n_docs,
                   count(DISTINCT md5(lower(trim(
                     regexp_replace(text, '\\s+', ' ', 'g'))))) AS n_unique,
                   sum(CASE WHEN regexp_matches(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')
                     THEN 1 ELSE 0 END)::BIGINT AS n_email_docs,
                   0::BIGINT AS n_email_after_redact,
                   (SELECT sum(n_grams) FROM scored)::BIGINT AS tot_grams,
                   (SELECT sum(n_hit) FROM scored)::BIGINT AS tot_hits,
                   (SELECT count(*) FROM scored
                    WHERE n_grams > 0
                      AND n_hit * 1.0 / n_grams >= 0.35)::BIGINT
                     AS n_contaminated,
                   (SELECT tot_contam_tokens FROM cov)::BIGINT
                     AS tot_contam_tokens,
                   (SELECT ov_distinct_a FROM ov) AS ov_distinct_a,
                   (SELECT ov_distinct_b FROM ov) AS ov_distinct_b,
                   (SELECT ov_intersection FROM ov) AS ov_intersection,
                   (SELECT ov_intersection
                      / (ov_distinct_a + ov_distinct_b - ov_intersection)
                    FROM ov) AS ov_jaccard
            FROM corpus
            """
        ),
        "text_stats": (
            """
            WITH corpus AS (
              SELECT doc_id, lang, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, lang,
                     text || chr(10) || text || chr(10) || text
              FROM documents WHERE doc_id % 10 = 0
            ), lines AS (
              SELECT doc_id, lang,
                     unnest(string_split(text, chr(10))) AS ln,
                     unnest(range(1, len(string_split(text, chr(10)))
                                     + 1)) AS idx
              FROM corpus
            ), content AS (
              SELECT * FROM lines WHERE trim(ln) <> ''
            ), ranked AS (
              SELECT lang, row_number() OVER (
                PARTITION BY ln ORDER BY doc_id, idx) AS rn
              FROM content
            ), line_agg AS (
              SELECT lang,
                     sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT
                       AS tot_lines_kept,
                     sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT
                       AS tot_lines_removed
              FROM ranked GROUP BY lang
            ), base_agg AS (
            SELECT lang,
                   sum(len(regexp_extract_all(text, '[^ \\t\\n\\r\\f]+')))
                     ::BIGINT AS tot_tokens,
                   sum(len(text))::BIGINT AS tot_chars,
                   sum(len(regexp_replace(text,
                       '[^.,;:!?''"()\\[\\]-]', '', 'g')))::BIGINT
                     AS tot_punct,
                   sum(len(regexp_extract_all(text,
                       '''s|''t|''re|''ve|''m|''ll|''d'
                       || '| ?\\p{L}+| ?\\p{N}+| ?[^ \\t\\n\\x0B\\f\\r\\p{L}\\p{N}]+')))
                     ::BIGINT AS tot_bpe_tokens,
                   sum(
                     len(list_filter(string_split(text, chr(10)),
                                     ln -> trim(ln) <> ''))
                     - len(list_distinct(list_filter(
                         string_split(text, chr(10)),
                         ln -> trim(ln) <> '')))
                   )::BIGINT AS tot_dup_lines
            FROM corpus GROUP BY lang
            )
            SELECT b.lang, b.tot_tokens, b.tot_chars, b.tot_punct,
                   b.tot_bpe_tokens, b.tot_dup_lines,
                   la.tot_lines_kept, la.tot_lines_removed
            FROM base_agg b JOIN line_agg la USING (lang)
            """
        ),
        # replicates with_quality_score's expression tree in the same
        # operation ORDER (each double op is exactly rounded, so same
        # order → bit-identical scores → identical deciles)
        "quality_score": (
            """
            WITH s AS (
              SELECT
                len(text) AS n_chars,
                CASE WHEN len(trim(text)) = 0 THEN 0
                     ELSE len(regexp_split_to_array(trim(lower(text)),
                                                    '\\s+')) END
                  AS n_tokens,
                len(regexp_replace(text, '[^.,;:!?''"()\\[\\]-]', '',
                                   'g')) AS n_punct,
                len(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
                len(list_intersect(
                  regexp_split_to_array(trim(lower(text)), '\\s+'),
                  ['the','and','of','to','is','in','that','it','was',
                   'for'])) AS stop_hits
              FROM documents
            ), r AS (
              SELECT
                n_punct / greatest(n_chars, 1)::DOUBLE AS punct_ratio,
                n_digit / greatest(n_chars, 1)::DOUBLE AS digit_ratio,
                n_chars / greatest(n_tokens, 1)::DOUBLE AS avg_word,
                stop_hits
              FROM s
            ), q AS (
              SELECT greatest(least(
                1.0 - least(punct_ratio * 3.0, 0.4)
                    - least(digit_ratio * 2.0, 0.3)
                    - least(abs(avg_word - 5.0) / 20.0, 0.2)
                    + least(stop_hits::DOUBLE / 10.0, 0.1),
                1.0), 0.0) AS quality_score
              FROM r
            )
            SELECT floor(quality_score * 10)::BIGINT AS decile,
                   count(*) AS n_docs
            FROM q GROUP BY 1
            """
        ),
        # closed-form payload sizes from the same doc_id formulas the
        # Spark side synthesizes (PPM header 'P6\n{w} {h}\n255\n' +
        # w*h*3 pixels; canonical 44-byte WAV header + 2 bytes/sample);
        # n_ok == n because every payload decodes to the analytic
        # feature invariant
        "media_stats": (
            """
            WITH m AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 2 = 0 THEN 'image'
                          ELSE 'audio' END AS kind,
                     CASE WHEN doc_id % 2 = 0 THEN
                       3 + length((4 * (doc_id % 3 + 1))::VARCHAR) + 1
                         + length((4 * (doc_id % 2 + 1))::VARCHAR) + 1 + 4
                         + 48 * (doc_id % 3 + 1) * (doc_id % 2 + 1)
                     ELSE 44 + 320 * (doc_id % 4 + 1)
                     END AS nbytes
              FROM documents
            )
            SELECT kind, count(*)::BIGINT AS n,
                   sum(nbytes)::BIGINT AS total_bytes,
                   count(*)::BIGINT AS n_ok
            FROM m GROUP BY kind
            """
        ),
        # stratified-sample size is exact (the sketch keeps the k
        # hash-smallest distinct ids, so the semi-join returns exactly
        # least(k, distinct) docs); the KMV estimate check is the
        # bound-boolean pattern
        "sample_docs": (
            """
            SELECT source,
                   least(16, count(DISTINCT doc_id))::BIGINT AS n_sample,
                   TRUE AS kmv_ok,
                   TRUE AS sampling_ok,
                   TRUE AS nextfit_ok
            FROM documents GROUP BY source
            """
        ),
        "lang_id": (
            """
            WITH toks AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\\s+') AS tk
              FROM documents
            ), scored AS (
              SELECT doc_id,
                len(list_intersect(tk, ['the','and','of','to','is','in',
                                        'that','it','was','for'])) AS s_en,
                len(list_intersect(tk, ['der','die','das','und','ist',
                                        'nicht','ein','mit','von'])) AS s_de,
                len(list_intersect(tk, ['le','la','les','et','est','dans',
                                        'que','pour','une'])) AS s_fr,
                len(list_intersect(tk, ['el','la','los','que','es','en',
                                        'por','una','con'])) AS s_es
              FROM toks
            ), best AS (
              SELECT doc_id, greatest(s_en, s_de, s_fr, s_es) AS mx,
                greatest(lpad(s_en::text,2,'0')||'en',
                         lpad(s_de::text,2,'0')||'de',
                         lpad(s_fr::text,2,'0')||'fr',
                         lpad(s_es::text,2,'0')||'es') AS key
              FROM scored
            )
            SELECT CASE WHEN mx = 0 THEN 'und' ELSE key[3:] END AS lang_id,
                   count(*) AS n
            FROM best GROUP BY 1
            """
        ),
        "minhash_near_dups": (
            """
            WITH s AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
              FROM documents
            ), sh AS (
              SELECT DISTINCT doc_id, t[i:i+4] AS g
              FROM s, unnest(range(1, greatest(len(t)-4, 1) + 1)) AS u(i)
            ), cnt AS (
              SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
              SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
              FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
              GROUP BY 1, 2
            )
            SELECT a, b, round(i * 1.0 / (ca.n + cb.n - i), 6) AS jaccard
            FROM inter JOIN cnt ca ON ca.doc_id = a
                       JOIN cnt cb ON cb.doc_id = b
            WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.5
            """
        ),
        # same exact-Jaccard pair set, then a recursive reachability
        # closure: cluster = min id reachable from each node
        "near_dup_clusters": (
            """
            WITH RECURSIVE s AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
              FROM documents
            ), sh AS (
              SELECT DISTINCT doc_id, t[i:i+4] AS g
              FROM s, unnest(range(1, greatest(len(t)-4, 1) + 1)) AS u(i)
            ), cnt AS (
              SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
              SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
              FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
              GROUP BY 1, 2
            ), pairs AS (
              SELECT a, b
              FROM inter JOIN cnt ca ON ca.doc_id = a
                         JOIN cnt cb ON cb.doc_id = b
              WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.5
            ), edges AS (
              SELECT a AS src, b AS dst FROM pairs
              UNION SELECT b, a FROM pairs
            ), reach(src, dst) AS (
              SELECT src, dst FROM edges
              UNION
              SELECT r.src, e.dst FROM reach r
                JOIN edges e ON r.dst = e.src
            ), clus AS (
              SELECT src AS id, least(src, min(dst)) AS cluster
              FROM reach GROUP BY src
            ), wl AS (
              -- representative election input: (id, cluster, length)
              SELECT c.id, c.cluster, length(d.text) AS ln
              FROM clus c JOIN documents d ON d.doc_id = c.id
            ), best AS (
              SELECT cluster, max(ln) AS bl FROM wl GROUP BY cluster
            ), rep AS (
              SELECT w.cluster, min(w.id) AS rep_id
              FROM wl w JOIN best b
                ON w.cluster = b.cluster AND w.ln = b.bl
              GROUP BY w.cluster
            )
            SELECT w.id, w.cluster, r.rep_id, TRUE AS kept_ok
            FROM wl w JOIN rep r ON w.cluster = r.cluster
            """
        ),
        "embed_topk": (
            """
            WITH q AS (
              SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
            )
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[],
                                                qv::DOUBLE[]), 6) AS cos_sim,
                   TRUE AS ivf_exact,
                   TRUE AS pruned_scan_ok,
                   TRUE AS batch_ok
            FROM embeddings, q WHERE vec_id != 0
            ORDER BY cos_sim DESC, vec_id LIMIT 5
            """
        ),
        "lsh_bucket_topk": (
            f"""
            WITH emb AS (
              SELECT vec_id, embedding::DOUBLE[] AS v
              FROM read_parquet('{_EMB768_PATH}/*.parquet')
            ), pl AS (
              SELECT bit, vec
              FROM read_parquet('{_PLANES768_PATH}/*.parquet')
            ), b AS (
              SELECT vec_id,
                     sum(CASE WHEN list_dot_product(v, vec) >= 0
                         THEN bit ELSE 0 END)::UBIGINT AS bucket
              FROM emb, pl GROUP BY vec_id
            ), qb AS (
              SELECT bucket AS qbucket FROM b WHERE vec_id = 0
            ), qv AS (
              SELECT v AS q FROM emb WHERE vec_id = 0
            ), cand AS (
              SELECT e.vec_id, e.v
              FROM emb e JOIN b USING (vec_id), qb
              WHERE e.vec_id != 0
                AND bit_count(xor(b.bucket, qb.qbucket)) <= 2
            )
            SELECT vec_id,
                   round(list_cosine_similarity(v, q), 6) AS cos_sim,
                   TRUE AS lsh_batch_ok
            FROM cand, qv
            ORDER BY cos_sim DESC, vec_id LIMIT 10
            """
        ),
        "embed_near_dups": (
            f"""
            WITH emb AS (
              SELECT vec_id, embedding::DOUBLE[] AS v
              FROM read_parquet('{_EMB768_PATH}/*.parquet')
            ), pl AS (
              SELECT bit, vec
              FROM read_parquet('{_PLANES768_PATH}/*.parquet')
            ), b AS (
              SELECT vec_id,
                     sum(CASE WHEN list_dot_product(v, vec) >= 0
                         THEN bit ELSE 0 END)::BIGINT AS bucket
              FROM emb, pl GROUP BY vec_id
            )
            SELECT x.vec_id AS a, y.vec_id AS b,
                   round(list_cosine_similarity(ex.v, ey.v), 6) AS cos_sim
            FROM b x JOIN b y ON x.bucket = y.bucket
                              AND x.vec_id < y.vec_id
                 JOIN emb ex ON ex.vec_id = x.vec_id
                 JOIN emb ey ON ey.vec_id = y.vec_id
            WHERE list_cosine_similarity(ex.v, ey.v) >= 0.9
            """
        ),
        # full simhash replica: md5-derived 64-bit token hash, ±1 bit
        # votes, exhaustive pair scan (the Spark side's pigeonhole block
        # join is recall-complete, so the sets are equal)
        "simhash_near_dups": (
            """
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(lower(text)),
                                                  '\\s+')) AS tok
              FROM documents
            ), th AS (
              SELECT doc_id,
                     ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h
              FROM toks WHERE tok <> ''
            ), votes AS (
              SELECT doc_id, b.bit,
                     sum(CASE WHEN (h >> b.bit) & 1 = 1
                         THEN 1 ELSE -1 END) AS vote
              FROM th, (SELECT unnest(range(64))::INTEGER AS bit) b
              GROUP BY doc_id, b.bit
            ), sh AS (
              SELECT doc_id,
                     sum(CASE WHEN vote > 0 THEN (1::UBIGINT << bit)
                         ELSE 0::UBIGINT END)::UBIGINT AS simhash
              FROM votes GROUP BY doc_id
            ), allsh AS (
              SELECT d.doc_id, coalesce(s.simhash, 0::UBIGINT) AS simhash
              FROM documents d LEFT JOIN sh s USING (doc_id)
            )
            SELECT x.doc_id AS a, y.doc_id AS b,
                   bit_count(xor(x.simhash, y.simhash)) AS hamming
            FROM allsh x JOIN allsh y ON x.doc_id < y.doc_id
            WHERE bit_count(xor(x.simhash, y.simhash)) <= 8
            """
        ),
        # reads the SAME materialized parquet the Spark query writes;
        # quantile_disc == uncompressed-digest quantile at non-integer q·N
        "transcript_window_hll": (
            f"""
            WITH t AS (
              SELECT conv_id,
                     floor(epoch_us(ts) / 3600000000)::BIGINT AS hour_us,
                     floor(epoch_us(ts) / 86400000000)::BIGINT AS day_us
              FROM read_parquet('{_TRANSCRIPT_ORACLE_PATH}/*.parquet')
            ), h AS (
              SELECT hour_us AS bucket_us, 'hour' AS grain,
                     count(DISTINCT conv_id) AS exact_distinct
              FROM t GROUP BY 1
            ), d AS (
              SELECT day_us AS bucket_us, 'day' AS grain,
                     count(DISTINCT conv_id) AS exact_distinct
              FROM t GROUP BY 1
            )
            SELECT bucket_us, grain, exact_distinct, TRUE AS within_bound
            FROM (SELECT * FROM h UNION ALL SELECT * FROM d)
            ORDER BY grain, bucket_us
            """
        ),
        "transcript_latency": (
            f"""
            WITH lat AS (
              SELECT role,
                     (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                        PARTITION BY conv_id ORDER BY turn_idx)) / 1e6
                       AS latency_s
              FROM read_parquet(
                '{_TRANSCRIPT_ORACLE_PATH}/*.parquet')
            )
            SELECT role,
                   quantile_disc(latency_s, 0.503173) AS p50_latency,
                   quantile_disc(latency_s, 0.953171) AS p95_latency,
                   count(latency_s)::DOUBLE AS n_turns
            FROM lat WHERE latency_s IS NOT NULL GROUP BY role
            """
        ),
        "transcript_tool_lengths": (
            f"""
            SELECT tool,
                   quantile_disc(len(text)::DOUBLE, {Q1}) AS q_len,
                   count(*)::DOUBLE AS n
            FROM read_parquet(
              '{_TRANSCRIPT_ORACLE_PATH}/*.parquet')
            WHERE tool IS NOT NULL GROUP BY tool
            """
        ),
        "transcript_conv_counts": (
            f"""
            SELECT role, TRUE AS within_bound
            FROM read_parquet(
              '{_TRANSCRIPT_ORACLE_PATH}/*.parquet')
            GROUP BY role
            """
        ),
    }
