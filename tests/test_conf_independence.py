"""Session-conf-independence gate.

The library must work on a FOREIGN SparkSession — one the user (or the
driver harness) built without our sketch-tuned confs. The r4 regression:
``build_ivf_index``/``build_ann_index`` fed numpy rows to
``createDataFrame``, which only passes when
``spark.sql.execution.arrow.pyspark.enabled`` is true (our
``plans.get_spark`` sets it; the driver's session doesn't → the
non-Arrow row verifier rejects ``numpy.float64`` inside
``array<double>``). This module smoke-runs every operator that builds a
DataFrame from driver-side data on a session with Arrow conversion
EXPLICITLY disabled (and fallback disabled, so nothing silently routes
back through Arrow).

Arrow-*execution* (pandas_udf / mapInPandas / mapInArrow) is always
Arrow-backed regardless of this conf — only driver⇄JVM conversion
(createDataFrame / toPandas) is governed by it, and that's exactly the
surface this gate pins.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="module")
def plain_spark(spark):
    """A session sharing the JVM but with DEFAULT driver⇄JVM conversion:
    Arrow conversion off, fallback off. SQL confs are session-scoped, so
    this cannot leak into the main test session."""
    ns = spark.newSession()
    ns.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    ns.conf.set("spark.sql.execution.arrow.pyspark.fallback.enabled", "false")
    assert ns.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "false"
    # the main session must still have it on (isolation sanity)
    assert spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    return ns


def _clustered_embeddings(spark, n=120, dim=32, seed=11):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((6, dim))
    M = (base[rng.integers(0, 6, n)]
         + 0.2 * rng.standard_normal((n, dim))).astype(np.float64)
    # plain Python rows on purpose: the INPUT path must also work
    # without Arrow
    rows = [(int(i), M[i].tolist()) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, M


class TestArrowDisabledSession:
    def test_ann_index_build_and_query(self, plain_spark, tmp_path):
        """build_ann_index persists its hyperplane table via
        createDataFrame — the exact call class that regressed in r4."""
        from gr_tdigest_spark.operators.similarity import (
            ann_index_topk, build_ann_index, lsh_bucket_topk,
        )

        df, M = _clustered_embeddings(plain_spark)
        path = str(tmp_path / "annidx_noarrow")
        build_ann_index(df, path, n_planes=8, seed=23)
        q = M[0]
        got = [(r["vec_id"], round(r["cosine"], 9))
               for r in ann_index_topk(plain_spark, path, q, k=5,
                                       multiprobe=2).collect()]
        ref = [(r["vec_id"], round(r["cosine"], 9))
               for r in lsh_bucket_topk(df, q, k=5, n_planes=8, seed=23,
                                        multiprobe=2).collect()]
        assert got == ref and len(got) > 0

    def test_ivf_index_build_and_query(self, plain_spark, tmp_path):
        """build_ivf_index persists its centroid table the same way;
        full-probe must equal brute force on the Arrow-off session."""
        from gr_tdigest_spark.operators.similarity import (
            build_ivf_index, cosine_topk, ivf_index_topk,
        )

        df, M = _clustered_embeddings(plain_spark, seed=13)
        path = str(tmp_path / "ivfidx_noarrow")
        build_ivf_index(df, path, n_lists=4, n_iter=4, seed=29)
        q = M[3]
        exact = [(r["vec_id"], round(r["cosine"], 9))
                 for r in cosine_topk(df, q, k=8).collect()]
        full = [(r["vec_id"], round(r["cosine"], 9))
                for r in ivf_index_topk(plain_spark, path, q, k=8,
                                        nprobe=4).collect()]
        assert full == exact

    def test_synthetic_transcripts_generator(self, plain_spark):
        """sources.transcripts shards the id range via createDataFrame
        (plain tuples — keep it that way)."""
        from gr_tdigest_spark.sources.transcripts import transcripts_df

        df = transcripts_df(plain_spark, n_convs=50, seed=3)
        assert df.count() > 0

    def test_driver_contract_query_end_to_end(self, plain_spark):
        """The actual failing driver row: __spark_entry__ embed_topk at
        sf0.001 on a default-conversion session must run and agree with
        the IVF cross-check on every row."""
        import __spark_entry__ as entry

        out = entry.queries()["embed_topk"](plain_spark,
                                            "/root/testdata/sf0.001")
        rows = out.collect()
        assert len(rows) > 0
        assert all(r["ivf_exact"] for r in rows)
