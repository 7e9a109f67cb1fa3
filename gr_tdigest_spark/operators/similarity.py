"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force cosine top-k against a constant query
  vector. The dot product / norm are built-in higher-order functions
  (``aggregate``/``zip_with``) — JVM-side, codegen'd, no Python.
- ``lsh_bucket_topk``: the scale path — random-hyperplane LSH buckets
  prune the scan to matching buckets (probing the query's bucket and
  optional multi-probe neighbors).
- ``embedding_near_dup_pairs``: all-pairs near-duplicates via LSH
  buckets + exact cosine verification.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType

__all__ = [
    "cosine_sim_col",
    "cosine_topk",
    "lsh_bucket_topk",
    "embedding_near_dup_pairs",
    "build_ann_index",
    "append_to_ann_index",
    "ann_index_topk",
    "ann_index_topk_batch",
    "build_ivf_index",
    "append_to_ivf_index",
    "ivf_index_topk",
    "ivf_index_topk_batch",
]

# Above these sizes the inline-literal Catalyst expressions stop being
# a win: every hyperplane inlines `dim` literals, so dim=768 ×
# n_planes=16 would put ~12k literal nodes in the plan — analysis and
# codegen blow up long before data volume matters. The pandas-UDF path
# holds the plane matrix in the closure (broadcast with the task) and
# does one numpy matmul per Arrow batch instead.
_MAX_INLINE_LITERALS = 2048


def _vec_matrix(vecs: pd.Series) -> np.ndarray:
    """Arrow list column → (rows × dim) float64 matrix. Element-wise
    cast to double first — same semantics as the expression path's
    ``x.cast("double")``."""
    return np.asarray(
        [np.asarray(v, dtype=np.float64) for v in vecs], dtype=np.float64
    )


def _null_nonfinite(out: np.ndarray) -> pd.Series:
    """Non-finite cosines (zero-norm vectors: 0/0 → NaN, x/0 → ±inf)
    become SQL NULL, matching the expression path (Spark's double
    division by zero yields NULL).  Spark sorts NaN GREATER than every
    double, so a raw NaN would outrank all real hits in a desc top-k —
    NULLs instead sort last, so degenerate vectors can never displace
    real neighbors."""
    res = pd.array(out, dtype="Float64")
    res[~np.isfinite(out)] = pd.NA
    return pd.Series(res)


def _dot_const(vec_col: Column, q: Sequence[float]) -> Column:
    qarr = F.array(*[F.lit(float(x)) for x in q])
    return F.aggregate(
        F.zip_with(vec_col, qarr, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(vec_col: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            vec_col, F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_sim_col(vec_col: Column, query: Sequence[float]) -> Column:
    """Cosine similarity of an array column against a constant query.

    Small dims run as built-in expressions (JVM, codegen'd); above
    ``_MAX_INLINE_LITERALS`` query elements the constant would bloat
    the plan, so a closure-held numpy matvec per Arrow batch takes
    over (one BLAS call per batch, not per row)."""
    q = np.asarray(query, dtype=np.float64)
    if q.size <= _MAX_INLINE_LITERALS:
        qn = math.sqrt(float(q @ q))
        # try_divide: zero-norm vectors give NULL cosine (sorts LAST in
        # a desc top-k) — a plain `/` THROWS under ANSI mode (Spark 4
        # default).  nanvl: a NaN vector ELEMENT propagates NaN through
        # the dot product past try_divide, and Spark sorts NaN FIRST
        # under desc — mask it to NULL like the pandas path does, so
        # both paths agree that degenerate vectors sort last
        return F.nanvl(
            F.try_divide(
                _dot_const(vec_col, query), _norm(vec_col) * F.lit(qn)
            ),
            F.lit(None).cast("double"),
        )

    qn = math.sqrt(float(q @ q))

    @F.pandas_udf(DoubleType())
    def _cos(vecs: pd.Series) -> pd.Series:
        M = _vec_matrix(vecs)
        norms = np.linalg.norm(M, axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            out = (M @ q) / (norms * qn)
        return _null_nonfinite(out)

    return _cos(vec_col)


def cosine_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k (the exact baseline). Catalyst plans this
    as a TakeOrderedAndProject — no global sort materialization."""
    return (
        df.select(
            F.col(id_col),
            cosine_sim_col(F.col(vec_col), query).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _multiprobe_bits(qbits: int, n_planes: int, multiprobe: int) -> set:
    """The probe set for a hyperplane bucket id: the bucket itself
    plus every bucket within ``multiprobe`` sign-bit flips (0, 1, or 2
    supported — near-boundary neighbors land one flipped sign away)."""
    probe = {qbits}
    if multiprobe >= 1:
        for i in range(n_planes):
            probe.add(qbits ^ (1 << i))
    if multiprobe >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probe.add(qbits ^ (1 << i) ^ (1 << j))
    return probe


def _bucket_expr(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket id from random hyperplanes — built-in exprs for
    small plane matrices, one numpy matmul per Arrow batch otherwise
    (inlining dim × n_planes literals into the plan does not survive
    real embedding dims; see _MAX_INLINE_LITERALS)."""
    if planes.size <= _MAX_INLINE_LITERALS:
        bits = []
        for i, p in enumerate(planes):
            dot = _dot_const(vec_col, p.tolist())
            bits.append(F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    P = np.ascontiguousarray(planes.T)  # (dim × n_planes)
    pow2 = (np.int64(1) << np.arange(planes.shape[0], dtype=np.int64))

    @F.pandas_udf(LongType())
    def _b(vecs: pd.Series) -> pd.Series:
        M = _vec_matrix(vecs)
        return pd.Series(((M @ P) >= 0.0) @ pow2)

    return _b(vec_col)


def lsh_bucket_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 23,
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: scan only rows whose random-hyperplane bucket
    is within ``multiprobe`` bit flips of the query's bucket. At 100 TB
    the bucket column should be precomputed + partitioned-by; here it is
    derived inline."""
    q = np.asarray(query, dtype=np.float64)
    planes = _hyperplanes(q.size, n_planes, seed)
    qbits = int(sum((1 << i) for i, p in enumerate(planes) if p @ q >= 0))
    probe = _multiprobe_bits(qbits, n_planes, multiprobe)
    bucketed = df.withColumn("__bucket", _bucket_expr(F.col(vec_col), planes))
    pruned = bucketed.where(F.col("__bucket").isin(list(probe)))
    return cosine_topk(pruned, query, k, vec_col, id_col)


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 10,
    seed: int = 23,
    max_bucket_size: Optional[int] = 10_000,
    persist_signatures: bool = True,
) -> DataFrame:
    """Embedding near-duplicate pairs: bucket with random hyperplanes,
    self-join within buckets, verify with exact cosine ≥ threshold.
    (High-cosine pairs land in the same bucket with probability
    (1 − θ/π)^n_planes — pair recall is tunable via n_planes.)

    ``max_bucket_size`` sub-splits degenerate buckets (mass-duplicated
    embeddings) to bound the self-join; ``None`` disables.
    ``persist_signatures`` caches the bucketed table in the skew
    guard's one-slot cache so the bucket matmul evaluates once (size
    aggregate + both self-join sides otherwise recompute it) — the
    cached table is SKINNY (id, bucket): candidate pairs are generated
    without the vectors, which join back per pair for the exact-cosine
    verification (the minhash family's text-join-back shape)."""
    from gr_tdigest_spark.operators.skew import subsplit_oversized_buckets

    sample_dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(sample_dim, n_planes, seed)
    base = df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    )
    b = base.select(
        "__id", _bucket_expr(F.col("__v"), planes).alias("__bucket")
    )
    b = subsplit_oversized_buckets(
        b, ["__bucket"], "__id", max_bucket_size,
        persist_slot="embed" if persist_signatures else None,
    )
    l, r = b.alias("l"), b.alias("r")
    cands = l.join(
        r,
        (F.col("l.__bucket") == F.col("r.__bucket"))
        & (F.col("l.__sub") == F.col("r.__sub"))
        & (F.col("l.__id") < F.col("r.__id")),
    ).select(F.col("l.__id").alias("a"), F.col("r.__id").alias("b"))
    va = base.select(F.col("__id").alias("a"), F.col("__v").alias("__va"))
    vb = base.select(F.col("__id").alias("b"), F.col("__v").alias("__vb"))
    pairs = cands.join(va, "a").join(vb, "b")
    dot = F.aggregate(
        F.zip_with(
            F.col("__va"), F.col("__vb"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # try_divide, not `/`: a zero-norm vector inside a bucket would
    # otherwise abort the whole job under ANSI mode (Spark 4 default);
    # nanvl: a NaN vector element gives NaN cosine, and Spark treats
    # NaN >= threshold as TRUE (NaN is greater than any double), which
    # would emit spurious pairs — NULL fails the predicate instead
    cos = F.nanvl(
        F.try_divide(dot, _norm(F.col("__va")) * _norm(F.col("__vb"))),
        F.lit(None).cast("double"),
    )
    return (
        pairs.select("a", "b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def build_ann_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 16,
    seed: int = 23,
) -> None:
    """Persist an LSH-bucketed ANN index: rows written PARTITIONED BY
    their hyperplane bucket, planes persisted alongside. This is the
    100 TB shape the inline `lsh_bucket_topk` approximates: queries
    touch only the probed buckets' files via parquet partition pruning
    (`PartitionFilters` in the scan), so query cost scales with bucket
    selectivity, not corpus size."""
    import pandas as pd

    dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    b = df.withColumn("bucket", _bucket_expr(F.col(vec_col), planes))
    b.write.partitionBy("bucket").mode("overwrite").parquet(path)
    spark = df.sparkSession
    # Plain Python rows: numpy scalars/arrays are rejected by the
    # non-Arrow createDataFrame row verifier, and the library must not
    # assume the caller's session enables Arrow conversion.
    plane_rows = [(i, planes[i].tolist()) for i in range(n_planes)]
    spark.createDataFrame(
        plane_rows, schema="plane_id long, vec array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}_planes")


def append_to_ann_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
) -> None:
    """Append new vectors to a persisted hyperplane index with the
    FROZEN stored planes — the daily-ingest twin of
    :func:`append_to_ivf_index`.

    Bucket assignment is the identical sign-bit expression the builder
    uses, re-instantiated from the ``_planes`` table, and rows land in
    their ``bucket=`` partition directories with ``mode('append')`` —
    existing partitions and the plane table are untouched, so
    concurrent readers keep partition-pruning correctly and an
    appended index EQUALS rebuilding on the union (hyperplanes are
    data-independent, so unlike IVF there is no drift to manage: the
    appended layout is exactly the rebuilt layout, forever).  The
    caller owns id uniqueness across appends (append never
    deduplicates)."""
    spark = df.sparkSession
    prows = spark.read.parquet(f"{path}_planes").collect()
    if not prows:
        raise ValueError(
            f"append_to_ann_index: no hyperplanes at {path}_planes — "
            "build the index first"
        )
    planes = np.asarray(
        [list(r["vec"]) for r in
         sorted(prows, key=lambda r: r["plane_id"])],
        dtype=np.float64,
    )
    # an append with mismatched columns OR dtypes would write
    # mixed-schema partitions that only surface as confusing read-time
    # errors later
    existing = {
        f.name: f.dataType for f in spark.read.parquet(path).schema
        if f.name != "bucket"
    }
    incoming = {f.name: f.dataType for f in df.schema}
    if incoming != existing:
        raise ValueError(
            "append_to_ann_index: appended schema "
            f"{sorted((k, str(v)) for k, v in incoming.items())} does "
            "not match the index schema "
            f"{sorted((k, str(v)) for k, v in existing.items())}"
        )
    b = df.withColumn("bucket", _bucket_expr(F.col(vec_col), planes))
    b.write.partitionBy("bucket").mode("append").parquet(path)


def ann_index_topk(
    spark,
    path: str,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    multiprobe: int = 1,
) -> DataFrame:
    """Top-k against a persisted ANN index: compute the query's probe
    buckets from the stored planes, scan ONLY those partitions
    (partition pruning), exact cosine rank inside them."""
    rows = sorted(
        spark.read.parquet(f"{path}_planes").collect(),
        key=lambda r: r["plane_id"],
    )
    planes = np.asarray([list(r["vec"]) for r in rows], dtype=np.float64)
    n_planes = planes.shape[0]
    q = np.asarray(query, dtype=np.float64)
    qbits = int(sum(
        (1 << i) for i, p in enumerate(planes) if p @ q >= 0
    ))
    probe = _multiprobe_bits(qbits, n_planes, multiprobe)
    pruned = spark.read.parquet(path).where(
        F.col("bucket").isin(sorted(probe))
    )
    return cosine_topk(pruned, query, k, vec_col, id_col)


def _kmeans_fit(
    x: np.ndarray, n_lists: int, n_iter: int, seed: int
) -> np.ndarray:
    """Deterministic spherical k-means on L2-normalized vectors
    (classic IVF coarse quantizer). Seeded UNIFORM initialization
    (distinct sample rows from a seeded RNG — simple and reproducible;
    not k-means++ distance weighting); empty clusters keep their
    previous centroid. Returns (n_lists, dim) normalized centroids."""
    if x.ndim != 2 or x.shape[0] == 0:
        raise ValueError(
            "IVF k-means needs a non-empty 2-D training matrix "
            f"(got shape {x.shape})"
        )
    rng = np.random.default_rng(seed)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    xn = x / np.where(norms > 0, norms, 1.0)
    n = xn.shape[0]
    k = min(n_lists, n)
    centers = xn[rng.choice(n, size=k, replace=False)].copy()
    for _ in range(n_iter):
        assign = np.argmax(xn @ centers.T, axis=1)
        for j in range(k):
            members = xn[assign == j]
            if members.shape[0]:
                c = members.mean(axis=0)
                nrm = np.linalg.norm(c)
                if nrm > 0:
                    centers[j] = c / nrm
    return centers


def _ivf_assign_udf(centers: np.ndarray, list_ids: np.ndarray):
    """Nearest-centroid list assignment as one numpy matmul per Arrow
    batch; ``list_ids[argmax]`` maps positions back to stored list ids
    (the matrices ride in the closure, broadcast with the task)."""

    @F.pandas_udf(LongType())
    def _assign(vecs: pd.Series) -> pd.Series:
        m = _vec_matrix(vecs)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        mn = m / np.where(norms > 0, norms, 1.0)
        idx = np.argmax(mn @ centers.T, axis=1)
        return pd.Series(list_ids[idx])

    return _assign


def build_ivf_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_lists: int = 64,
    n_iter: int = 10,
    train_size: Optional[int] = None,
    seed: int = 29,
) -> None:
    """Persist an IVF (inverted-file) ANN index — the k-means twin of
    :func:`build_ann_index`: a coarse spherical-k-means quantizer is
    fit on a DETERMINISTIC bounded sample (operators.sample.
    uniform_sample — hash priorities, so rebuilding the index on the
    same data reproduces it bit-for-bit), every vector is assigned to
    its nearest centroid list via one numpy matmul per Arrow batch,
    and rows are written PARTITIONED BY list id with the centroids
    alongside. Queries probe the ``nprobe`` nearest lists only —
    parquet partition pruning makes query cost scale with probed-list
    selectivity, not corpus size, exactly like the LSH index but with
    data-adaptive regions (IVF wins when the corpus is clustered;
    hyperplanes win on uniform data)."""
    from gr_tdigest_spark.operators.sample import uniform_sample

    # NULL embeddings carry no position — drop them up front (an ANN
    # index entry for a NULL vector is meaningless, and a None inside
    # the training matrix would crash the numpy paths mid-job)
    df = df.where(F.col(vec_col).isNotNull())
    cap = train_size if train_size is not None else n_lists * 64
    train = uniform_sample(
        df.select(id_col, vec_col), cap, id_col, seed=seed
    ).collect()
    if not train:
        raise ValueError(
            "build_ivf_index: no non-NULL embeddings to train on"
        )
    x = np.asarray([list(r[vec_col]) for r in train], dtype=np.float64)
    centers = _kmeans_fit(x, n_lists, n_iter, seed)
    assign = _ivf_assign_udf(
        centers, np.arange(centers.shape[0], dtype=np.int64)
    )
    assigned = df.withColumn("list_id", assign(F.col(vec_col)))
    assigned.write.partitionBy("list_id").mode("overwrite").parquet(path)
    spark = df.sparkSession
    # Plain Python rows — see build_ann_index: must work with Arrow
    # conversion disabled (foreign sessions don't set it).
    center_rows = [
        (i, centers[i].tolist()) for i in range(centers.shape[0])
    ]
    spark.createDataFrame(
        center_rows, schema="list_id long, vec array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}_centroids")


def append_to_ivf_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
) -> None:
    """Append new vectors to a persisted IVF index with the FROZEN
    stored centroids — the daily-ingest shape (a full
    :func:`build_ivf_index` rebuild re-reads the whole corpus).

    Each new vector is assigned to its nearest STORED centroid (the
    same one-matmul-per-Arrow-batch assignment the builder uses) and
    written into the matching ``list_id`` partition directories with
    ``mode('append')`` — existing partitions and the centroid table
    are untouched, so concurrent readers keep pruning correctly and an
    appended index is IDENTICAL to rebuilding on the union with the
    same frozen centroids.

    Drift policy: appending never re-fits the quantizer.  Frozen
    centroids keep every existing row's partition valid; if the corpus
    distribution drifts far from the training sample, probed-list
    recall degrades gracefully (exactness at ``nprobe == n_lists`` is
    unaffected) — re-fit by rebuilding with :func:`build_ivf_index`.
    The caller owns id uniqueness across appends (append never
    deduplicates)."""
    spark = df.sparkSession
    crows = spark.read.parquet(f"{path}_centroids").collect()
    if not crows:
        raise ValueError(
            f"append_to_ivf_index: no centroids at {path}_centroids — "
            "build the index first"
        )
    order = sorted(crows, key=lambda r: r["list_id"])
    centers = np.asarray([list(r["vec"]) for r in order], dtype=np.float64)
    list_ids = np.asarray(
        [int(r["list_id"]) for r in order], dtype=np.int64
    )
    new = df.where(F.col(vec_col).isNotNull())
    assign = _ivf_assign_udf(centers, list_ids)
    new.withColumn("list_id", assign(F.col(vec_col))).write.partitionBy(
        "list_id"
    ).mode("append").parquet(path)


def ivf_index_topk(
    spark,
    path: str,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nprobe: int = 4,
) -> DataFrame:
    """Top-k against a persisted IVF index: rank the stored centroids
    against the query on the driver (n_lists dot products), scan ONLY
    the ``nprobe`` nearest lists (partition pruning), exact cosine
    rank inside them. ``nprobe == n_lists`` degrades gracefully to the
    exact brute-force answer."""
    rows = spark.read.parquet(f"{path}_centroids").collect()
    centers = {int(r["list_id"]): np.asarray(r["vec"]) for r in rows}
    q = np.asarray(query, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    ranked = sorted(centers, key=lambda j: -(centers[j] @ qn))
    probe = sorted(ranked[: max(nprobe, 1)])
    pruned = spark.read.parquet(path).where(F.col("list_id").isin(probe))
    return cosine_topk(pruned, query, k, vec_col, id_col)


def _cos_pair_col(a: Column, b: Column) -> Column:
    """Row-wise cosine between TWO array columns (the batch-ANN join
    shape).  Arrow-batched numpy: one einsum per batch, never per-row
    Python."""

    @F.pandas_udf(DoubleType())
    def _cos(av: pd.Series, bv: pd.Series) -> pd.Series:
        A, B = _vec_matrix(av), _vec_matrix(bv)
        na = np.linalg.norm(A, axis=1)
        nb = np.linalg.norm(B, axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            out = np.einsum("ij,ij->i", A, B) / (na * nb)
        return _null_nonfinite(out)

    return _cos(a, b)


def ivf_index_topk_batch(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nprobe: int = 4,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Batched top-k against a persisted IVF index — the realistic
    100 TB shape (per-query :func:`ivf_index_topk` calls would pay one
    Spark job per query).

    ``queries`` is a DataFrame ``(query_id_col, query_vec_col)``.  Per
    query, the ``nprobe`` nearest centroid lists are computed
    DISTRIBUTED (a pandas UDF over the query table — the centroid
    matrix, n_lists x dim, rides in the closure), the index scan is
    pruned to the UNION of all probed lists (partition pruning: the
    probed-list collect is bounded by n_lists, never by Q or corpus
    size), probe pairs join the pruned rows on ``list_id``, cosine runs
    as one einsum per Arrow batch, and a per-query window keeps the
    top k.  ``nprobe == n_lists`` degrades to exact brute force for
    every query.

    ``broadcast_queries`` hints the (Q*nprobe)-row probe table (each
    row carries the query vector, ~8*dim bytes) into a broadcast hash
    join; disable when Q*nprobe*dim is too large to broadcast — the
    join then shuffles on ``list_id``, which still scales (each probed
    list's rows meet only the queries probing it).

    Result: one row per (query, hit): ``query_id_col, id_col, cosine``,
    at most k hits per query; the per-query window's candidate set is
    bounded by the probed lists' sizes, never the corpus.

    Caller contract: ``query_id_col`` identifies one query vector.
    NULL query vectors are skipped; exact duplicate (id, vec) rows are
    collapsed before probing (upstream join fan-out would otherwise
    double every hit); one id carrying two DIFFERENT vectors is a
    caller bug the function cannot detect cheaply.  The probe table is
    materialized PER CALL (eager localCheckpoint, bounded at
    Q·nprobe rows): the probed-list pruning and the probe join read
    the same materialized rows, so interleaved or concurrent calls on
    one driver never invalidate each other and the probe UDF runs
    once.  (Local checkpoints are not resilient to executor loss —
    the job fails rather than silently recomputing; ``queries`` should
    still be deterministic per the library-wide contract.)
    """
    from pyspark.sql.types import ArrayType, LongType

    crows = spark.read.parquet(f"{path}_centroids").collect()
    centers = np.asarray(
        [r["vec"] for r in sorted(crows, key=lambda r: r["list_id"])],
        dtype=np.float64,
    )
    list_ids = np.asarray(
        sorted(int(r["list_id"]) for r in crows), dtype=np.int64
    )
    npb = max(1, min(int(nprobe), centers.shape[0]))
    norms = np.linalg.norm(centers, axis=1, keepdims=True)
    cn = centers / np.where(norms > 0, norms, 1.0)

    @F.pandas_udf(ArrayType(LongType()))
    def _probes(vecs: pd.Series) -> pd.Series:
        M = _vec_matrix(vecs)
        qnorms = np.linalg.norm(M, axis=1, keepdims=True)
        Mn = M / np.where(qnorms > 0, qnorms, 1.0)
        sims = Mn @ cn.T
        # top-npb lists per query, deterministic tie order by list id
        order = np.argsort(-sims, axis=1, kind="stable")[:, :npb]
        return pd.Series([list_ids[row].tolist() for row in order])

    return _batch_probe_topk(
        spark, path, queries, _probes, "list_id", k, vec_col, id_col,
        query_id_col, query_vec_col, broadcast_queries,
    )


def _batch_probe_topk(spark, path, queries, probes_udf, part_col: str,
                      k: int, vec_col: str, id_col: str,
                      query_id_col: str, query_vec_col: str,
                      broadcast_queries: bool) -> DataFrame:
    """Shared tail of the batched index top-k operators
    (:func:`ivf_index_topk_batch`, :func:`ann_index_topk_batch`):
    NULL/duplicate query hygiene, per-query probe explosion via
    ``probes_udf``, per-call probe materialization, union-of-probes
    partition pruning, einsum cosine, bounded per-query window."""
    from pyspark.sql.window import Window

    qsrc = (
        queries.select(query_id_col, query_vec_col)
        .where(F.col(query_vec_col).isNotNull())
        .distinct()
    )
    probe_pairs = qsrc.select(
        F.col(query_id_col), F.col(query_vec_col),
        F.explode(probes_udf(F.col(query_vec_col))).alias(part_col),
    )
    # per-call materialization (replaces r5's module-global one-slot
    # persist, which let a second call unpersist the first's probes
    # mid-use and was not thread-safe): eager localCheckpoint computes
    # the probe UDF exactly once and truncates lineage, so the pruning
    # collect below and the probe join consume the SAME materialized
    # rows; the blocks are released when this DataFrame is
    # garbage-collected (ContextCleaner), no global state
    probe_pairs = probe_pairs.localCheckpoint(eager=True)
    # partition pruning: the probed-partition union is bounded by the
    # index geometry (n_lists for IVF, 2^n_planes for the hyperplane
    # index), never by Q or corpus size
    probed = sorted(
        r[part_col]
        for r in probe_pairs.select(part_col).distinct().collect()
    )
    pruned = spark.read.parquet(path).where(F.col(part_col).isin(probed))
    pairs = F.broadcast(probe_pairs) if broadcast_queries else probe_pairs
    scored = pruned.join(pairs, part_col).select(
        query_id_col, id_col,
        _cos_pair_col(F.col(vec_col), F.col(query_vec_col)).alias("cosine"),
    )
    win = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(win))
        .where(F.col("__rn") <= int(k))
        .drop("__rn")
    )


def ann_index_topk_batch(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    multiprobe: int = 1,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Batched top-k against a persisted hyperplane LSH index — the
    twin of :func:`ivf_index_topk_batch` for :func:`build_ann_index`
    indexes (per-query :func:`ann_index_topk` calls pay one Spark job
    per query).

    Per query, the hyperplane bucket and its ``multiprobe`` bit-flip
    neighbors are computed DISTRIBUTED (a pandas UDF over the query
    table — the plane matrix rides in the closure, one matmul per
    Arrow batch), the index scan is pruned to the UNION of all probed
    buckets (partition pruning; the probed-bucket collect is bounded
    by the bucket space 2^n_planes — indexes are built with small
    n_planes, never by Q or corpus size), probe pairs join the pruned
    rows on ``bucket``, cosine runs as one einsum per Arrow batch, and
    a per-query window keeps the top k.

    Shares :func:`ivf_index_topk_batch`'s caller contract (NULL query
    vectors skipped, exact duplicate query rows collapsed, per-call
    probe materialization) and its ``broadcast_queries`` trade-off.
    Result: ``query_id_col, id_col, cosine`` — at most k hits per
    query, identical to per-query :func:`ann_index_topk` at the same
    ``multiprobe``.
    """
    from pyspark.sql.types import ArrayType, LongType

    rows = sorted(
        spark.read.parquet(f"{path}_planes").collect(),
        key=lambda r: r["plane_id"],
    )
    planes = np.asarray([list(r["vec"]) for r in rows], dtype=np.float64)
    n_planes = planes.shape[0]
    P = np.ascontiguousarray(planes.T)
    pow2 = (np.int64(1) << np.arange(n_planes, dtype=np.int64))
    mp = int(multiprobe)

    @F.pandas_udf(ArrayType(LongType()))
    def _probes(vecs: pd.Series) -> pd.Series:
        M = _vec_matrix(vecs)
        bits = ((M @ P) >= 0.0) @ pow2
        return pd.Series([
            sorted(_multiprobe_bits(int(qb), n_planes, mp))
            for qb in bits.tolist()
        ])

    return _batch_probe_topk(
        spark, path, queries, _probes, "bucket", k, vec_col, id_col,
        query_id_col, query_vec_col, broadcast_queries,
    )
