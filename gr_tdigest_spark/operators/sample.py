"""Deterministic distributed sampling for training-data pipelines.

Three shapes, all reproducible (the "random" priority is a hash of the
row's id columns — rerunning the job, changing partitioning, or adding
unrelated rows never changes which ids are sampled, unlike
``F.rand``/``df.sample`` whose draws are partition-dependent):

- :func:`uniform_sample` — global top-k by hashed priority.  Plans as
  ``TakeOrderedAndProject``: each partition keeps its local k, only
  k·n_partitions rows reach the driver-side merge — no full sort, no
  shuffle of the data.  The 100 TB shape for "give me 100k random
  rows".
- :func:`stratified_sample` with ``method='sketch'`` (default) — k ids
  per group via the mergeable bottom-k sketch (map-side combinable,
  ≤ k entries of state per group regardless of group size), then a
  semi-join back for the full rows.  A hot group costs the same as a
  cold one — the skew-immune per-group sampler.
- :func:`stratified_sample` with ``method='window'`` — classic
  ``row_number() OVER (PARTITION BY keys ORDER BY priority)``.
  Simpler plan, but the whole of every group flows through one task;
  use it when groups are known-small.

Both stratified methods return exactly ``min(k, group distinct ids)``
rows per group; the two methods draw DIFFERENT (equally uniform)
samples because their priority hashes differ (xxhash64 vs splitmix64).
"""

from __future__ import annotations

from typing import List, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, FloatType, IntegerType, LongType

__all__ = ["sample_priority", "uniform_sample", "stratified_sample"]


def _cols(cols: Union[str, Sequence[str]]) -> List[str]:
    return [cols] if isinstance(cols, str) else list(cols)


def sample_priority(id_cols: Union[str, Sequence[str]],
                    seed: int = 0) -> Column:
    """The deterministic sampling priority: ``xxhash64(id..., seed)``.
    JVM-side, whole-stage-codegen friendly — no Python in the path."""
    return F.xxhash64(*_cols(id_cols), F.lit(int(seed)))


def uniform_sample(df: DataFrame, k: int,
                   id_cols: Union[str, Sequence[str]],
                   seed: int = 0) -> DataFrame:
    """Uniform k-row sample, deterministic in (id_cols, seed).

    ``orderBy(priority).limit(k)`` — Catalyst turns this into
    ``TakeOrderedAndProject`` (per-partition top-k + merge of k-sized
    heads), so no global sort or shuffle materializes.  Ties (only
    possible for duplicate ids) break on the ids themselves."""
    if k <= 0:
        raise ValueError("uniform_sample k must be > 0")
    ids = _cols(id_cols)
    pr = sample_priority(ids, seed)
    return df.orderBy(pr.asc(), *ids).limit(k)


def stratified_sample(df: DataFrame, keys: Union[str, Sequence[str]],
                      k: int, id_col: str, seed: int = 0,
                      method: str = "sketch",
                      broadcast_ids: bool = True) -> DataFrame:
    """k uniformly-sampled rows per group, deterministic in
    (id_col, seed).  ``id_col`` must identify rows within a group
    (duplicates sample once — the sample is over distinct ids).

    method='sketch' (scale path): bottom-k sketch per group → explode
    the ≤ k sampled ids → semi-join the facts.  Partial state is
    bounded by k per group on every executor (map-side combine), so a
    group with 10^9 rows shuffles the same few hundred bytes as a
    group with 10 — no skew hazard.  ``broadcast_ids`` hints the
    (n_groups·k)-row id table into a broadcast hash join; disable when
    n_groups·k is too large to broadcast.

    method='window': row_number over (keys ORDER BY priority) ≤ k —
    every row of a group shuffles to one task; fine for small groups.
    """
    if k <= 0:
        raise ValueError("stratified_sample k must be > 0")
    key_list = _cols(keys)
    if method == "window":
        from pyspark.sql.window import Window

        pr = sample_priority(id_col, seed)
        w = Window.partitionBy(*key_list).orderBy(
            pr.asc(), F.col(id_col).asc()
        )
        return (
            df.withColumn("_sample_rn", F.row_number().over(w))
            .filter(F.col("_sample_rn") <= k)
            .drop("_sample_rn")
        )
    if method != "sketch":
        raise ValueError(
            f"stratified_sample method must be sketch/window, got {method!r}"
        )
    from gr_tdigest_spark.operators.companions import (
        bottomk_agg, bottomk_sample,
    )

    dt = df.schema[id_col].dataType
    if isinstance(dt, (IntegerType, LongType)):
        sample_dtype = "long"
    elif isinstance(dt, (FloatType, DoubleType)):
        sample_dtype = "double"
    else:
        sample_dtype = "string"
    sk = bottomk_agg(
        df.select(*key_list, id_col), key_list, id_col, k=k, seed=seed
    )
    ids = sk.select(
        *key_list,
        F.explode(bottomk_sample("bottomk", sample_dtype)).alias(id_col),
    )
    if sample_dtype != "string":
        ids = ids.withColumn(id_col, F.col(id_col).cast(dt))
    if broadcast_ids:
        ids = F.broadcast(ids)
    return df.join(ids, on=key_list + [id_col], how="leftsemi")
