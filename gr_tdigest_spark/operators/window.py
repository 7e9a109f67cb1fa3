"""Per-row group-sketch attachment — the Spark analogue of Polars
``tdigest(...).over(g)`` / ``quantile(...).over(g)``
(reference __init__.py:643-656, test_contract_behavior.py:200-254).

Digest state is far too heavy for Spark ``Window`` frames, so the
idiomatic plan is: aggregate once per group, evaluate the query on the
(tiny) digest table, then **broadcast-join the scalar result back onto
the rows** — Catalyst picks a broadcast hash join, so no shuffle of the
fact table.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

import gr_tdigest_spark.functions as Fn
from gr_tdigest_spark.operators.agg import tdigest_agg

__all__ = ["with_group_quantile", "with_group_cdf"]


def with_group_quantile(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    q: float,
    out_col: Optional[str] = None,
    **cfg,
) -> DataFrame:
    """Attach each group's quantile-q of ``value_col`` to every row —
    ``quantile(tdigest(x), q).over(keys)``."""
    out_col = out_col or f"q{q}_{value_col}"
    digests = tdigest_agg(df, list(keys), value_col, **cfg)
    scalars = digests.select(
        *keys, Fn.tdigest_quantile("tdigest", q).alias(out_col)
    )
    return df.join(F.broadcast(scalars), list(keys), "left")


def with_group_cdf(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    probe_col: Optional[str] = None,
    out_col: str = "cdf",
    **cfg,
) -> DataFrame:
    """Attach the group's CDF evaluated at each row's own value (or at
    ``probe_col``) — ``cdf(tdigest(x), probe).over(keys)``. The digest
    table is broadcast; the per-row probe runs vectorized."""
    probe_col = probe_col or value_col
    digests = tdigest_agg(df, list(keys), value_col, **cfg)
    joined = df.join(F.broadcast(digests), list(keys), "left")
    return joined.withColumn(
        out_col, Fn.tdigest_cdf_col(F.col("tdigest"), F.col(probe_col))
    ).drop("tdigest")
