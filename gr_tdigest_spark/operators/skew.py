"""Skew guards for bucketed self-joins.

Every LSH-family candidate generator (MinHash bands, simhash blocks,
hyperplane buckets) self-joins within a bucket, producing |B|²/2
candidate rows for a bucket of size |B|. At web scale a single
degenerate bucket — millions of near-identical boilerplate documents —
turns that join quadratic and OOMs the stage. These helpers bound the
fan-out.

``subsplit_oversized_buckets`` splits any bucket larger than
``max_bucket_size`` into ``ceil(size / max_bucket_size)`` sub-buckets
by a secondary hash of the row id. Pairs inside a sub-bucket are kept;
pairs straddling sub-buckets of an oversized bucket are dropped — a
bounded, documented recall loss confined to degenerate buckets (which
in practice are exact boilerplate already caught by exact dedup).
Per-bucket join fan-out is then ≤ ~max_bucket_size²/2 per sub-bucket.

The size computation is one aggregate + join co-partitioned with the
self-join's own shuffle key. NOTE: it re-evaluates the banded plan
once more — at real scale persist the banded/signature table first
(the signature UDF is the expensive part, not the join).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["subsplit_oversized_buckets", "oversized_buckets"]


def subsplit_oversized_buckets(
    banded: DataFrame,
    bucket_cols: Sequence[str],
    salt_col: str,
    max_bucket_size: Optional[int],
    sub_col: str = "__sub",
) -> DataFrame:
    """Append ``sub_col`` so self-join conditions can add
    ``l.sub == r.sub``: 0 everywhere for buckets within the cap,
    a secondary-hash split label for oversized ones."""
    if not max_bucket_size:
        return banded.withColumn(sub_col, F.lit(0).cast("long"))
    sizes = banded.groupBy(*bucket_cols).agg(F.count("*").alias("__bsz"))
    return (
        banded.join(sizes, list(bucket_cols))
        .withColumn(
            sub_col,
            F.when(
                F.col("__bsz") <= max_bucket_size, F.lit(0).cast("long")
            ).otherwise(
                F.pmod(
                    F.xxhash64(F.col(salt_col)),
                    F.ceil(F.col("__bsz") / F.lit(max_bucket_size)),
                )
            ),
        )
        .drop("__bsz")
    )


def oversized_buckets(
    banded: DataFrame,
    bucket_cols: Sequence[str],
    max_bucket_size: int,
) -> DataFrame:
    """Observability companion: the buckets the guard will split, with
    their sizes — the 'dropped recall' report a pipeline should log."""
    return (
        banded.groupBy(*bucket_cols)
        .agg(F.count("*").alias("bucket_size"))
        .where(F.col("bucket_size") > max_bucket_size)
    )
