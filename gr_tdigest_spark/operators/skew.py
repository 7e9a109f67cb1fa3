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
self-join's own shuffle key. Without ``persist_slot`` it re-evaluates
the banded plan once more — the signature UDF (the expensive part,
not the join) then runs for the size aggregate AND both self-join
sides; pass a slot to evaluate it once.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["subsplit_oversized_buckets", "oversized_buckets"]

# one-slot-per-operator-family caches for banded/signature tables
# (the winnow-cache pattern): each new call with the same slot evicts
# the previous call's cache, so a long-lived session holds at most one
# cached signature table per family.  PERF only — never a consistency
# mechanism (signatures are deterministic by the module contract).
_BANDED_CACHE: dict = {}


def _one_slot_persist(df: DataFrame, slot: str) -> DataFrame:
    prev = _BANDED_CACHE.get(slot)
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:
            pass
    df = df.persist()
    _BANDED_CACHE[slot] = df
    return df


def subsplit_oversized_buckets(
    banded: DataFrame,
    bucket_cols: Sequence[str],
    salt_col: str,
    max_bucket_size: Optional[int],
    sub_col: str = "__sub",
    persist_slot: Optional[str] = None,
) -> DataFrame:
    """Append ``sub_col`` so self-join conditions can add
    ``l.sub == r.sub``: 0 everywhere for buckets within the cap,
    a secondary-hash split label for oversized ones.

    ``persist_slot`` (a short operator-family key, e.g. ``'minhash'``)
    persists the banded table in a one-slot-per-key cache BEFORE the
    size aggregate, so the expensive signature plan underneath is
    evaluated once instead of three times (size aggregate + both
    self-join sides).  The cache is evicted by the family's next call."""
    if persist_slot is not None:
        banded = _one_slot_persist(banded, persist_slot)
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
