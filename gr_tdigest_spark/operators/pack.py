"""Deterministic sequence packing for training-data pipelines.

Pretraining dataloaders concatenate documents into fixed-size context
windows ("packing").  The upstream job is assigning every document to a
pack so that each pack holds ~``max_tokens`` tokens — at 100 TB this
must be a distributed, deterministic, one-pass assignment, not a
driver-side bin packer.

:func:`pack_sequences` offers two packing rules.  ``method='offset'``
(default) is the streaming rule used by block-concatenation
dataloaders: documents are laid out in a deterministic order, the
running token offset is computed with a window cumulative sum, and a
document belongs to the pack its STARTING offset falls in::

    pack_slot = floor((cumsum(tokens) - tokens) / max_tokens)

``method='nextfit'`` is the NO-SPLIT rule (SFT-style examples that
must not straddle a boundary): walk the same layout order, close the
open pack when the next doc would overflow — every pack total is
≤ ``max_tokens`` EXACTLY, and docs longer than ``max_tokens`` get a
NULL pack instead of a slot.

Properties (all tested; the straddle/under-fill bounds below are the
offset method's — nextfit trades them for the strict budget):

- Deterministic in (ids, seed) and partition-layout independent — the
  layout order is the hashed-id priority (``sample_priority``), never
  physical row order.
- Every pack's token total is < ``max_tokens`` + the longest document
  in it (a document that straddles a boundary is assigned to the pack
  it starts in — the dataloader splits it across the boundary, exactly
  like block concatenation).  Packs other than a bucket's last are
  never UNDER-full below ``max_tokens − max_doc``.
- Scale shape: packing runs WITHIN hash buckets (``n_buckets``, or the
  caller's ``keys``), so each cumulative-sum window covers ~1/n_buckets
  of the data and buckets proceed in parallel.  A single global window
  would serialize 100 TB through one task — refuse that plan shape by
  construction (``n_buckets`` is required when ``keys`` is None).
  Pack identity is (bucket, slot), exposed as separate columns plus a
  single ``pack_id`` string.

The reference engine has no packing operator; this extends the
training-data family (SURVEY §2.8's "beyond the reference" charter)
with the same determinism contract as operators/sample.py.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gr_tdigest_spark.operators.sample import _cols, sample_priority

__all__ = ["pack_sequences"]

# two distinct hash domains (module rule, see sample.py:76-81):
# composing pack_sequences with uniform_sample/stratified_sample at the
# SAME seed must not correlate — with a shared domain the "uniformly
# sampled" docs would be exactly the docs laid out first in each bucket
_PACK_SALT = 0x9ACC        # bucket assignment
_PACK_ORDER_SALT = 0x97DE  # layout order inside a bucket


def pack_sequences(
    df: DataFrame,
    id_cols: Union[str, Sequence[str]],
    count_col: str,
    max_tokens: int,
    n_buckets: Optional[int] = None,
    keys: Union[None, str, Sequence[str]] = None,
    seed: int = 0,
    out_col: str = "pack_id",
    method: str = "offset",
) -> DataFrame:
    """Assign every row to a token-budgeted pack, deterministically.

    Two packing rules:

    - ``method='offset'`` (default): block-concatenation semantics —
      a document belongs to the pack its starting offset falls in; a
      boundary doc straddles (the dataloader splits it).  Pure JVM
      window cumsum, zero Python in the path.
    - ``method='nextfit'``: NO-SPLIT semantics (SFT-style examples
      that must not straddle a boundary) — walk the bucket's layout
      order, close the open pack whenever the next doc would overflow
      ``max_tokens``.  Every pack total is ≤ ``max_tokens`` exactly;
      docs LONGER than ``max_tokens`` get a NULL pack (flag upstream).
      Runs as one Arrow batch pass per bucket (``applyInPandas`` on
      the same bucket partitioning), so the scale shape is unchanged:
      per-bucket work, never a global pass.

    ``count_col`` is the row's token count (int); rows with NULL or
    non-positive counts are passed through with a NULL pack (they carry
    no tokens to pack — filter or impute upstream).  ``keys`` packs
    within caller groups (e.g. per language); ``n_buckets``
    hash-buckets the ids so no window spans more than ~1/n_buckets of
    the data.  The two COMPOSE: with both, packing runs per
    (key-group, sub-bucket), so a hot key group (80% of the corpus in
    one language) still never serializes through one task — pass
    ``n_buckets`` whenever key groups can be large.  Output adds
    ``__pack_bucket`` / ``__pack_slot`` and the combined ``out_col``
    string ``"<bucket>/<slot>"``.

    Sizing: choose ``n_buckets`` ≈ total_tokens / (1000·max_tokens) or
    simply a few× the cluster's task slots — packs never cross buckets,
    so bucket count only bounds window size, not pack quality (each
    bucket under-fills at most its single last pack).

    Determinism requires row-unique ids (the samplers' usual contract):
    duplicate ids tie completely in the layout order, so which
    duplicate precedes which — and thus their boundary assignment — is
    partition-dependent; on the nextfit path duplicates CO-ASSIGN (all
    rows of an id get one pack).  Rows with a NULL id are unpackable
    on BOTH methods (NULL pack, no budget consumed): their layout
    position would be partition-dependent (every NULL hashes alike),
    so packing them deterministically is impossible by construction.
    """
    if max_tokens <= 0:
        raise ValueError("pack_sequences max_tokens must be > 0")
    if method not in ("offset", "nextfit"):
        raise ValueError(
            f"pack_sequences method must be offset/nextfit, got {method!r}"
        )
    if method == "nextfit" and n_buckets is None:
        raise ValueError(
            "pack_sequences method='nextfit' needs n_buckets (with or "
            "without keys): its per-bucket pandas pass materializes a "
            "bucket in one worker, so a hot key group without "
            "sub-buckets would not fit — the offset method's JVM "
            "window spills, this path must be bounded by construction"
        )
    if keys is None and n_buckets is None:
        raise ValueError(
            "pack_sequences needs n_buckets when keys is None: a single "
            "global cumulative-sum window would serialize the whole "
            "table through one task"
        )
    if n_buckets is not None and n_buckets <= 0:
        raise ValueError("pack_sequences n_buckets must be > 0")
    ids = _cols(id_cols)
    cnt = F.col(count_col).cast("long")
    ok = cnt.isNotNull() & (cnt > 0)
    for c in ids:  # NULL ids: no deterministic layout position
        ok = ok & F.col(c).isNotNull()

    sub = (
        F.pmod(
            sample_priority(ids, seed + _PACK_SALT), F.lit(int(n_buckets))
        ).cast("string")
        if n_buckets is not None else None
    )
    if keys is not None:
        key_list = _cols(keys)
        # to_json(struct) is injective for primitive keys, so the
        # label partitions exactly like the raw key columns; the hash
        # sub-bucket (when given) splits hot key groups further
        bucket = F.to_json(F.struct(*key_list))
        if sub is not None:
            bucket = F.concat_ws("/", bucket, sub)
    else:
        bucket = sub

    # deterministic layout order inside a bucket: hashed-id priority
    # with id tie-break — independent of physical row order, and in
    # its OWN salted hash domain (never the samplers')
    pr = sample_priority(ids, seed + _PACK_ORDER_SALT)
    with_bucket = df.withColumn("__pack_bucket", bucket)
    if method == "nextfit":
        return _nextfit_pack(with_bucket, ids, cnt, ok, pr,
                             int(max_tokens), out_col)
    win = (
        Window.partitionBy("__pack_bucket")
        .orderBy(pr.asc(), *[F.col(c).asc() for c in ids])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # offset packing: a row's pack is where its START offset lands.
    # Exact LONG division (`div`), not floor(start / max_tokens): the
    # double division loses integer precision once a bucket's
    # cumulative token count exceeds 2^53, silently shifting slot
    # boundaries at extreme per-bucket sizes (the 100 TB contract)
    start = F.sum(F.when(ok, cnt).otherwise(F.lit(0))).over(win) - \
        F.when(ok, cnt).otherwise(F.lit(0))
    staged = with_bucket.withColumn("__pack_start", start)
    slot = F.when(
        ok, F.expr(f"__pack_start div {int(max_tokens)}")
    ).otherwise(F.lit(None))
    out = staged.withColumn(
        "__pack_slot", slot.cast("long")
    ).drop("__pack_start")
    return _format_pack_id(out, out_col)


def _format_pack_id(df: DataFrame, out_col: str) -> DataFrame:
    """The single definition of the pack-id rendering rule:
    ``"<bucket>/<slot>"``, NULL when the row is unpackable."""
    return df.withColumn(
        out_col,
        F.when(
            F.col("__pack_slot").isNotNull(),
            F.concat_ws("/", F.col("__pack_bucket"),
                        F.col("__pack_slot").cast("string")),
        ),
    )


def _nextfit_pack(with_bucket: DataFrame, ids: List[str], cnt, ok, pr,
                  max_tokens: int, out_col: str) -> DataFrame:
    """The no-split branch of :func:`pack_sequences`: per bucket, walk
    the deterministic layout order and close the open pack when the
    next doc would overflow.  One pandas pass per bucket — the bucket
    is the parallelism unit, exactly like the offset branch's window.

    Only a SKINNY projection (bucket, priority, count, ids) crosses
    the Python boundary — slot assignment needs nothing else, and the
    full rows (document text!) must never round-trip through Arrow.
    The slots join back on the ids (row-unique per the module's
    determinism contract).
    """
    from pyspark.sql.types import LongType, StructField, StructType

    skinny = with_bucket.where(ok).select(
        "__pack_bucket",
        pr.alias("__pack_pr"),
        cnt.alias("__pack_cnt"),
        *ids,
    )
    out_schema = StructType(
        [skinny.schema[c] for c in ["__pack_bucket"] + ids]
        + [StructField("__pack_slot", LongType(), True)]
    )
    order_cols = ["__pack_pr"] + ids

    def pack_one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="stable")
        slots = np.empty(len(pdf), dtype=object)
        slot, used = 0, 0
        for i, c in enumerate(pdf["__pack_cnt"].tolist()):
            if (c != c) or c > max_tokens:
                slots[i] = None      # unpackable without splitting
                continue
            c = int(c)
            if used + c > max_tokens and used > 0:
                slot, used = slot + 1, 0
            slots[i] = slot
            used += c
        out = pdf[["__pack_bucket"] + ids].copy()
        out["__pack_slot"] = slots
        return out

    slots_df = skinny.groupBy("__pack_bucket").applyInPandas(
        pack_one, schema=out_schema
    ).drop("__pack_bucket")
    # duplicate ids co-assign (one slot per id — min for determinism
    # given the set of slots the duplicates reached) so the join-back
    # preserves row count instead of fanning out n_dups × n_slots
    slots_df = slots_df.groupBy(*ids).agg(
        F.min("__pack_slot").alias("__pack_slot")
    )
    packed = with_bucket.join(slots_df, on=ids, how="left")
    return _format_pack_id(packed, out_col)
