"""Generic stateful streaming sketch aggregation (north_rule §2.9).

Any ``SketchSpec`` monoid (t-digest, HLL, CMS, Bloom, KLL) plugs into
the same ``applyInPandasWithState`` plan: one sketch blob per key in
the state store, updated per micro-batch, emitted in update mode. The
batch path and the streaming path share the identical kernel monoid,
so a streaming aggregate equals the batch aggregate over the same rows
(tested), and watermark/window semantics compose by adding the window
column to ``keys``.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Sequence, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType, DoubleType, StructField, StructType,
)

from gr_tdigest_spark.operators.agg import SketchSpec

__all__ = ["sketch_stream_agg"]


def sketch_stream_agg(
    stream_df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    spec: SketchSpec,
    out_col: Optional[str] = None,
    count_fn: Optional[Callable] = None,
) -> DataFrame:
    """Streaming grouped sketch: one blob per key held in the state
    store, updated each micro-batch, emitted in update mode.

    Output rows: (keys..., out_col binary, n double) — ``n`` is
    ``count_fn(state)`` when given (e.g. ``lambda d: d.count`` for
    t-digest), else the running count of ingested rows tracked in the
    state alongside the blob.
    """
    key_cols = list(keys)
    out_col = out_col or spec.name

    key_fields = [stream_df.schema[k] for k in key_cols]
    out_schema = StructType(
        key_fields
        + [
            StructField(out_col, BinaryType(), True),
            StructField("n", DoubleType(), True),
        ]
    )
    state_schema = StructType([
        StructField("blob", BinaryType(), True),
        StructField("rows", DoubleType(), True),
    ])

    def update(
        key: Tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            blob, rows = state.get
            sk = spec.blob_to_state(bytes(blob))
            rows = float(rows)
        else:
            sk, rows = None, 0.0
        for pdf in pdfs:
            vals, _ = spec.clean_values(pdf[value_col].to_numpy(), None)
            if vals.size == 0:
                continue
            rows += float(vals.size)
            batch_sk = spec.build_state(vals, None)
            sk = batch_sk if sk is None else spec.merge_states(sk, batch_sk)
        if sk is None:
            return
        blob = spec.state_to_blob(sk)
        state.update((blob, rows))
        row = dict(zip(key_cols, key))
        row[out_col] = blob
        row["n"] = float(count_fn(sk)) if count_fn is not None else rows
        yield pd.DataFrame([row], columns=key_cols + [out_col, "n"])

    src = stream_df.select(*key_cols, value_col)
    # same JVM null filter as sketch_agg (agg.py): keeps micro-batch
    # pandas dtypes at the column's native type, so a value ingested in
    # a null-bearing micro-batch hashes identically to one ingested in
    # a clean batch (otherwise HLL double-counts and Bloom probes can
    # miss)
    from pyspark.sql import functions as F

    if getattr(spec, "skips_null_values", False):
        src = src.where(F.col(value_col).isNotNull())
    return (
        src
        .groupBy(*key_cols)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
