"""Stateful streaming t-digest aggregation (applyInPandasWithState)."""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType, DoubleType, StructField, StructType,
)

from gr_tdigest_spark.operators.agg import TDigestSpec
from gr_tdigest_spark.sketches import wire as td_wire

__all__ = ["tdigest_stream_agg"]


def tdigest_stream_agg(
    stream_df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    max_size: int = 1000,
    scale: str = "k2",
    policy: str = "use",
    pin_per_side: int = 0,
    precision: str = "f64",
    out_col: str = "tdigest",
) -> DataFrame:
    """Streaming grouped t-digest: one digest blob per key held in the
    state store, updated each micro-batch, emitted in update mode.

    Output rows: (keys..., out_col binary, n double) — ``n`` is the
    digest's running total weight.
    """
    key_cols = list(keys)
    spec = TDigestSpec(
        max_size=max_size, scale=scale, policy=policy,
        pin_per_side=pin_per_side, precision=precision,
    )

    key_fields = [stream_df.schema[k] for k in key_cols]
    out_schema = StructType(
        key_fields
        + [
            StructField(out_col, BinaryType(), True),
            StructField("n", DoubleType(), True),
        ]
    )
    state_schema = StructType([StructField("blob", BinaryType(), True)])

    def update(
        key: Tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            (blob,) = state.get
            digest = td_wire.decode(bytes(blob))
        else:
            digest = None
        for pdf in pdfs:
            vals, _ = spec.clean_values(pdf[value_col].to_numpy(), None)
            if vals.size == 0:
                continue
            batch_digest = spec.build_state(vals, None)
            digest = (
                batch_digest if digest is None
                else spec.merge_states(digest, batch_digest)
            )
        if digest is None:
            return
        blob = td_wire.encode(digest)
        state.update((blob,))
        row = dict(zip(key_cols, key))
        row[out_col] = blob
        row["n"] = float(digest.count)
        yield pd.DataFrame([row], columns=key_cols + [out_col, "n"])

    return (
        stream_df.select(*key_cols, value_col)
        .groupBy(*key_cols)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
