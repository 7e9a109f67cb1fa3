"""Stateful streaming t-digest aggregation — a thin parameterization of
the generic ``sketch_stream_agg`` (any SketchSpec monoid streams the
same way; see streaming/sketch_stream.py)."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from gr_tdigest_spark.operators.agg import TDigestSpec
from gr_tdigest_spark.streaming.sketch_stream import sketch_stream_agg

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
    spec = TDigestSpec(
        max_size=max_size, scale=scale, policy=policy,
        pin_per_side=pin_per_side, precision=precision,
    )
    return sketch_stream_agg(
        stream_df, keys, value_col, spec, out_col=out_col,
        count_fn=lambda d: d.count,
    )
