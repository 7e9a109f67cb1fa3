"""Spark DataFrame-level sketch operators."""

from gr_tdigest_spark.operators.agg import (
    SketchSpec,
    TDigestSpec,
    sketch_agg,
    tdigest_agg,
)

__all__ = ["SketchSpec", "TDigestSpec", "sketch_agg", "tdigest_agg"]
