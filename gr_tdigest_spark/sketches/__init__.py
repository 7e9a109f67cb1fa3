"""Pure-numpy sketch kernels (no Spark imports)."""

from gr_tdigest_spark.sketches.tdigest import TDigest

__all__ = ["TDigest"]
