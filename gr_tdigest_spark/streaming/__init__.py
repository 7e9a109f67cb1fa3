"""Structured Streaming sketch aggregation.

The reference has no event-time streaming (SURVEY §2.9) — but its
digests are *mergeable*, which is exactly what Spark's stateful
streaming needs. This module keeps one TDIG blob per key in the state
store and folds each micro-batch into it:

    readStream → groupBy(keys) → applyInPandasWithState(update)
      → sink (output mode "update")

Late data: pair with a watermark + ``F.window`` on the event-time
column in the keys to get windowed digests that keep accepting
out-of-order turns until the watermark passes.
"""

from gr_tdigest_spark.streaming.dedup_stream import stream_dedup_exact
from gr_tdigest_spark.streaming.sketch_stream import sketch_stream_agg
from gr_tdigest_spark.streaming.tdigest_stream import tdigest_stream_agg

__all__ = ["sketch_stream_agg", "tdigest_stream_agg",
           "stream_dedup_exact"]
