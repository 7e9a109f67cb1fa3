"""Streaming exact dedup for document ingestion.

A training-data ingestion stream must drop re-crawled / re-submitted
documents as they arrive, not in a nightly batch pass.  Spark-first
design: the content identity is the SAME whitespace-normalized md5
fingerprint the batch path uses (``text.with_fingerprint``, so a doc
deduped in the stream is the doc batch ``dedup_exact`` would dedupe),
and the dedup itself is Structured Streaming's BUILT-IN
``dropDuplicates`` state — Catalyst-planned, state-store-backed,
checkpoint-recoverable.  No custom stateful UDF where the engine
already ships the operator.

State at 10^12 docs: unbounded ``dropDuplicates`` keeps one
state-store entry per distinct fingerprint forever.  Pass
``watermark=(ts_col, delay)`` to switch to
``dropDuplicatesWithinWatermark``: fingerprints older than the delay
are evicted, bounding state to the watermark window — a duplicate
arriving LATER than the delay re-emerges (the documented
state/completeness trade for infinite streams; compose with a
periodic batch ``dedup_exact`` pass to catch stragglers).
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import DataFrame

__all__ = ["stream_dedup_exact"]


def stream_dedup_exact(
    stream_df: DataFrame,
    text_col: str = "text",
    watermark: Optional[Tuple[str, str]] = None,
) -> DataFrame:
    """First-seen document per content fingerprint survives; every
    later arrival — in the same micro-batch or any subsequent one — is
    dropped.  "First" is arrival order (streams have no global id
    order to elect a winner by; batch ``dedup_exact`` keeps min-id).

    ``watermark=('ts', '10 minutes')`` bounds state via
    ``dropDuplicatesWithinWatermark`` (requires ``ts_col`` to be an
    event-time timestamp column); omit for exact-forever semantics
    with one state entry per distinct fingerprint.

    NULL-text rows have no content identity and ALL pass through
    unscreened — a naive ``dropDuplicates`` on the fingerprint would
    treat the NULL fingerprint as one key and silently delete every
    NULL-text doc after the first (batch ``dedup_exact`` keeps them
    all too, so the stream/batch identity partition agrees).

    Works on batch DataFrames too (same plan minus the state store),
    so one code path serves backfill and ingest.
    """
    from pyspark.sql import functions as F

    from gr_tdigest_spark.operators.text import with_fingerprint

    d = with_fingerprint(stream_df, text_col, "__fp")
    screened = d.where(F.col("__fp").isNotNull())
    passthru = d.where(F.col("__fp").isNull()).drop("__fp")
    if watermark is not None:
        ts_col, delay = watermark
        screened = screened.withWatermark(ts_col, delay)
        out = screened.dropDuplicatesWithinWatermark(["__fp"])
    else:
        out = screened.dropDuplicates(["__fp"])
    return out.drop("__fp").unionByName(passthru)
