"""Two-phase mergeable sketch aggregation over Spark DataFrames.

The reference's whole design is a commutative monoid — ``build`` is the
partial aggregate, ``merge`` the combiner (reference tdigest.rs:551-601).
Spark's pandas GROUPED_AGG UDFs have no partial-merge step, so the
classic ``partial → shuffle → final merge`` plan is built explicitly:

    df.select(keys + [col])
      .mapInPandas(build_partials)          # map-side combine, one blob
                                            #   per (task-partition, key)
      .groupBy(keys)                        # shuffles ~17 KB blobs, not rows
      .applyInPandas(merge_partials)        # k-way merge + recompress

For skewed keys an optional intermediate ``salt`` level merges in two
hops (``groupBy(keys, salt)`` then ``groupBy(keys)``) — treeAggregate
style. This keeps any single reduce task's input at
``salt_buckets``-way fan-in instead of ``num_partitions``-way.

Scale notes (designed for ~100 TB / 1000 executors):
- The shuffle payload is O(#partitions × #keys × sketch_size), i.e.
  independent of row count — partials are the only thing on the wire.
- Filters/column pruning stay in Catalyst: we select only keys+value
  before the first Python stage, so parquet scans read just those
  columns.
- All Python work is Arrow-batched numpy; no per-row Python.
"""

from __future__ import annotations

from typing import Callable, Iterator, List, Optional, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BinaryType, StructField, StructType

from gr_tdigest_spark.sketches.tdigest import TDigest
from gr_tdigest_spark.sketches import wire as td_wire
from gr_tdigest_spark import validation

__all__ = ["tdigest_agg", "sketch_agg", "SketchSpec", "TDigestSpec"]

# Fold buffered values into the running digest once this many are queued;
# amortizes compression across Arrow batches while bounding memory.
_FOLD_THRESHOLD = 65536


class SketchSpec:
    """Pluggable monoid: how to build, merge, and serialize one sketch kind.

    Subclasses implement the reference lifecycle (build = partial,
    merge = combine) for each sketch family; ``sketch_agg`` provides the
    identical two-phase Spark plan for all of them.
    """

    name = "sketch"

    def new_accumulator(self):
        raise NotImplementedError

    def ingest(self, acc, values: np.ndarray, weights: Optional[np.ndarray]):
        raise NotImplementedError

    def finalize(self, acc) -> bytes:
        raise NotImplementedError

    def merge_blobs(self, blobs: Sequence[bytes]) -> bytes:
        raise NotImplementedError


class _TDigestAccumulator:
    __slots__ = ("digest", "buf_v", "buf_w", "buffered")

    def __init__(self, digest: TDigest):
        self.digest = digest
        self.buf_v: List[np.ndarray] = []
        self.buf_w: List[np.ndarray] = []
        self.buffered = 0


class TDigestSpec(SketchSpec):
    """T-digest monoid (build: tdigest.rs:427-547; merge: 551-601)."""

    name = "tdigest"

    def __init__(
        self,
        max_size: int = 1000,
        scale: str = "k2",
        policy: str = "use",
        pin_per_side: int = 0,
        precision: str = "f64",
        on_invalid: str = "error",
    ):
        self.max_size = validation.validate_max_size(max_size)
        self.scale = validation.coerce_scale(scale)
        self.policy = validation.coerce_policy(policy)
        self.pin_per_side = validation.validate_pin_per_side(
            pin_per_side, self.max_size, self.policy
        )
        self.precision = validation.coerce_precision(precision)
        if on_invalid not in ("error", "drop"):
            raise ValueError("on_invalid must be 'error' or 'drop'")
        self.on_invalid = on_invalid

    def _empty(self) -> TDigest:
        return TDigest.empty(
            self.max_size, self.scale, self.policy, self.pin_per_side,
            None, self.precision,
        )

    def new_accumulator(self) -> _TDigestAccumulator:
        return _TDigestAccumulator(self._empty())

    def _clean(self, values, weights):
        v = np.asarray(values, dtype=np.float64)
        finite = np.isfinite(v)
        if weights is not None:
            w = np.asarray(weights, dtype=np.float64)
            w_ok = np.isfinite(w) & (w > 0.0)
        else:
            w = None
            w_ok = None
        if self.on_invalid == "error":
            if not finite.all():
                raise ValueError(
                    "sample value (NaN or ±inf) is not allowed; filter rows "
                    "or pass on_invalid='drop'"
                )
            if w_ok is not None and not w_ok.all():
                raise ValueError("sample weight must be finite and > 0")
            return v, w
        keep = finite if w_ok is None else (finite & w_ok)
        return v[keep], (None if w is None else w[keep])

    def ingest(self, acc, values, weights=None):
        v, w = self._clean(values, weights)
        if v.size == 0:
            return
        acc.buf_v.append(v)
        if w is not None:
            acc.buf_w.append(w)
        acc.buffered += v.size
        if acc.buffered >= _FOLD_THRESHOLD:
            self._fold(acc)

    def _fold(self, acc):
        if acc.buffered == 0:
            return
        v = np.concatenate(acc.buf_v)
        if acc.buf_w:
            w = np.concatenate(acc.buf_w)
            acc.digest = acc.digest.merge_weighted(v, w)
        else:
            acc.digest = acc.digest.merge_unsorted(v)
        acc.buf_v.clear()
        acc.buf_w.clear()
        acc.buffered = 0

    def finalize(self, acc) -> bytes:
        self._fold(acc)
        return td_wire.encode(acc.digest)

    def merge_blobs(self, blobs: Sequence[bytes]) -> bytes:
        digests = [td_wire.decode(b) for b in blobs if b is not None]
        validation.check_merge_compatible(digests)
        nonempty = [d for d in digests if not d.is_effectively_empty]
        if not nonempty:
            base = digests[0] if digests else self._empty()
            return td_wire.encode(base)
        merged = TDigest.merge_digests(nonempty)
        return td_wire.encode(merged)


def _partial_builder(
    spec: SketchSpec,
    key_cols: List[str],
    value_col: str,
    weight_col: Optional[str],
    out_col: str,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        accs = {}
        for pdf in batches:
            vals = pdf[value_col].to_numpy()
            ws = pdf[weight_col].to_numpy() if weight_col else None
            if key_cols:
                # one numpy pass per distinct key in the batch
                gb = pdf.groupby(key_cols, dropna=False, sort=False)
                for key, sel in gb.indices.items():
                    key = key if isinstance(key, tuple) else (key,)
                    acc = accs.get(key)
                    if acc is None:
                        acc = accs[key] = spec.new_accumulator()
                    spec.ingest(
                        acc, vals[sel], None if ws is None else ws[sel]
                    )
            else:
                acc = accs.get(())
                if acc is None:
                    acc = accs[()] = spec.new_accumulator()
                spec.ingest(acc, vals, ws)
        if not accs:
            return
        rows = [
            dict(zip(key_cols, key)) | {out_col: spec.finalize(acc)}
            for key, acc in accs.items()
        ]
        yield pd.DataFrame(rows, columns=key_cols + [out_col])

    return build


def _merger(
    spec: SketchSpec, key_cols: List[str], out_col: str
) -> Callable[[pd.DataFrame], pd.DataFrame]:
    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        blob = spec.merge_blobs(list(pdf[out_col]))
        head = pdf.iloc[[0]][key_cols].reset_index(drop=True)
        head[out_col] = [blob]
        return head

    return merge


def sketch_agg(
    df: DataFrame,
    keys: Optional[Sequence[str]],
    value_col: str,
    spec: SketchSpec,
    weight_col: Optional[str] = None,
    out_col: Optional[str] = None,
    salt_buckets: Optional[int] = None,
) -> DataFrame:
    """Generic two-phase sketch aggregate.

    Returns one row per key group with a binary sketch column ``out_col``
    (default ``<spec.name>``). ``salt_buckets`` adds a treeAggregate-style
    intermediate merge for skewed/huge key spaces.
    """
    key_cols = list(keys) if keys else []
    out_col = out_col or spec.name
    proj = key_cols + [value_col] + ([weight_col] if weight_col else [])
    src = df.select(*proj)  # column pruning reaches the scan

    out_fields = [src.schema[k] for k in key_cols] + [
        StructField(out_col, BinaryType(), True)
    ]
    out_schema = StructType(out_fields)

    partials = src.mapInPandas(
        _partial_builder(spec, key_cols, value_col, weight_col, out_col),
        schema=out_schema,
    )

    if not key_cols:
        # global aggregate: single-group merge
        merged = partials.withColumn("__g", F.lit(0))
        merged = merged.groupBy("__g").applyInPandas(
            _merger(spec, ["__g"], out_col),
            schema=StructType(
                [StructField("__g", merged.schema["__g"].dataType, False)]
                + [StructField(out_col, BinaryType(), True)]
            ),
        )
        return merged.drop("__g")

    if salt_buckets and salt_buckets > 1:
        salted = partials.withColumn(
            "__salt", F.pmod(F.crc32(F.col(out_col)), F.lit(salt_buckets))
        )
        mid_schema = StructType(
            [src.schema[k] for k in key_cols]
            + [StructField("__salt", salted.schema["__salt"].dataType, True)]
            + [StructField(out_col, BinaryType(), True)]
        )
        partials = (
            salted.groupBy(*key_cols, "__salt")
            .applyInPandas(
                _merger(spec, key_cols + ["__salt"], out_col), schema=mid_schema
            )
            .drop("__salt")
        )

    return partials.groupBy(*key_cols).applyInPandas(
        _merger(spec, key_cols, out_col), schema=out_schema
    )


def tdigest_agg(
    df: DataFrame,
    keys: Optional[Sequence[str]],
    value_col: str,
    weight_col: Optional[str] = None,
    max_size: int = 1000,
    scale: str = "k2",
    policy: str = "use",
    pin_per_side: int = 0,
    precision: str = "f64",
    on_invalid: str = "error",
    out_col: str = "tdigest",
    salt_buckets: Optional[int] = None,
) -> DataFrame:
    """Grouped t-digest build — the Spark analogue of
    ``df.group_by(g).agg(tdigest(x))`` (reference README.md:36-45,
    polars_expr.rs:247-250)."""
    spec = TDigestSpec(
        max_size=max_size, scale=scale, policy=policy,
        pin_per_side=pin_per_side, precision=precision, on_invalid=on_invalid,
    )
    return sketch_agg(
        df, keys, value_col, spec,
        weight_col=weight_col, out_col=out_col, salt_buckets=salt_buckets,
    )
