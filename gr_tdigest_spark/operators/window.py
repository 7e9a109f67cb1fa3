"""Per-row group-sketch attachment — the Spark analogue of Polars
``tdigest(...).over(g)`` / ``quantile(...).over(g)``
(reference __init__.py:643-656, test_contract_behavior.py:200-254).

Digest state is far too heavy for Spark ``Window`` frames, so the plans
here never attach a blob to a fact row:

- group-constant probes (``with_group_quantile``): evaluate on the tiny
  digest table, broadcast-join the SCALAR result — pure JVM join.
- per-row probes (``with_group_cdf``): a broadcast-join of the blob
  column would move ~17 KB × fact-rows through Arrow into Python
  (measured 42 s for 600 k rows vs 1-2 s for the map). Instead the
  digest table ships ONCE per executor as a Spark broadcast variable
  and a pandas UDF over (keys, probe) decodes each group's digest once
  per batch; only the key + probe columns cross Arrow.
- ``strategy='cogroup'`` covers group cardinalities too large to
  broadcast (#groups × blob exceeding executor memory): facts cogroup
  with digests on the keys, so each blob crosses once per group.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

import gr_tdigest_spark.functions as Fn
from gr_tdigest_spark.operators.agg import tdigest_agg, _canon_key_tuple
from gr_tdigest_spark.sketches import wire as td_wire

__all__ = [
    "with_group_quantile",
    "with_group_cdf",
    "filter_by_group_quantile",
]


def _null_canon_key(df: DataFrame, name: str, qualifier: str):
    """Key expression for the digest join-back: float NaN keys are
    canonicalized to NULL (mirroring what the aggregate's partial stage
    does to group keys), so a NaN-keyed fact row matches its digest."""
    from pyspark.sql.types import DoubleType, FloatType

    c = F.col(f"{qualifier}.`{name}`")
    if isinstance(df.schema[name].dataType, (DoubleType, FloatType)):
        return F.when(F.isnan(c), F.lit(None)).otherwise(c)
    return c


def with_group_quantile(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    q: float,
    out_col: Optional[str] = None,
    **cfg,
) -> DataFrame:
    """Attach each group's quantile-q of ``value_col`` to every row —
    ``quantile(tdigest(x), q).over(keys)``. The probe is group-constant,
    so only the SCALAR result joins back (broadcast hash join, no
    shuffle of the fact table, no Python on the fact rows).

    The join-back is NULL-safe on the keys: a NULL (or float-NaN —
    canonicalized to NULL, matching the aggregate) group key is a real
    group and its rows get that group's scalar, instead of silently
    receiving NULL from an equi-join that can never match. Output
    columns are ``df``'s, in order, plus ``out_col``."""
    out_col = out_col or f"q{q}_{value_col}"
    key_cols = list(keys)
    digests = tdigest_agg(df, key_cols, value_col, **cfg)
    scalars = digests.select(
        *key_cols, Fn.tdigest_quantile("tdigest", q).alias(out_col)
    )
    fact, dim = df.alias("__gqf"), F.broadcast(scalars).alias("__gqs")
    cond = None
    for k in key_cols:
        e = _null_canon_key(df, k, "__gqf").eqNullSafe(
            _null_canon_key(scalars, k, "__gqs")
        )
        cond = e if cond is None else (cond & e)
    return fact.join(dim, cond, "left").select(
        *[F.col(f"__gqf.`{c}`") for c in df.columns],
        # backticks: the default out_col embeds the q value's dot
        F.col(f"__gqs.`{out_col}`").alias(out_col),
    )


def filter_by_group_quantile(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    q: float,
    keep: str = "above",
    strict: bool = False,
    **cfg,
) -> DataFrame:
    """Keep rows whose ``value_col`` clears the group's quantile-q
    threshold — the standard pretraining-filter shape ("top 30% quality
    per language" is ``q=0.7, keep='above'``). Output schema == input
    schema.

    Built on :func:`with_group_quantile`: the threshold is ONE scalar
    per group computed on the digest table and broadcast-joined back,
    so the fact table is never shuffled and the comparison is pure JVM.
    ``keep='above'`` retains value ≥ threshold (> when ``strict``);
    ``'below'`` the mirror. Rows with a NULL or NaN value never clear
    the filter on EITHER side (Spark sorts NaN above every number, so
    without an explicit guard NaN garbage would pass ``keep='above'``),
    and rows of groups whose threshold is NULL (an all-NULL-value
    group) are dropped. NULL/NaN values trip the strict validation
    default while building the digests — pass ``on_invalid='drop'``
    (forwarded via ``cfg``) for a corpus that contains them.
    """
    if keep not in ("above", "below"):
        raise ValueError(f"keep must be 'above' or 'below', got {keep!r}")
    thr_col = "__gq_threshold"
    out = with_group_quantile(df, keys, value_col, q, thr_col, **cfg)
    v, t = F.col(value_col), F.col(thr_col)
    if keep == "above":
        cond = (v > t) if strict else (v >= t)
    else:
        cond = (v < t) if strict else (v <= t)
    cond = cond & ~F.isnan(v.cast("double"))
    return out.where(cond).drop(thr_col).select(*df.columns)


def _broadcast_cdf(df, key_cols, probe_col, out_col, digests):
    """Digest map as a Spark broadcast variable; fact rows carry only
    keys + probe through Arrow."""
    blob_map = {
        _canon_key_tuple(tuple(r[k] for k in key_cols)): bytes(r["tdigest"])
        for r in digests.collect()
    }
    bc = df.sparkSession.sparkContext.broadcast(blob_map)

    @F.pandas_udf(DoubleType())
    def _cdf(*cols: pd.Series) -> pd.Series:
        probe = cols[-1]
        xarr = probe.to_numpy(dtype=np.float64, na_value=np.nan)
        out = np.full(len(probe), np.nan)
        if not len(probe):
            return pd.Series(out)
        # vectorized key grouping (one factorize per batch, no per-row
        # Python) — same pattern as the partial builders in agg.py
        if len(cols) == 2:
            codes, uniques = pd.factorize(cols[0], use_na_sentinel=False)
            key_tuples = [_canon_key_tuple((u,)) for u in uniques]
        else:
            codes, uniques = pd.factorize(
                pd.MultiIndex.from_arrays([c for c in cols[:-1]]),
                use_na_sentinel=False,
            )
            key_tuples = [_canon_key_tuple(u) for u in uniques]
        order = np.argsort(codes, kind="stable")
        bounds = np.searchsorted(
            codes[order], np.arange(len(key_tuples) + 1)
        )
        mp = bc.value
        for gi, key in enumerate(key_tuples):
            blob = mp.get(key)
            if blob is None:
                continue  # unseen group → null, matching a left join
            idx = order[bounds[gi]:bounds[gi + 1]]
            out[idx] = td_wire.decode(blob).cdf(xarr[idx])
        return pd.Series(out)

    return df.withColumn(out_col, _cdf(*key_cols, probe_col))


def _cogroup_cdf(df, key_cols, probe_col, out_col, digests):
    """Scale path for huge group counts: facts ⋈ digests via cogroup —
    each blob crosses the wire once per group, never once per row."""
    out_schema = StructType(
        df.schema.fields + [StructField(out_col, DoubleType(), True)]
    )

    def attach(facts: pd.DataFrame, dig: pd.DataFrame) -> pd.DataFrame:
        res = facts.copy()
        if len(dig) and len(facts):
            td = td_wire.decode(bytes(dig["tdigest"].iloc[0]))
            xs = facts[probe_col].to_numpy(dtype=np.float64,
                                           na_value=np.nan)
            res[out_col] = td.cdf(xs)
        else:
            res[out_col] = np.nan
        return res

    return (
        df.groupBy(*key_cols)
        .cogroup(digests.groupBy(*key_cols))
        .applyInPandas(attach, schema=out_schema)
    )


def with_group_cdf(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    probe_col: Optional[str] = None,
    out_col: str = "cdf",
    strategy: str = "broadcast",
    **cfg,
) -> DataFrame:
    """Attach the group's CDF evaluated at each row's own value (or at
    ``probe_col``) — ``cdf(tdigest(x), probe).over(keys)``.

    ``strategy='broadcast'`` (default): digest map broadcast once per
    executor; right whenever #groups × blob fits in memory (a 150k-group
    × 17 KB table is ~2.5 GB — switch strategies before that).
    ``strategy='cogroup'``: shuffle-based, blob crosses once per group.
    """
    probe_col = probe_col or value_col
    key_cols = list(keys)
    digests = tdigest_agg(df, key_cols, value_col, **cfg)
    if strategy == "broadcast":
        return _broadcast_cdf(df, key_cols, probe_col, out_col, digests)
    if strategy == "cogroup":
        return _cogroup_cdf(df, key_cols, probe_col, out_col, digests)
    raise ValueError("strategy must be 'broadcast' or 'cogroup'")
