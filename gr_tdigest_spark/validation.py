"""Shared strict-validation layer (analogue of reference frontends.rs +
bindings/python/gr_tdigest/__init__.py:98-194).

All public surfaces (driver API, Spark functions, aggregates) route
argument coercion and merge-compatibility checks through here, mirroring
the reference's single frontend layer (frontends.rs:1-50)."""

from __future__ import annotations

import math
from typing import Optional, Sequence

__all__ = [
    "validate_max_size",
    "validate_pin_per_side",
    "coerce_scale",
    "coerce_policy",
    "coerce_precision",
    "validate_quantile_probe",
    "validate_trimmed_bounds",
    "check_merge_compatible",
    "DEFAULT_MAX_SIZE",
    "DEFAULT_DELTA",
]

DEFAULT_MAX_SIZE = 1000  # reference __init__.py:55
DEFAULT_DELTA = 300.0  # reference __init__.py:59

_SCALES = {"quad", "k1", "k2", "k2norm", "k3"}
_POLICIES = {"off", "use", "edges"}


def validate_max_size(max_size) -> int:
    """Bounds 10 ≤ m ≤ 20000 (reference __init__.py:145-148)."""
    try:
        m = int(max_size)
    except (TypeError, ValueError) as exc:
        raise TypeError(
            f"max_size must be an integer; got {type(max_size).__name__}"
        ) from exc
    if m < 10:
        raise ValueError("max_size must be >= 10.")
    if m > 20000:
        raise ValueError("max_size too large (>20_000).")
    return m


def validate_pin_per_side(pin_per_side, max_size: int, policy: str) -> int:
    """1 ≤ p ≤ max_size//2 for edges policy (reference __init__.py:182-194)."""
    if policy != "edges":
        if pin_per_side not in (0, None):
            raise ValueError("pin_per_side requires singleton_policy='edges'")
        return 0
    try:
        p = int(pin_per_side)
    except (TypeError, ValueError) as exc:
        raise TypeError(
            f"pin_per_side must be an integer; got {type(pin_per_side).__name__}"
        ) from exc
    if p < 1:
        raise ValueError("pin_per_side must be >= 1.")
    if p > max_size // 2:
        raise ValueError(
            f"pin_per_side={p} exceeds limit for max_size={max_size} "
            f"(<= {max_size // 2})."
        )
    return p


def coerce_scale(scale) -> str:
    s = str(scale).strip().lower()
    if s not in _SCALES:
        raise ValueError(
            f"Unknown scale family: {scale!r}. Use one of: "
            "'quad'|'k1'|'k2'|'k2norm'|'k3' (case-insensitive)."
        )
    return s


def coerce_policy(policy) -> str:
    if policy is None:
        return "use"
    s = str(policy).strip().lower()
    if s not in _POLICIES:
        raise ValueError("singleton_policy must be 'off'|'use'|'edges'.")
    return s


def coerce_precision(precision) -> str:
    if precision is None:
        return "f64"
    s = str(precision).strip().lower()
    if s in ("f32", "f64"):
        return s
    raise ValueError(
        f"Unknown precision: {precision!r}. Use 'f64' (default) or 'f32'."
    )


def resolve_auto_precision(precision, spark_dtype) -> str:
    """Input-dtype precision inference for the aggregate surface,
    mirroring the reference's Polars rule (polars_expr.rs:522-544,
    65-77): a 32-bit float value column yields an f32 digest, anything
    else f64. ``precision`` values other than 'auto' pass through
    :func:`coerce_precision` unchanged."""
    if precision is not None and str(precision).strip().lower() == "auto":
        from pyspark.sql.types import FloatType

        return "f32" if isinstance(spark_dtype, FloatType) else "f64"
    return coerce_precision(precision)


def validate_quantile_probe(q: float) -> float:
    """Strict probe check (reference frontends.rs:152-160)."""
    q = float(q)
    if not math.isfinite(q):
        raise ValueError("q must be a finite number in [0,1]")
    if not (0.0 <= q <= 1.0):
        raise ValueError("q must be in [0,1]")
    return q


def validate_trimmed_bounds(lower: float, upper: float) -> tuple:
    """Strict bounds check (reference frontends.rs:166-174)."""
    lower, upper = float(lower), float(upper)
    if not (math.isfinite(lower) and math.isfinite(upper)):
        raise ValueError("trimmed_mean bounds must be finite values in [0,1]")
    if not (0.0 <= lower <= 1.0 and 0.0 <= upper <= 1.0 and lower <= upper):
        raise ValueError(
            "trimmed_mean bounds must satisfy 0 <= lower <= upper <= 1"
        )
    return lower, upper


def check_merge_compatible(digests: Sequence) -> None:
    """Strict merge checks (reference frontends.rs:432-478): precision
    mismatch is always an error; config mismatch is an error between
    non-empty digests (empty digests merge freely)."""
    if not digests:
        return
    first = digests[0]
    for d in digests[1:]:
        if d.precision != first.precision:
            raise ValueError(
                f"tdigest merge: incompatible digests (precision "
                f"{first.precision} vs {d.precision}). Cast explicitly "
                "before merge (e.g. cast_precision('f64'))."
            )
    ref = None
    for d in digests:
        if d.is_effectively_empty:
            continue
        if ref is None:
            ref = d
        elif d.config_tuple() != ref.config_tuple():
            raise ValueError(
                f"tdigest merge: incompatible configs ({ref.config_tuple()} "
                f"vs {d.config_tuple()}). Rebuild or cast to a shared "
                "configuration before merge."
            )
