"""Deterministic synthetic multi-turn transcript generator.

Produces the BASELINE input_hint table
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` at arbitrary scale — Zipf-skewed conversation sizes (hot
conversations exercise salting/skew), text lengths drawn from a mixture
mirroring the reference's accuracy-pin distribution
(crates/testdata/src/lib.rs:49-75: clumps + broad uniform + heavy
tails), Zipf-distributed tool names (CMS heavy hitters).

Everything is seeded — same (seed, n_convs) ⇒ identical table — and
generation is batched so it can run driver-side (pandas/parquet) or
distributed (mapInPandas over a range DataFrame), never from external
data.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional

import numpy as np
import pandas as pd

ROLES = np.array(["user", "assistant", "system", "tool"])
ROLE_W = np.array([0.42, 0.42, 0.02, 0.14])
N_TOOLS = 50
TOOLS = np.array([f"tool_{i:02d}" for i in range(N_TOOLS)])
_EPOCH_US = 1_700_000_000_000_000  # fixed base timestamp (µs)

_WORDS = np.array(
    "the quick brown fox jumps over lazy dog alpha beta gamma delta "
    "train data model spark sketch digest merge quantile stream tool "
    "agent turn reply plan code test run".split()
)


def _conv_sizes(rng: np.random.Generator, n_convs: int) -> np.ndarray:
    """Zipf-skewed turns per conversation: long tail of 2-10 turn chats,
    a few hot conversations with 1000+ turns."""
    raw = rng.zipf(1.35, size=n_convs).astype(np.int64)
    return np.clip(raw + 1, 2, 5000)

def _mixture_lengths(rng: np.random.Generator, n: int) -> np.ndarray:
    """Text-length mixture on [1, 20000] mirroring lib.rs:49-75:
    30% clumps, 40% uniform, 30% heavy tails."""
    u = rng.uniform(size=n)
    kind = rng.uniform(size=n)
    out = np.empty(n)
    clump = kind < 0.3
    centers = np.array([0.1, 0.5, 0.9])
    out[clump] = centers[rng.integers(0, 3, clump.sum())] + rng.uniform(
        -1e-3, 1e-3, clump.sum()
    )
    uni = (kind >= 0.3) & (kind < 0.7)
    out[uni] = u[uni]
    heavy = kind >= 0.7
    e = rng.uniform(3, 9, heavy.sum())
    flip = rng.uniform(size=heavy.sum()) < 0.5
    out[heavy] = np.where(flip, u[heavy] ** e, 1.0 - u[heavy] ** e)
    return np.clip(np.round(np.clip(out, 0, 1) * 19999) + 1, 1, 20000).astype(
        np.int64
    )


_SOUP_CACHE: dict = {}


def _soup(seed: int) -> str:
    """One deterministic word soup per seed, cached per process — the
    per-turn text is a (offset, length) slice of it."""
    s = _SOUP_CACHE.get(seed)
    if s is None:
        rng = np.random.default_rng([seed, 2])
        s = " ".join(_WORDS[rng.integers(0, len(_WORDS), 8192)])
        while len(s) < 21001:
            s += " " + s
        _SOUP_CACHE[seed] = s
    return s


def _make_text(lengths: np.ndarray, rng: np.random.Generator, seed: int) -> list:
    """Deterministic pseudo-text of exactly the requested lengths."""
    soup = _soup(seed)
    offsets = rng.integers(0, 1000, size=lengths.size)
    return [
        soup[int(o):int(o) + int(ln)] for o, ln in zip(offsets, lengths)
    ]


def transcripts_pandas(
    n_convs: int = 200,
    seed: int = 42,
    conv_offset: int = 0,
) -> pd.DataFrame:
    """Generate transcripts for conversations [conv_offset,
    conv_offset+n_convs) as one pandas DataFrame. Deterministic per
    (seed, conv id): each conversation's stream is seeded independently,
    so any sharding of the id range yields identical rows."""
    frames = []
    # per-conversation independent substreams → shard-stable
    sizes_rng = np.random.default_rng([seed, 0])
    # sizes depend only on absolute conv index
    all_sizes = _conv_sizes(sizes_rng, conv_offset + n_convs)[conv_offset:]
    for i, n_turns in enumerate(all_sizes):
        cid = conv_offset + i
        rng = np.random.default_rng([seed, 1, cid])
        n_turns = int(n_turns)
        roles = ROLES[rng.choice(4, size=n_turns, p=ROLE_W)]
        lengths = _mixture_lengths(rng, n_turns)
        texts = _make_text(lengths, rng, seed)
        # zipf over tools; null for non-tool roles
        tool_ids = np.minimum(rng.zipf(1.5, size=n_turns) - 1, N_TOOLS - 1)
        tools = np.where(roles == "tool", TOOLS[tool_ids], None)
        # log-normal-ish inter-turn gaps (µs), squashed like lib.rs:40-47
        gaps_s = np.exp(rng.normal(0.5, 1.2, size=n_turns))
        gaps_us = np.clip((gaps_s * 1e6).astype(np.int64), 1000, 600_000_000)
        start = _EPOCH_US + cid * 3_600_000_000
        ts = start + np.cumsum(gaps_us)
        frames.append(
            pd.DataFrame(
                {
                    "conv_id": f"conv-{cid:08d}",
                    "turn_idx": np.arange(n_turns, dtype=np.int32),
                    "role": roles,
                    "text": texts,
                    "tool": tools,
                    "ts": pd.to_datetime(ts, unit="us"),
                }
            )
        )
    out = pd.concat(frames, ignore_index=True)
    out["conv_id"] = out["conv_id"].astype("string")
    out["role"] = out["role"].astype("string")
    out["tool"] = out["tool"].astype("string")
    return out


TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def transcripts_df(
    spark,
    n_convs: int = 200,
    seed: int = 42,
    slices: Optional[int] = None,
):
    """Distributed generation: shard the conversation id range over
    executors with mapInPandas (no driver materialization — scales to
    arbitrary n_convs)."""
    slices = slices or spark.sparkContext.defaultParallelism
    bounds = np.linspace(0, n_convs, slices + 1).astype(int)
    shards = [
        (int(lo), int(hi)) for lo, hi in zip(bounds[:-1], bounds[1:]) if hi > lo
    ]
    sdf = spark.createDataFrame(shards, "lo int, hi int").repartition(
        len(shards), "lo"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # yield in small conversation chunks: one huge frame would push a
        # single Arrow string array past the 2 GB limit (→ ChunkedArray,
        # which Spark's Arrow serializer rejects)
        chunk = 50
        for pdf in batches:
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                for c0 in range(int(lo), int(hi), chunk):
                    c1 = min(c0 + chunk, int(hi))
                    yield transcripts_pandas(
                        n_convs=c1 - c0, seed=seed, conv_offset=c0
                    )

    return sdf.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
