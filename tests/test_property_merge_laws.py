"""Hypothesis property tests for the sketch monoid laws
(north_rule: merge associativity/commutativity)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from gr_tdigest_spark.sketches.bloom import BloomFilter
from gr_tdigest_spark.sketches.cms import CMS
from gr_tdigest_spark.sketches.hll import HLL
from gr_tdigest_spark.sketches.kll import KLL
from gr_tdigest_spark.sketches.tdigest import TDigest

finite_floats = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
)
value_lists = st.lists(finite_floats, min_size=0, max_size=200)


@settings(max_examples=40, deadline=None)
@given(a=value_lists, b=value_lists)
def test_tdigest_merge_commutative_exact_invariants(a, b):
    da = TDigest.from_values(a, max_size=100)
    db = TDigest.from_values(b, max_size=100)
    ab = TDigest.merge_digests([da, db])
    ba = TDigest.merge_digests([db, da])
    assert ab.count == ba.count == len(a) + len(b)
    if a or b:
        assert ab.min == ba.min == min(a + b)
        assert ab.max == ba.max == max(a + b)
        # same input stream after the k-way sort ⇒ identical centroids
        np.testing.assert_array_equal(ab.means64, ba.means64)
        np.testing.assert_array_equal(ab.weights64, ba.weights64)


@settings(max_examples=30, deadline=None)
@given(a=value_lists, b=value_lists, c=value_lists)
def test_tdigest_quantiles_in_range_and_monotone(a, b, c):
    parts = [
        TDigest.from_values(v, max_size=50) for v in (a, b, c) if v
    ]
    if not parts:
        return
    m = TDigest.merge_digests(parts)
    qs = np.linspace(0, 1, 21)
    got = m.quantile(qs)
    assert np.all(np.diff(got) >= -1e-9), "monotone in q"
    assert got[0] == m.min and got[-1] == m.max
    grid = np.linspace(m.min - 1, m.max + 1, 50)
    cdf = m.cdf(grid)
    assert np.all(np.diff(cdf) >= -1e-12)
    assert np.all((cdf >= 0) & (cdf <= 1))


@settings(max_examples=25, deadline=None)
@given(
    data=st.lists(st.integers(min_value=0, max_value=10_000),
                  min_size=1, max_size=500),
    split=st.integers(min_value=0, max_value=500),
)
def test_hll_merge_associative_exact_state(data, split):
    split = min(split, len(data))
    a, b = data[:split], data[split:]
    ha, hb = HLL(p=10), HLL(p=10)
    if a:
        ha.add(np.asarray(a))
    if b:
        hb.add(np.asarray(b))
    whole = HLL(p=10)
    whole.add(np.asarray(data))
    np.testing.assert_array_equal(ha.merge(hb).registers, whole.registers)
    np.testing.assert_array_equal(hb.merge(ha).registers, whole.registers)


@settings(max_examples=25, deadline=None)
@given(
    data=st.lists(st.text(min_size=1, max_size=8), min_size=1, max_size=300),
    split=st.integers(min_value=0, max_value=300),
)
def test_cms_and_bloom_merge_equal_single_build(data, split):
    split = min(split, len(data))
    arr = np.asarray(data, dtype=object)
    a, b = arr[:split], arr[split:]
    ca, cb, cw = CMS(width=512), CMS(width=512), CMS(width=512)
    if a.size:
        ca.add(a)
    if b.size:
        cb.add(b)
    cw.add(arr)
    np.testing.assert_array_equal(ca.merge(cb).table, cw.table)
    fa, fb, fw = (BloomFilter(m_bits=1 << 10) for _ in range(3))
    if a.size:
        fa.add(a)
    if b.size:
        fb.add(b)
    fw.add(arr)
    np.testing.assert_array_equal(fa.merge(fb).words, fw.words)


@settings(max_examples=20, deadline=None)
@given(vals=st.lists(finite_floats, min_size=1, max_size=400))
def test_kll_weight_preservation_under_merge(vals):
    arr = np.asarray(vals)
    half = len(arr) // 2
    a, b = KLL(k=64), KLL(k=64)
    if half:
        a.add(arr[:half])
    if len(arr) - half:
        b.add(arr[half:])
    m = a.merge(b)
    _, w = m._weighted_items()
    assert np.sum(w) == len(arr)
    assert m.n == len(arr)
    q = m.quantile([0.0, 0.5, 1.0])
    assert arr.min() <= q[0] <= q[1] <= q[2] <= arr.max()
