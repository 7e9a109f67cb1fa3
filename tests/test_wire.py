"""TDIG wire codec tests (reference wire.rs:955-1021,
test_wire_python_polars.py scenarios)."""

import math
import pickle
import struct

import numpy as np
import pytest

from gr_tdigest_spark.sketches.tdigest import TDigest
from gr_tdigest_spark.sketches.wire import (
    WireError,
    decode,
    encode,
    wire_precision,
)


def sample_digest(precision="f64", policy="use", scale="k2", max_size=100):
    rng = np.random.default_rng(21)
    return TDigest.from_values(
        rng.uniform(size=5000), max_size=max_size, scale=scale, policy=policy,
        precision=precision,
    )


class TestRoundTrip:
    @pytest.mark.parametrize("version", [1, 2, 3])
    @pytest.mark.parametrize("precision", ["f32", "f64"])
    def test_roundtrip(self, version, precision):
        td = sample_digest(precision=precision)
        blob = encode(td, version)
        back = decode(blob)
        assert back.precision == precision
        assert back.max_size == td.max_size
        assert back.scale == td.scale
        assert back.policy == td.policy
        np.testing.assert_array_equal(back.means, td.means)
        if version == 1:
            # v1 integerizes weights and reconstructs kind heuristically
            np.testing.assert_array_equal(
                back.weights64, np.round(td.weights64)
            )
        else:
            np.testing.assert_array_equal(back.weights, td.weights)
            np.testing.assert_array_equal(back.kinds, td.kinds)
        if version != 1:
            assert back.count == td.count
        assert back.sum == td.sum
        assert back.min == td.min and back.max == td.max

    def test_v3_blob_structure(self):
        td = sample_digest()
        blob = encode(td, 3)
        assert blob[:4] == b"TDIG"
        assert blob[4] == 3
        assert blob[5] == 1  # checksum flag
        assert blob[6] == 64  # header_len
        assert blob[7] == 2  # f64
        (n,) = struct.unpack_from("<Q", blob, 44)
        assert n == len(td)
        assert len(blob) == 64 + n * 17  # 17B stride pin (BASELINE.md)

    def test_f32_stride(self):
        td = sample_digest(precision="f32")
        blob = encode(td, 3)
        (n,) = struct.unpack_from("<Q", blob, 44)
        assert len(blob) == 64 + n * 13

    def test_empty_digest_roundtrip(self):
        td = TDigest.empty(max_size=50)
        back = decode(encode(td))
        assert back.is_effectively_empty
        assert back.max_size == 50
        assert math.isnan(back.min) and math.isnan(back.max)

    def test_edges_policy_roundtrip(self):
        td = TDigest.from_values(
            np.arange(100.0), max_size=20, policy="edges", pin_per_side=4
        )
        back = decode(encode(td))
        assert back.policy == "edges"
        assert back.pin_per_side == 4

    def test_queries_survive_roundtrip(self):
        td = sample_digest()
        back = decode(encode(td))
        qs = np.linspace(0, 1, 51)
        np.testing.assert_array_equal(back.quantile(qs), td.quantile(qs))
        grid = np.linspace(-0.1, 1.1, 101)
        np.testing.assert_array_equal(back.cdf(grid), td.cdf(grid))


class TestErrors:
    def test_empty_blob(self):
        with pytest.raises(WireError):
            decode(b"")

    def test_bad_magic(self):
        with pytest.raises(WireError):
            decode(b"NOPE" + b"\x00" * 100)

    def test_unsupported_version(self):
        td = sample_digest()
        blob = bytearray(encode(td))
        blob[4] = 9
        with pytest.raises(WireError):
            decode(bytes(blob))

    def test_checksum_detects_corruption(self):
        td = sample_digest()
        blob = bytearray(encode(td, 3))
        blob[70] ^= 0xFF  # flip a payload byte
        with pytest.raises(WireError, match="checksum"):
            decode(bytes(blob))

    def test_truncated_payload(self):
        td = sample_digest()
        blob = encode(td, 3)
        with pytest.raises(WireError):
            decode(blob[:-3])

    def test_wire_precision_sniff(self):
        assert wire_precision(encode(sample_digest("f64"))) == "f64"
        assert wire_precision(encode(sample_digest("f32"))) == "f32"
        assert wire_precision(encode(sample_digest("f32"), 2)) == "f32"
        assert wire_precision(encode(sample_digest("f64"), 1)) == "f64"
        with pytest.raises(WireError):
            wire_precision(b"XXXX\x03")


class TestPickle:
    def test_pickle_roundtrip(self):
        td = sample_digest()
        back = pickle.loads(pickle.dumps(td))
        np.testing.assert_array_equal(back.means, td.means)
        assert back.quantile(0.5) == td.quantile(0.5)

    def test_deepcopy(self):
        import copy

        td = sample_digest()
        back = copy.deepcopy(td)
        assert back.quantile(0.9) == td.quantile(0.9)


def test_v1_half_weight_rounds_away_from_zero():
    """v1 integerizes weights like Rust f64::round (half away from zero),
    not banker's rounding: weight 2.5 -> 3 (reference wire.rs v1 encode)."""
    import numpy as np
    from gr_tdigest_spark.sketches.tdigest import TDigest
    from gr_tdigest_spark.sketches import wire

    td = TDigest.from_weighted(
        np.array([1.0, 2.0]), np.array([2.5, 1.5]), max_size=100
    )
    blob = wire.encode(td, version=1)
    back = wire.decode(blob)
    assert sorted(back.weights64.tolist()) == [2.0, 3.0]
