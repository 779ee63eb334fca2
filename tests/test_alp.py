"""ALP float codec: bit-exact round-trips (decimals, NaN payloads, signed
zeros, infinities, randoms), selector integration, compression wins."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from nem_mms_spark.codecs import alp, registry
from nem_mms_spark.selector import select_and_encode


def roundtrip(v: np.ndarray) -> np.ndarray:
    payload, params = alp.encode(v)
    return alp.decode(payload, params, len(v))


def assert_bit_identical(a: np.ndarray, b: np.ndarray) -> None:
    assert np.array_equal(
        np.asarray(a, dtype=np.float64).view(np.int64),
        np.asarray(b, dtype=np.float64).view(np.int64),
    )


def test_two_decimal_prices_compress_hard():
    rng = np.random.default_rng(0)
    v = np.round(rng.uniform(0, 10_000, 50_000), 2)
    payload, params = alp.encode(v)
    assert params["e"] == 2 and params["nexc"] == 0
    assert len(payload) < 0.40 * v.nbytes  # ~20 bits vs 64
    assert_bit_identical(alp.decode(payload, params, len(v)), v)


def test_specials_become_exceptions():
    v = np.array([1.25, -0.0, 0.0, np.nan, np.inf, -np.inf, 3.5e301,
                  np.float64.fromhex("0x1.fffffffffffffp+1023")])
    # a NaN with a nonstandard payload must round-trip bit-identically
    v[3] = np.frombuffer(np.int64(0x7FF8DEADBEEF0001).tobytes(), np.float64)[0]
    out = roundtrip(v)
    assert_bit_identical(out, v)


def test_all_random_doubles_fall_back_to_exceptions():
    rng = np.random.default_rng(1)
    v = rng.standard_normal(4096)  # full-precision: nothing scales exactly
    out = roundtrip(v)
    assert_bit_identical(out, v)


def test_empty_and_single():
    assert len(roundtrip(np.zeros(0))) == 0
    assert_bit_identical(roundtrip(np.array([42.42])), np.array([42.42]))


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.floats(allow_nan=True, allow_infinity=True, width=64),
            st.decimals(
                min_value=-10**6, max_value=10**6, places=3
            ).map(float),
        ),
        min_size=1,
        max_size=300,
    )
)
def test_alp_roundtrip_property(xs):
    v = np.array(xs, dtype=np.float64)
    assert_bit_identical(roundtrip(v), v)


def test_selector_picks_alp_for_decimals():
    rng = np.random.default_rng(2)
    v = np.round(rng.uniform(-500, 500, 20_000), 3)
    codec, payload, params, est = select_and_encode(v, "<f8")
    assert codec == registry.ALP, est
    out = registry.decode_block(payload, params, len(v), "<f8", codec)
    assert_bit_identical(out, v)


def test_selector_avoids_alp_for_randoms():
    rng = np.random.default_rng(3)
    v = rng.standard_normal(8192)
    codec, payload, params, est = select_and_encode(v, "<f8")
    assert codec == registry.PLAIN
    assert len(payload) <= v.nbytes
