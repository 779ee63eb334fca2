"""Sticky codec selection + partition-column dictionary reuse
(round-4: skip per-block loser estimation / np.unique on stable columns
without changing a single payload byte)."""

from __future__ import annotations

import numpy as np
import pytest

from nem_mms_spark.selector import (
    ColumnContext,
    _factorize_numeric_ctx,
    select_and_encode,
)
from nem_mms_spark.codecs import decode_block


def _bytes_chunk(strings: list[bytes]):
    data = np.frombuffer(b"".join(strings), dtype=np.uint8)
    offsets = np.zeros(len(strings) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in strings], out=offsets[1:])
    return data, offsets


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_factorize_numeric_ctx_matches_np_unique(seed):
    rng = np.random.default_rng(seed)
    ctx = ColumnContext()
    for blk in range(6):
        # evolving value sets: later blocks add values the dict hasn't seen
        vals = rng.integers(0, 50 + 30 * blk, size=4096).astype(np.int64)
        codes, uniq = _factorize_numeric_ctx(vals, ctx)
        ref_uniq, ref_codes = np.unique(vals, return_inverse=True)
        assert np.array_equal(uniq, ref_uniq)
        assert np.array_equal(codes, ref_codes)


def test_sticky_payloads_bit_identical_to_full_estimation():
    rng = np.random.default_rng(7)
    shared_ctx = ColumnContext()
    for blk in range(20):  # well past the sticky threshold + reprobes
        vals = rng.integers(0, 40, size=8192).astype(np.int64)
        c1, p1, pr1, _ = select_and_encode(vals, "<i8", shared_ctx)
        c2, p2, pr2, _ = select_and_encode(vals, "<i8", ColumnContext())
        assert c1 == c2
        assert p1 == p2
        assert pr1 == pr2


def test_sticky_bytes_roundtrip_across_blocks():
    rng = np.random.default_rng(11)
    langs = [b"en", b"de", b"fr", b"es", b"zh"]
    ctx = ColumnContext()
    for blk in range(12):
        strings = [langs[i] for i in rng.integers(0, len(langs), size=4096)]
        values = _bytes_chunk(strings)
        codec, payload, params, _ = select_and_encode(values, "bytes", ctx)
        data, offsets = decode_block(payload, params, len(strings), "bytes", codec)
        assert bytes(data) == b"".join(strings)
        assert np.array_equal(np.diff(offsets), [len(s) for s in strings])
    assert ctx.sticky is not None  # stability was actually detected


def test_sticky_drift_falls_back_without_corruption():
    """A column that flips from low-cardinality ints to near-unique ints:
    sticky DICT blocks hit the plain-size guard, reroute through the full
    pass, and every block still round-trips."""
    rng = np.random.default_rng(13)
    ctx = ColumnContext()
    for blk in range(10):
        if blk < 4:
            vals = rng.integers(0, 8, size=4096).astype(np.int64)
        else:  # drift: 64-bit hashes — DICT can no longer win
            vals = rng.integers(0, 2**62, size=4096).astype(np.int64)
        codec, payload, params, _ = select_and_encode(vals, "<i8", ctx)
        out = decode_block(payload, params, len(vals), "<i8", codec)
        assert np.array_equal(np.asarray(out, dtype=np.int64), vals)


def test_sticky_fsst_skips_reestimation_and_roundtrips():
    rng = np.random.default_rng(17)
    ctx = ColumnContext()
    for blk in range(6):
        strings = [
            b"https://www.site%d.example.org/news/2021/%02d/item-%d"
            % (rng.integers(0, 50), rng.integers(1, 13), i)
            for i in range(3000)
        ]
        values = _bytes_chunk(strings)
        codec, payload, params, _ = select_and_encode(values, "bytes", ctx)
        data, offsets = decode_block(payload, params, len(strings), "bytes", codec)
        assert bytes(data) == b"".join(strings)
    assert ctx.fsst_table is not None
