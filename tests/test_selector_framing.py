"""Selector picks the expected codec per fixture column (FIXTURES.md §A
expected outcomes) and framing round-trips Arrow arrays with nulls."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from nem_mms_spark import framing
from nem_mms_spark.codecs import registry
from nem_mms_spark.datagen.webpages import generate_pages
from nem_mms_spark.selector import ColumnContext, select_and_encode


def kernel_of(arr: pa.Array):
    values, dtype, validity, null_count, raw = framing.to_kernel(arr)
    return values, dtype


def test_selector_lang_dict_or_rle():
    pdf = generate_pages(np.arange(20000))
    arr = pa.array(sorted(pdf["lang"]), type=pa.string())
    values, dtype = kernel_of(arr)
    codec, payload, params, est = select_and_encode(values, dtype, ColumnContext())
    assert codec in (registry.DICT, registry.RLE)
    assert codec == registry.RLE  # sorted -> runs win


def test_selector_warc_ts_delta():
    pdf = generate_pages(np.arange(20000))
    arr = pa.array(pdf["warc_ts"])
    values, dtype = kernel_of(arr)
    codec, payload, params, est = select_and_encode(values, dtype)
    # patched exceptions absorb the session jumps
    assert codec in (registry.DELTA_FOR_BITPACK, registry.DELTA_PFOR_BITPACK)
    assert len(payload) < 0.35 * values.nbytes


def test_selector_url_fsst():
    pdf = generate_pages(np.arange(20000))
    arr = pa.array(pdf["url"], type=pa.string())
    values, dtype = kernel_of(arr)
    codec, payload, params, est = select_and_encode(values, dtype, ColumnContext())
    assert codec == registry.FSST
    raw = int(values[1][-1])
    assert len(payload) < 0.5 * raw


def test_selector_constant_column_rle():
    arr = pa.array([3.14] * 5000, type=pa.float64())
    values, dtype = kernel_of(arr)
    codec, payload, params, est = select_and_encode(values, dtype)
    # card=1 DICT, 1-run RLE and constant-int ALP are all near-optimal
    assert codec in (registry.RLE, registry.DICT, registry.ALP)
    assert len(payload) < 40


def test_selector_never_worse_than_plain():
    rng = np.random.default_rng(3)
    arr = pa.array(rng.standard_normal(4096))
    values, dtype = kernel_of(arr)
    codec, payload, params, est = select_and_encode(values, dtype)
    plain, _ = registry.encode_block(values, dtype, registry.PLAIN)
    assert len(payload) <= len(plain)


@pytest.mark.parametrize(
    "arr",
    [
        pa.array(["a", None, "ccc", None, ""], type=pa.string()),
        pa.array([1, None, 3, None, -5], type=pa.int64()),
        pa.array([None, None, None], type=pa.float64()),
        pa.array([True, None, False], type=pa.bool_()),
        pa.array(
            [1_600_000_000_000_000, None, 1_600_000_100_000_000],
            type=pa.timestamp("us"),
        ),
        pa.array([b"\x00\xff", None, b""], type=pa.binary()),
        pa.array([], type=pa.string()),
    ],
    ids=["str-null", "int-null", "all-null", "bool-null", "ts-null", "bin-null", "empty"],
)
def test_framing_null_roundtrip(arr):
    values, dtype, validity, null_count, raw = framing.to_kernel(arr)
    for codec in registry.candidate_codecs(dtype):
        if codec == registry.FSST and len(arr) - null_count == 0:
            continue
        payload, params = registry.encode_block(values, dtype, codec)
        out_vals = registry.decode_block(
            payload, params, len(arr) - null_count, dtype, codec
        )
        rebuilt = framing.from_kernel(
            out_vals, str(arr.type), validity, len(arr), null_count
        )
        assert rebuilt.equals(arr.cast(arr.type)), f"{codec}: {rebuilt} != {arr}"


def test_selector_full_range_int64_hashes():
    """64-bit hash/fingerprint columns whose range exceeds 2**63 must not
    crash the cost model (int64 subtraction overflow) — the codecs are
    wrap-correct mod 2**64, the estimate must be too."""
    rng = np.random.default_rng(7)
    v = rng.integers(np.iinfo(np.int64).min, np.iinfo(np.int64).max, 4096,
                     dtype=np.int64)
    v[0], v[1] = np.iinfo(np.int64).min, np.iinfo(np.int64).max
    arr = pa.array(v)
    values, dtype = kernel_of(arr)
    codec, payload, params, est = select_and_encode(values, dtype)
    out = registry.decode_block(payload, params, len(v), dtype, codec)
    assert np.array_equal(np.asarray(out).view(np.int64), v)


def test_block_ranges_bounded():
    t = pa.table({"x": pa.array(np.arange(100_000)), "s": pa.array(["y"] * 100_000)})
    ranges = framing.block_ranges(t, block_rows=30_000)
    assert [r[0] for r in ranges] == [0, 30_000, 60_000, 90_000]
    assert sum(r[1] for r in ranges) == 100_000
    # byte-bounded framing kicks in for fat rows
    fat = pa.table({"b": pa.array([b"z" * 10_000] * 5_000, type=pa.binary())})
    ranges = framing.block_ranges(fat, block_rows=65536, block_bytes=1 << 20)
    assert all(ln <= 1 << 20 // 10_000 + 256 for _, ln in ranges)
    assert len(ranges) > 10
