"""Codec registry: name -> (encode, decode) dispatch per physical kind.

Physical kinds:
  numeric — numpy array of the chunk's non-null values; `dtype` is the
            numpy dtype string recorded in the block row ("<i8", "<f8",
            "<i4", "<f4", "u1", ...).  Timestamps travel as int64 epoch
            units (unit recorded by the framing layer), booleans as u1 —
            mirroring the reference's fixed six-type surface
            (/root/reference/src/flatfile.rs:134-145).
  bytes   — (data: uint8 ndarray, offsets: int64 ndarray), dtype "bytes".

The registry is the analogue of the reference's Package::schema() lookup
(/root/reference/src/packages/mod.rs:102-112): a static map consulted per
column chunk, with unknown ids a hard error.
"""

from __future__ import annotations

import numpy as np

from nem_mms_spark.codecs import alp, basic, fsst, worddict

PLAIN = "PLAIN"
DICT = "DICT"
RLE = "RLE"
FOR_BITPACK = "FOR_BITPACK"
DELTA_FOR_BITPACK = "DELTA_FOR_BITPACK"
PFOR_BITPACK = "PFOR_BITPACK"
DELTA_PFOR_BITPACK = "DELTA_PFOR_BITPACK"
FSST = "FSST"
WORD_DICT = "WORD_DICT"
ALP = "ALP"

INT_DTYPES = {"<i8", "<i4", "<i2", "i1", "u1"}
FLOAT_DTYPES = {"<f8", "<f4"}
BYTES_DTYPE = "bytes"

# candidate codecs per kind, in decode-cheapness order (ties in the
# selector resolve toward the earlier entry)
_NUMERIC_INT_CANDIDATES = [
    PLAIN, FOR_BITPACK, DELTA_FOR_BITPACK, PFOR_BITPACK,
    DELTA_PFOR_BITPACK, DICT, RLE,
]
# ALP operates on float64 only (f4 values rarely scale to narrow ints
# losslessly and the codec does not implement the f4 path) — candidates
# are dtype-exact so callers can trial-encode every listed codec
_NUMERIC_F8_CANDIDATES = [PLAIN, ALP, DICT, RLE]
_NUMERIC_F4_CANDIDATES = [PLAIN, DICT, RLE]
_BYTES_CANDIDATES = [PLAIN, DICT, RLE, WORD_DICT, FSST]


def candidate_codecs(dtype: str) -> list[str]:
    if dtype == BYTES_DTYPE:
        return list(_BYTES_CANDIDATES)
    if dtype in INT_DTYPES:
        return list(_NUMERIC_INT_CANDIDATES)
    if dtype == "<f8":
        return list(_NUMERIC_F8_CANDIDATES)
    if dtype == "<f4":
        return list(_NUMERIC_F4_CANDIDATES)
    raise ValueError(f"unsupported dtype {dtype!r}")


def encode_block(values, dtype: str, codec: str, **kw) -> tuple[bytes, dict]:
    """Encode one column chunk's non-null values with a specific codec."""
    if dtype == BYTES_DTYPE:
        data, offsets = values
        if codec == PLAIN:
            return basic.encode_plain_bytes(data, offsets)
        if codec == DICT:
            return basic.encode_dict_bytes(data, offsets, **kw)
        if codec == RLE:
            return basic.encode_rle_bytes(data, offsets, **kw)
        if codec == WORD_DICT:
            return worddict.encode(data, offsets, **kw)
        if codec == FSST:
            return fsst.encode(data, offsets, **kw)
        raise ValueError(f"codec {codec} not applicable to bytes")
    arr = np.asarray(values)
    if codec == ALP:
        if dtype != "<f8":
            raise ValueError("ALP supports float64 only")
        return alp.encode(arr)
    if dtype in FLOAT_DTYPES and codec in (DICT, RLE):
        # operate on the bit pattern: NaN != NaN breaks value equality but
        # the round-trip contract is bit-identity, not numeric equality
        arr = arr.view("<u8" if dtype == "<f8" else "<u4")
    if codec == PLAIN:
        return basic.encode_plain_numeric(arr)
    if codec == DICT:
        return basic.encode_dict_numeric(arr, **kw)
    if codec == RLE:
        return basic.encode_rle_numeric(arr)
    if codec == FOR_BITPACK:
        _require_int(dtype, codec)
        return basic.encode_for_bitpack(arr)
    if codec == DELTA_FOR_BITPACK:
        _require_int(dtype, codec)
        return basic.encode_delta_for_bitpack(arr)
    if codec == PFOR_BITPACK:
        _require_int(dtype, codec)
        return basic.encode_pfor_bitpack(arr)
    if codec == DELTA_PFOR_BITPACK:
        _require_int(dtype, codec)
        return basic.encode_delta_pfor_bitpack(arr)
    raise ValueError(f"unknown codec {codec!r}")


def decode_block(payload: bytes, params: dict, count: int, dtype: str, codec: str):
    """Exact inverse of encode_block."""
    if dtype == BYTES_DTYPE:
        if codec == PLAIN:
            return basic.decode_plain_bytes(payload, params, count)
        if codec == DICT:
            return basic.decode_dict_bytes(payload, params, count)
        if codec == RLE:
            return basic.decode_rle_bytes(payload, params, count)
        if codec == WORD_DICT:
            return worddict.decode(payload, params, count)
        if codec == FSST:
            return fsst.decode(payload, params, count)
        raise ValueError(f"codec {codec} not applicable to bytes")
    if codec == ALP:
        return alp.decode(payload, params, count)
    bits = None
    if dtype in FLOAT_DTYPES and codec in (DICT, RLE):
        bits, dtype = dtype, ("<u8" if dtype == "<f8" else "<u4")
    if codec == PLAIN:
        return basic.decode_plain_numeric(payload, params, count, dtype)
    if codec == DICT:
        out = basic.decode_dict_numeric(payload, params, count, dtype)
        return out.view(bits) if bits else out
    if codec == RLE:
        out = basic.decode_rle_numeric(payload, params, count, dtype)
        return out.view(bits) if bits else out
    if codec == FOR_BITPACK:
        return basic.decode_for_bitpack(payload, params, count, dtype)
    if codec == DELTA_FOR_BITPACK:
        return basic.decode_delta_for_bitpack(payload, params, count, dtype)
    if codec == PFOR_BITPACK:
        return basic.decode_pfor_bitpack(payload, params, count, dtype)
    if codec == DELTA_PFOR_BITPACK:
        return basic.decode_delta_pfor_bitpack(payload, params, count, dtype)
    raise ValueError(f"unknown codec {codec!r}")


def _require_int(dtype: str, codec: str) -> None:
    if dtype not in INT_DTYPES:
        raise ValueError(f"{codec} requires an integer dtype, got {dtype!r}")
