"""ALP-style lossless floating-point codec (float64).

Follows the public ALP design (Afroozeh & Boncz, "ALP: Adaptive Lossless
floating-Point Compression", SIGMOD 2024): most real-world doubles are
decimals — multiply by 10^e, round to integer, and VERIFY per value that
the integer reproduces the original bit pattern through the fixed decode
formula `double(int) / 10^e` (correctly-rounded IEEE division, matching
how decimal data is usually produced).  Values that fail (true
randoms, NaN payloads, -0.0, inf) are stored verbatim as patched
exceptions.  The integer stream then compresses with the existing
frame-of-reference bit-packer.

The exponent is chosen on a deterministic sample (no RNG — determinism
requirement from SURVEY.md §7).  Bit-exactness is guaranteed by
construction: encode verifies each value through the exact decode
expression, bitwise (so NaN payloads and signed zeros round-trip).
"""

from __future__ import annotations

import numpy as np

from nem_mms_spark.codecs.primitives import bit_width, pack_uints, unpack_uints

MAX_EXP = 15  # 10**15 < 2**53: exact in float64
_POW10 = 10.0 ** np.arange(MAX_EXP + 1)
_SAMPLE = 1024
_INT_LIMIT = float(1 << 51)  # headroom below 2**53 for safe rounding


def _ints_for(v: np.ndarray, e: int) -> tuple[np.ndarray, np.ndarray]:
    """(candidate int64s, bitwise-ok mask) for exponent e.

    Verification goes through the EXACT decode pipeline — int64 ->
    float64 -> correctly-rounded IEEE division by 10^e — so ok=True
    guarantees a bit-identical round-trip (this also rejects -0.0 and
    NaNs into the exception path).  Division rather than multiplication
    by the inexact 1/10^e: decimals are usually PRODUCED by division, so
    the division decode reproduces far more values exactly."""
    with np.errstate(invalid="ignore", over="ignore"):
        scaled = v * _POW10[e]
        finite = np.isfinite(scaled) & (np.abs(scaled) < _INT_LIMIT)
        d = np.rint(np.where(finite, scaled, 0.0)).astype(np.int64)
        rebuilt = d.astype(np.float64) / _POW10[e]
    ok = finite & (rebuilt.view(np.int64) == v.view(np.int64))
    return d, ok


def choose_exponent(values: np.ndarray) -> tuple[int, float]:
    """Best exponent on a deterministic strided sample -> (e, ok_rate).
    Smallest exponent wins ties (smaller ints -> narrower packs)."""
    v = values[:: max(1, len(values) // _SAMPLE)]
    best_e, best_ok = 0, -1
    for e in range(MAX_EXP + 1):
        _, ok = _ints_for(v, e)
        n_ok = int(ok.sum())
        if n_ok > best_ok:
            best_e, best_ok = e, n_ok
    return best_e, best_ok / max(len(v), 1)


def encode(values: np.ndarray) -> tuple[bytes, dict]:
    v = np.ascontiguousarray(values, dtype=np.float64)
    n = len(v)
    if n == 0:
        return b"", {"e": 0, "ref": 0, "w": 0, "nexc": 0, "pw": 0,
                     "blen": 0, "plen": 0}
    e, _rate = choose_exponent(v)
    ints, ok = _ints_for(v, e)
    exc = np.flatnonzero(~ok)
    ints = ints.copy()
    if len(exc):
        # exceptions get the in-range reference value so they don't widen
        # the packed lane
        fill = ints[ok][0] if ok.any() else 0
        ints[exc] = fill
    ref = int(ints.min())
    deltas = (ints - ref).astype(np.uint64)
    w = bit_width(int(deltas.max()))
    pw = bit_width(int(exc.max())) if len(exc) else 0
    base = pack_uints(deltas, w)
    pos = pack_uints(exc.astype(np.uint64), pw)
    payload = base + pos + v[exc].tobytes()
    return payload, {"e": e, "ref": ref, "w": w, "nexc": int(len(exc)),
                     "pw": pw, "blen": len(base), "plen": len(pos)}


def decode(payload: bytes, params: dict, count: int) -> np.ndarray:
    if count == 0:
        return np.zeros(0, dtype=np.float64)
    blen, plen = params["blen"], params["plen"]
    deltas = unpack_uints(payload[:blen], params["w"], count)
    ints = deltas.astype(np.int64) + np.int64(params["ref"])
    out = ints.astype(np.float64) / _POW10[params["e"]]
    if params["nexc"]:
        pos = unpack_uints(
            payload[blen : blen + plen], params["pw"], params["nexc"]
        ).astype(np.int64)
        raw = np.frombuffer(
            payload, dtype=np.float64, count=params["nexc"],
            offset=blen + plen,
        )
        out[pos] = raw
    return out
