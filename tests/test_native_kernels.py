"""The native C kernels must be byte-identical to their numpy twins.

The numpy implementations remain the source of truth; the C kernels
(codecs/_kernels.c, loaded by codecs/native.py) are pure speed.  Every
test here runs both paths on the same input — real-shaped text, urls,
binary edge cases, randomized fuzz — and asserts bitwise equality of the
full payloads, so any semantic drift in the C port fails loudly.
"""

from __future__ import annotations

import numpy as np
import pytest

from nem_mms_spark.codecs import fsst, native, worddict
from nem_mms_spark.codecs.primitives import pack_uints, unpack_uints

pytestmark = pytest.mark.skipif(
    native.lib is None, reason="native kernels unavailable (no compiler)"
)


class _numpy_only:
    """Temporarily hide the native lib so the numpy twin runs."""

    def __enter__(self):
        self._saved = native.lib
        native.lib = None

    def __exit__(self, *exc):
        native.lib = self._saved


def _chunk(strs: list[bytes]):
    offs = np.zeros(len(strs) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in strs], out=offs[1:])
    return np.frombuffer(b"".join(strs), dtype=np.uint8), offs


def _text_fixture(n_rows: int = 400, seed: int = 11) -> list[bytes]:
    rng = np.random.default_rng(seed)
    words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy",
             "dogs", "and", "cats", "http", "www", "example"]
    return [
        " ".join(rng.choice(words, size=int(rng.integers(3, 40)))).encode()
        for _ in range(n_rows)
    ]


def _url_fixture(n_rows: int = 400, seed: int = 5) -> list[bytes]:
    rng = np.random.default_rng(seed)
    return [
        (f"https://www.site{int(rng.integers(0, 40))}.example.org/"
         f"news/2021/{int(rng.integers(1, 13)):02d}/slug-{i}").encode()
        for i in range(n_rows)
    ]


_EDGE_CASES = [
    [b"", b"", b"a", b""],
    [b" ", b"  ", b"   x ", b"x  y", b" !after-space-bang! "],
    [bytes(range(256)), b"\x00\x00\x00", b"\x20\x21" * 40, b"a" * 1000],
    [b"ab" * 500, b""],
    [],
]


@pytest.mark.parametrize("width", [1, 3, 7, 8, 13, 14, 24, 31, 33, 48, 56])
def test_pack_unpack_uints_match_numpy(width):
    rng = np.random.default_rng(width)
    for n in (1, 7, 63, 64, 65, 1000, 4096):
        v = rng.integers(0, 1 << width, size=n, dtype=np.uint64)
        p_c = pack_uints(v, width)
        u_c = unpack_uints(p_c, width, n)
        with _numpy_only():
            p_np = pack_uints(v, width)
            u_np = unpack_uints(p_np, width, n)
        assert p_c == p_np
        assert np.array_equal(u_c, u_np)


@pytest.mark.parametrize(
    "strs",
    [_text_fixture(), _url_fixture(), *_EDGE_CASES],
    ids=["text", "urls", "edge0", "edge1", "edge2", "edge3", "empty"],
)
def test_wd_tokenize_matches_numpy(strs):
    data, offs = _chunk(strs)
    a = worddict.tokenize(data, offs)
    with _numpy_only():
        b = worddict.tokenize(data, offs)
    assert np.array_equal(a, b)


def test_wd_tokenize_fuzz_binary():
    rng = np.random.default_rng(42)
    for _ in range(100):
        strs = [
            bytes(rng.integers(0, 256, size=int(rng.integers(0, 60)))
                  .astype(np.uint8))
            for _ in range(int(rng.integers(0, 30)))
        ]
        data, offs = _chunk(strs)
        a = worddict.tokenize(data, offs)
        with _numpy_only():
            b = worddict.tokenize(data, offs)
        assert np.array_equal(a, b)


@pytest.mark.parametrize(
    "strs",
    [_text_fixture(), _url_fixture(), *_EDGE_CASES[:4]],
    ids=["text", "urls", "edge0", "edge1", "edge2", "edge3"],
)
def test_fsst_encode_matches_numpy(strs):
    data, offs = _chunk(strs)
    table = fsst.train(data, offs)
    p_c, prm_c = fsst.encode(data, offs, table=table)
    with _numpy_only():
        p_np, prm_np = fsst.encode(data, offs, table=table)
    assert p_c == p_np
    assert prm_c == prm_np
    # round-trip through the (shared) decoder as a safety net
    d, o = fsst.decode(p_c, prm_c, len(strs))
    assert bytes(d[: o[-1]]) == b"".join(strs)


@pytest.mark.parametrize(
    "strs",
    [_text_fixture(), _url_fixture(), *_EDGE_CASES[:4]],
    ids=["text", "urls", "edge0", "edge1", "edge2", "edge3"],
)
def test_worddict_encode_matches_numpy(strs):
    data, offs = _chunk(strs)
    p_c = worddict.encode(data, offs)
    with _numpy_only():
        p_np = worddict.encode(data, offs)
    assert p_c == p_np
    d, o = worddict.decode(p_c[0], p_c[1], len(strs))
    assert bytes(d[: o[-1]]) == b"".join(strs)
