"""WORD_DICT codec: lossless space-tokenized dictionary coding."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from nem_mms_spark.codecs import registry


def chunk(strs):
    off = np.zeros(len(strs) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in strs], out=off[1:])
    return np.frombuffer(b"".join(strs), dtype=np.uint8), off


def roundtrip(strs):
    data, off = chunk(strs)
    p, pr = registry.encode_block((data, off), "bytes", "WORD_DICT")
    od, oo = registry.decode_block(p, pr, len(strs), "bytes", "WORD_DICT")
    b = od.tobytes()
    return [b[oo[i] : oo[i + 1]] for i in range(len(strs))], len(p)


@pytest.mark.parametrize(
    "strs",
    [
        [],
        [b""],
        [b" ", b"  ", b"   "],
        [b"no-spaces-here", b"another"],
        [b"trailing space ", b" leading", b"a b c"],
        [b"\x00 \x00", b"\x20\x20nul\x00"],
        [bytes(range(256))] * 2,
    ],
    ids=["empty", "empty-str", "all-spaces", "no-spaces", "mixed", "nul", "binary"],
)
def test_worddict_roundtrip_cases(strs):
    got, _size = roundtrip(strs)
    assert got == strs


@given(st.lists(st.binary(max_size=60), max_size=80))
@settings(max_examples=60, deadline=None)
def test_worddict_roundtrip_property(strs):
    got, _size = roundtrip(strs)
    assert got == strs


def test_worddict_beats_fsst_on_natural_text():
    words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog"]
    rng = np.random.default_rng(5)
    strs = [
        " ".join(words[i] for i in rng.integers(0, 8, size=60)).encode()
        for _ in range(3000)
    ]
    data, off = chunk(strs)
    pw, _ = registry.encode_block((data, off), "bytes", "WORD_DICT")
    pf, _ = registry.encode_block((data, off), "bytes", "FSST")
    assert len(pw) < len(pf)
    assert len(pw) < 0.25 * int(off[-1])


def test_selector_picks_worddict_for_text():
    from nem_mms_spark import framing
    from nem_mms_spark.datagen.webpages import generate_pages
    from nem_mms_spark.selector import ColumnContext, select_and_encode
    import pyarrow as pa

    pdf = generate_pages(np.arange(8000))
    arr = pa.Table.from_pandas(pdf, preserve_index=False).column("text").combine_chunks()
    values, dtype, _v, _nc, _raw = framing.to_kernel(arr)
    codec, payload, params, est = select_and_encode(values, dtype, ColumnContext())
    assert codec == "WORD_DICT"
