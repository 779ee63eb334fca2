"""FSST-style static-symbol-table string compression, pure numpy.

Follows the publicly described FSST design (Boncz/Neumann/Leis, VLDB 2020):
a table of at most 255 symbols of 1..8 bytes, 1-byte output codes, code 0 as
escape (escape + raw byte = 2 bytes).  The symbol table is *trained* on a
sample via iterative most-frequent-adjacent-pair merging (re-pair style,
which keeps both training and encoding fully vectorizable in numpy — no
per-row Python, per the engine mandate), rather than FSST's suffix-oriented
construction; the on-disk format and decode side match the FSST contract:
decode needs only the code->symbol table.

Reference ancestor: the reference delegates all string encoding to parquet
defaults (/root/reference/src/packages/mod.rs:121-127); this module is part
of the codec layer that replaces that.

Chunk I/O shape: (data: uint8 ndarray, offsets: int64 ndarray), the zero-copy
layout of an Arrow binary/string column.
"""

from __future__ import annotations

import numpy as np

from nem_mms_spark.codecs.primitives import pack_uints, unpack_uints, bit_width

_SENTINEL = np.int32(-1)
MAX_SYMBOL_LEN = 8
MAX_CODES = 255  # code 0 is the escape marker
DEFAULT_MAX_MERGES = 255
_MAX_TRAIN_BYTES = 1 << 20


class FsstTable:
    """Trained encoder state: merge rules (encode side) + code table."""

    __slots__ = ("rules", "symbols", "code_of", "expand", "expand_lens")

    def __init__(self, rules, symbols, code_of):
        self.rules = rules          # list[(a, b, new_id)]
        self.symbols = symbols     # dict[token_id] -> bytes (merged ids only)
        self.code_of = code_of     # dict[token_id] -> output code (1..255)
        self._build_expansion()

    def _build_expansion(self):
        """Per-token output byte strings: coded -> [code]; uncoded raw byte
        -> [0, byte]; uncoded merged symbol -> per-byte expansion of its
        constituent bytes."""
        n_ids = 256 + len(self.rules)
        outs = []
        for tid in range(n_ids):
            code = self.code_of.get(tid)
            if code is not None:
                outs.append(bytes([code]))
            elif tid < 256:
                outs.append(bytes([0, tid]))
            else:
                raw = self.symbols[tid]
                outs.append(b"".join(outs[b] for b in raw))
        lens = np.array([len(o) for o in outs], dtype=np.int64)
        mat = np.zeros((n_ids, int(lens.max()) if n_ids else 1), dtype=np.uint8)
        for i, o in enumerate(outs):
            mat[i, : len(o)] = np.frombuffer(o, dtype=np.uint8)
        self.expand = mat
        self.expand_lens = lens

    def serialized_symbols(self) -> bytes:
        """Decode-side table: for codes 1..n in order, len byte + bytes."""
        items = sorted(self.code_of.items(), key=lambda kv: kv[1])
        out = bytearray([len(items)])
        for tid, _code in items:
            sym = self.symbols[tid] if tid >= 256 else bytes([tid])
            out.append(len(sym))
            out += sym
        return bytes(out)


def _tokenize(data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Byte stream -> int32 token array with -1 sentinels between strings
    (merges never cross string boundaries)."""
    n = len(offsets) - 1
    nbytes = int(offsets[-1] - offsets[0])
    total = nbytes + max(n - 1, 0)
    tokens = np.full(total, _SENTINEL, dtype=np.int32)
    if nbytes:
        lengths = np.diff(offsets)
        row_of_byte = np.repeat(np.arange(n, dtype=np.int64), lengths)
        dest = np.arange(nbytes, dtype=np.int64) + row_of_byte
        tokens[dest] = data[offsets[0] : offsets[-1]].astype(np.int32)
    return tokens


def _apply_merge(tokens: np.ndarray, a: int, b: int, new_id: int) -> np.ndarray:
    """One greedy left-to-right merge pass of adjacent pair (a, b)."""
    if len(tokens) < 2:
        return tokens
    m = (tokens[:-1] == a) & (tokens[1:] == b)
    idx = np.flatnonzero(m)
    if len(idx) == 0:
        return tokens
    if a == b:
        # overlapping matches (runs of `a`): greedy keeps every other match
        # within each run of consecutive match positions
        run_key = idx - np.arange(len(idx))
        starts = np.empty(len(idx), dtype=np.int64)
        first = np.concatenate([[True], run_key[1:] != run_key[:-1]])
        starts[first] = idx[first]
        np.maximum.accumulate(np.where(first, idx, np.int64(-1)), out=starts)
        idx = idx[((idx - starts) % 2) == 0]
    keep = np.ones(len(tokens), dtype=bool)
    keep[idx + 1] = False
    tokens[idx] = new_id
    return tokens[keep]


def train(
    data: np.ndarray,
    offsets: np.ndarray,
    max_merges: int = DEFAULT_MAX_MERGES,
    max_train_bytes: int = _MAX_TRAIN_BYTES,
) -> FsstTable:
    """Build a symbol table from (a prefix sample of) the chunk."""
    n = len(offsets) - 1
    if n and offsets[-1] - offsets[0] > max_train_bytes:
        cut = int(np.searchsorted(offsets, offsets[0] + max_train_bytes))
        cut = max(cut, 1)
        offsets = offsets[: cut + 1]
    tokens = _tokenize(data, offsets)
    rules: list[tuple[int, int, int]] = []
    symbols: dict[int, bytes] = {}
    sym_len = np.ones(256 + max_merges, dtype=np.int64)
    next_id = 256
    min_count = max(4, len(tokens) // 8192)
    for _ in range(max_merges):
        if len(tokens) < 2:
            break
        left, right = tokens[:-1], tokens[1:]
        valid = (left >= 0) & (right >= 0)
        valid &= (sym_len[left] + sym_len[right]) <= MAX_SYMBOL_LEN
        if not valid.any():
            break
        keys = left[valid].astype(np.int64) * np.int64(next_id + 1) + right[valid]
        uk, counts = np.unique(keys, return_counts=True)
        best = int(np.argmax(counts))
        if counts[best] < min_count:
            break
        a = int(uk[best] // (next_id + 1))
        b = int(uk[best] % (next_id + 1))
        sa = symbols.get(a, bytes([a]) if a < 256 else b"")
        sb = symbols.get(b, bytes([b]) if b < 256 else b"")
        symbols[next_id] = sa + sb
        sym_len[next_id] = len(sa) + len(sb)
        rules.append((a, b, next_id))
        tokens = _apply_merge(tokens, a, b, next_id)
        next_id += 1

    # assign the 255 output codes by estimated gain on the trained sample
    ids, counts = np.unique(tokens[tokens >= 0], return_counts=True)
    gains = counts * (2 * sym_len[ids] - 1)
    order = np.argsort(-gains, kind="stable")
    chosen = ids[order][:MAX_CODES]
    code_of = {int(tid): i + 1 for i, tid in enumerate(chosen)}
    return FsstTable(rules, symbols, code_of)


def encode(
    data: np.ndarray,
    offsets: np.ndarray,
    table: FsstTable | None = None,
    max_merges: int = DEFAULT_MAX_MERGES,
) -> tuple[bytes, dict]:
    n = len(offsets) - 1
    if table is None:
        table = train(data, offsets, max_merges=max_merges)
    tokens = _tokenize(data, offsets)
    for a, b, new_id in table.rules:
        tokens = _apply_merge(tokens, a, b, new_id)

    # sentinel positions delimit strings in token space
    sent = np.flatnonzero(tokens == _SENTINEL)
    tok_mask = tokens >= 0
    toks = tokens[tok_mask]
    out_lens = table.expand_lens[toks]
    # encoded byte length per string: tokens between sentinels
    cum = np.zeros(len(tokens) + 1, dtype=np.int64)
    np.cumsum(np.where(tok_mask, table.expand_lens[np.maximum(tokens, 0)], 0), out=cum[1:])
    bounds = np.concatenate([[0], sent + 1, [len(tokens)]]) if n else np.zeros(1, dtype=np.int64)
    enc_lengths = cum[np.concatenate([sent, [len(tokens)]])] - cum[bounds[:-1]] if n else np.zeros(0, dtype=np.int64)

    # flatten expansions
    total = int(out_lens.sum())
    if total:
        maxw = table.expand.shape[1]
        grid = table.expand[toks]  # (n_tokens, maxw)
        mask = np.arange(maxw)[None, :] < out_lens[:, None]
        stream = grid[mask]
    else:
        stream = np.zeros(0, dtype=np.uint8)

    lw = bit_width(int(enc_lengths.max())) if n and len(enc_lengths) else 0
    packed = pack_uints(enc_lengths.astype(np.uint64), lw)
    header = table.serialized_symbols()
    payload = header + packed + stream.tobytes()
    return payload, {"hlen": len(header), "lw": lw, "ln": len(packed)}


def _parse_symbols(header: bytes):
    ns = header[0]
    syms = []
    pos = 1
    for _ in range(ns):
        ln = header[pos]
        syms.append(header[pos + 1 : pos + 1 + ln])
        pos += 1 + ln
    return syms


def decode(payload: bytes, params: dict, count: int):
    hlen, lw, ln = params["hlen"], params["lw"], params["ln"]
    syms = _parse_symbols(payload[:hlen])
    enc_lengths = unpack_uints(payload[hlen : hlen + ln], lw, count).astype(np.int64)
    stream = np.frombuffer(payload, dtype=np.uint8, offset=hlen + ln)

    # classify positions: escape markers / escaped data / codes.
    # markers occur only at token starts; inside a maximal run of zero
    # bytes that begins at a token start, markers sit at even offsets.
    z = stream == 0
    if z.any():
        zi = np.flatnonzero(z)
        run_key = zi - np.arange(len(zi))
        first = np.concatenate([[True], run_key[1:] != run_key[:-1]])
        starts = np.where(first, zi, np.int64(-1))
        np.maximum.accumulate(starts, out=starts)
        markers = zi[((zi - starts) % 2) == 0]
    else:
        markers = np.zeros(0, dtype=np.int64)
    is_marker = np.zeros(len(stream), dtype=bool)
    is_marker[markers] = True
    is_data = np.zeros(len(stream), dtype=bool)
    if len(markers):
        is_data[markers + 1] = True
    is_code = ~(is_marker | is_data)

    # token table: decoded bytes per token
    nsym = len(syms)
    maxw = max((len(s) for s in syms), default=1) or 1
    # rows 0..255: code ids (0 unused); rows 256..511: escaped raw bytes
    mat = np.zeros((512, maxw), dtype=np.uint8)
    lens = np.zeros(512, dtype=np.int64)
    for i, s in enumerate(syms):
        mat[i + 1, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        lens[i + 1] = len(s)
    mat[256:512, 0] = np.arange(256)
    lens[256:512] = 1

    tok_pos = np.flatnonzero(is_marker | is_code)
    tok_ids = np.where(
        is_marker[tok_pos],
        stream[np.minimum(tok_pos + 1, len(stream) - 1)].astype(np.int64) + 256,
        stream[tok_pos].astype(np.int64),
    )
    if nsym < 255 and (is_code[tok_pos] & (stream[tok_pos] > nsym)).any():
        raise ValueError("corrupt FSST stream: code beyond symbol table")
    out_lens = lens[tok_ids]
    total = int(out_lens.sum())
    if total:
        grid = mat[tok_ids]
        mask = np.arange(maxw)[None, :] < out_lens[:, None]
        data = grid[mask]
    else:
        data = np.zeros(0, dtype=np.uint8)

    # map encoded-byte string boundaries -> decoded offsets
    enc_bounds = np.zeros(count + 1, dtype=np.int64)
    np.cumsum(enc_lengths, out=enc_bounds[1:])
    cum_dec = np.concatenate([[0], np.cumsum(out_lens)])
    tok_idx = np.searchsorted(tok_pos, enc_bounds, side="left")
    offsets = cum_dec[tok_idx]
    return data, offsets
