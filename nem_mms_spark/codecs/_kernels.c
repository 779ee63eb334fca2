/* Native hot-loop kernels for the codec layer.
 *
 * Compiled on first import by nem_mms_spark.codecs.native (gcc -O3 -shared);
 * every function has a pure-numpy twin in the package and the outputs are
 * REQUIRED to be byte-identical (pinned by tests/test_native_kernels.py).
 * The kernels exist because the numpy twins are call-overhead-bound: the
 * FSST greedy matcher walks ~9k-row frontiers through a 13-deep slot loop
 * (~90 small numpy dispatches per step), and bit-packing makes log2(w)
 * strided passes over the chunk.  Here each is one linear C pass.
 *
 * Everything is plain C99 on public knowledge (FSST per Boncz/Neumann/
 * Leis VLDB'20; LSB-first bit-packing).  No allocation: callers pass
 * output buffers sized to the documented worst case.
 */

#include <stdint.h>
#include <string.h>

/* Greedy longest-match FSST encode.
 *
 * dpad:     string bytes, padded with >= 8 zero bytes past offsets[n]
 * offsets:  n+1 int64, offsets[0] == 0
 * code1:    256 ints, byte -> 1-byte symbol code (0 = none)
 * bstart:   65537-entry CSR index by 2-byte little-endian prefix
 * bval/bmsk/blen/bcode: CSR payload, entries in symbol-index order
 *           (the numpy slot order) — a later entry only wins with a
 *           STRICTLY longer match, matching the numpy tie-break
 * out:      worst case 2 * offsets[n] bytes (all escapes)
 * enc_lengths: n int64, encoded bytes per string
 * returns total bytes written to out
 */
int64_t nem_fsst_encode(
    const uint8_t *dpad, const int64_t *offsets, int64_t n,
    const int32_t *code1, const int32_t *bstart,
    const uint64_t *bval, const uint64_t *bmsk,
    const int32_t *blen, const int32_t *bcode,
    uint8_t *out, int64_t *enc_lengths)
{
    int64_t o = 0;
    for (int64_t i = 0; i < n; i++) {
        int64_t pos = offsets[i], end = offsets[i + 1];
        int64_t o0 = o;
        while (pos < end) {
            uint64_t w;
            memcpy(&w, dpad + pos, 8); /* little-endian load */
            uint8_t b0 = dpad[pos];
            int32_t best_len = 1;
            int32_t best_code = code1[b0];
            int64_t room = end - pos;
            if (room >= 2) {
                uint32_t pfx = (uint32_t)b0 | ((uint32_t)dpad[pos + 1] << 8);
                int32_t s = bstart[pfx], e = bstart[pfx + 1];
                for (; s < e; s++) {
                    int32_t ln = blen[s];
                    if (ln > best_len && ln <= room
                        && (w & bmsk[s]) == bval[s]) {
                        best_len = ln;
                        best_code = bcode[s];
                    }
                }
            }
            if (best_code > 0) {
                out[o++] = (uint8_t)best_code;
            } else {
                out[o++] = 0;
                out[o++] = b0;
            }
            pos += best_len;
        }
        enc_lengths[i] = o - o0;
    }
    return o;
}

/* LSB-first bit-packing of n `width`-bit values (1 <= width <= 56).
 * out must hold (n * width + 7) / 8 bytes.  Identical byte stream to
 * numpy packbits(bitorder="little") of the value bits. */
void nem_pack_uints(const uint64_t *v, int64_t n, int32_t width,
                    uint8_t *out)
{
    uint64_t acc = 0;
    int32_t nbits = 0;
    int64_t o = 0;
    for (int64_t i = 0; i < n; i++) {
        acc |= v[i] << nbits;
        nbits += width;
        while (nbits >= 8) {
            out[o++] = (uint8_t)acc;
            acc >>= 8;
            nbits -= 8;
        }
    }
    if (nbits > 0)
        out[o] = (uint8_t)acc;
}

/* Inverse of nem_pack_uints -> n uint64 values. `in` must hold at least
 * (n * width + 7) / 8 readable bytes. */
void nem_unpack_uints(const uint8_t *in, int64_t n, int32_t width,
                      uint64_t *out)
{
    uint64_t acc = 0;
    int32_t nbits = 0;
    int64_t p = 0;
    uint64_t mask = (width < 64) ? ((1ULL << width) - 1) : ~0ULL;
    for (int64_t i = 0; i < n; i++) {
        while (nbits < width) {
            acc |= (uint64_t)in[p++] << nbits;
            nbits += 8;
        }
        out[i] = acc & mask;
        acc >>= width;
        nbits -= width;
    }
}

/* Word-token boundaries: sorted unique union of {offsets[0..n]} and
 * {space_pos + 1}.  out must hold offsets[n] - offsets[0] + n + 2
 * entries (worst case: all spaces).  Returns count written. */
int64_t nem_wd_tokenize(const uint8_t *data, const int64_t *offsets,
                        int64_t n, int64_t *out)
{
    int64_t m = 0;
    out[m++] = offsets[0];
    for (int64_t i = 0; i < n; i++) {
        int64_t end = offsets[i + 1];
        int64_t pos = offsets[i];
        /* SWAR: 8 bytes per step, branch only on words containing a
         * space (~1 space per 6 bytes in text, so most steps that do
         * branch extract 1-2 hits via ctz) */
        while (pos + 8 <= end) {
            uint64_t w;
            memcpy(&w, data + pos, 8);
            uint64_t x = w ^ 0x2020202020202020ULL;
            /* exact zero-byte finder (no cross-byte borrow artifacts):
             * bit7 of each lane set iff that byte of x is zero */
            uint64_t hit = ~(((x & 0x7F7F7F7F7F7F7F7FULL)
                              + 0x7F7F7F7F7F7F7F7FULL)
                             | x | 0x7F7F7F7F7F7F7F7FULL);
            while (hit) {
                int k = __builtin_ctzll(hit) >> 3;
                int64_t p = pos + k + 1;
                if (p != end)
                    out[m++] = p;
                hit &= hit - 1;
            }
            pos += 8;
        }
        for (; pos < end; pos++) {
            if (data[pos] == 0x20 && pos + 1 != end)
                out[m++] = pos + 1;
        }
        if (out[m - 1] != end) /* dedup: empty strings repeat a boundary */
            out[m++] = end;
    }
    return m;
}
