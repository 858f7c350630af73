/* VP8L code-length read kernel: the per-symbol loop that decodes one
 * prefix code's run-length-coded code lengths (RFC 9649 / VP8L spec
 * §6.2.2) — the last Python-per-symbol loop on the WebP decode path
 * once trees are cache-hits and pixels run in vp8lpix.c.
 *
 * Self-contained C99 (stdlib-free) compiled on demand by
 * smcchecker_spark.native, ctypes-loaded. Line-for-line translation of
 * the loop in webpcodec._read_prefix_code — same window semantics
 * (16-bit little-endian window at absolute bit p, zero-padded past the
 * stream end), same error conditions — so the Python loop remains the
 * property-tested reference and fallback.
 *
 * Error returns (mapped back to the Python path's ValueError texts):
 *   -1 bad prefix code   -2 truncated stream   -3 repeat overflow
 */

typedef long long i64;
typedef unsigned char u8;
typedef unsigned int u32;

/* stream bits p..p+15, LSB-first, zero-padded past nbytes */
static u32 window16(const u8 *data, i64 nbytes, i64 p)
{
    i64 i = p >> 3;
    u32 b0 = i < nbytes ? data[i] : 0;
    u32 b1 = i + 1 < nbytes ? data[i + 1] : 0;
    u32 b2 = i + 2 < nbytes ? data[i + 2] : 0;
    return ((b0 | (b1 << 8) | (b2 << 16)) >> (p & 7)) & 0xFFFF;
}

long read_code_lengths(
    const u8 *data, i64 nbits, i64 p0,
    const int *clc_lut, long clc_mask, long clc_single,
    int *lengths, long alphabet_size, long max_symbol,
    i64 *final_pos)
{
    i64 nbytes = (nbits + 7) >> 3;
    i64 p = p0;
    long prev_len = 8;
    long i = 0;
    while (i < alphabet_size) {
        long sym;
        if (max_symbol <= 0)
            break;
        max_symbol -= 1;
        if (clc_single >= 0) {
            sym = clc_single;
        } else {
            int v;
            long ln;
            if (p >= nbits)
                return -2;
            v = clc_lut[window16(data, nbytes, p) & clc_mask];
            ln = v & 31;
            if (ln == 0 || p + ln > nbits)
                return -1;
            p += ln;
            sym = v >> 5;
        }
        if (sym < 16) {
            lengths[i++] = (int)sym;
            if (sym)
                prev_len = sym;
        } else {
            long ebits, base, fill, rep, r;
            if (sym == 16) {
                ebits = 2; base = 3; fill = prev_len;
            } else if (sym == 17) {
                ebits = 3; base = 3; fill = 0;
            } else {
                ebits = 7; base = 11; fill = 0;
            }
            if (p + ebits > nbits)
                return -2;
            rep = base + (window16(data, nbytes, p) & ((1 << ebits) - 1));
            p += ebits;
            if (i + rep > alphabet_size)
                return -3;
            if (fill) {
                for (r = 0; r < rep; r++)
                    lengths[i++] = (int)fill;
            } else {
                i += rep;
            }
        }
    }
    *final_pos = p;
    return 0;
}
