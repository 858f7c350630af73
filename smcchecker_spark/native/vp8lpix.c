/* VP8L entropy-coded-image pixel-loop kernel.
 *
 * Self-contained C99 (stdlib-free) compiled on demand by
 * smcchecker_spark.native and loaded via ctypes. Translates the
 * per-pixel symbol loop of webpcodec._read_entropy_image line for
 * line — same LUT packing ((symbol << 5) | code length over
 * bit-reversed LSB window keys), same absolute-bit-cursor semantics,
 * same error conditions — so the Python loop stays the
 * property-tested reference and fallback. Tree construction, transform
 * inverses and channel splitting remain in Python/numpy; only the
 * sequential symbol walk crosses into C.
 *
 * Error returns (mapped to the Python path's ValueError texts):
 *   -1 bad prefix code   -2 truncated stream
 *   -6 LZ77 reference out of bounds
 *   -7 cache index without cache
 */

typedef long long i64;
typedef unsigned char u8;
typedef unsigned int u32;

/* next-16-bits LSB-first at absolute bit position p, zero-padded */
static u32 win16(const u8 *d, i64 nbytes, i64 p)
{
    i64 i = p >> 3;
    u32 b0 = i < nbytes ? d[i] : 0;
    u32 b1 = i + 1 < nbytes ? d[i + 1] : 0;
    u32 b2 = i + 2 < nbytes ? d[i + 2] : 0;
    return ((b0 | (b1 << 8) | (b2 << 16)) >> (p & 7)) & 0xFFFF;
}

/* read one prefix-coded symbol; returns symbol or negative error.
 * lut==0 means a single-symbol tree (sng), consuming zero bits. */
static long rdsym(const u8 *d, i64 nbytes, i64 nbits, i64 *p,
                  const int *lut, long mask, long sng)
{
    if (!lut) return sng;
    if (*p >= nbits) return -2;
    {
        int v = lut[win16(d, nbytes, *p) & mask];
        long ln = v & 31;
        if (ln == 0 || *p + ln > nbits) return -1;
        *p += ln;
        return v >> 5;
    }
}

long decode_pixels(
    const u8 *data, i64 nbytes, i64 p0,
    i64 w, i64 h,
    long ngroups,
    const int **luts,                      /* per (group*5 + slot) */
    const i64 *masks, const i64 *singles,  /* -1 = use lut */
    long meta_bits, const int *group_of, i64 meta_w,
    long cache_bits,
    const int *dist_map,                   /* 240 ints: dx,dy pairs */
    u32 *out,
    i64 *final_pos)
{
    i64 nbits = nbytes * 8;
    i64 p = p0;
    i64 total = w * h;
    i64 pos = 0;
    u32 cache[1 << 11];
    long cache_size = cache_bits ? (1L << cache_bits) : 0;
    long cache_shift = cache_bits ? (32 - cache_bits) : 0;
    long cur_group = 0;
    const int *glut, *rlut, *blut, *alut, *dlut;
    long gmask, rmask, bmask, amask, dmask;
    long gsng, rsng, bsng, asng, dsng;
    long k;

    if (cache_size > (1L << 11)) return -7;
    for (k = 0; k < cache_size; k++) cache[k] = 0;

#define LOAD_GROUP(g) do { \
    long b_ = (g) * 5; \
    glut = singles[b_ + 0] >= 0 ? 0 : luts[b_ + 0]; \
    rlut = singles[b_ + 1] >= 0 ? 0 : luts[b_ + 1]; \
    blut = singles[b_ + 2] >= 0 ? 0 : luts[b_ + 2]; \
    alut = singles[b_ + 3] >= 0 ? 0 : luts[b_ + 3]; \
    dlut = singles[b_ + 4] >= 0 ? 0 : luts[b_ + 4]; \
    gmask = masks[b_ + 0]; rmask = masks[b_ + 1]; \
    bmask = masks[b_ + 2]; amask = masks[b_ + 3]; \
    dmask = masks[b_ + 4]; \
    gsng = singles[b_ + 0]; rsng = singles[b_ + 1]; \
    bsng = singles[b_ + 2]; asng = singles[b_ + 3]; \
    dsng = singles[b_ + 4]; \
} while (0)

    (void)ngroups;
    LOAD_GROUP(0);

    while (pos < total) {
        long s;
        if (group_of) {
            i64 y = pos / w, x = pos - y * w;
            long gi = group_of[(y >> meta_bits) * meta_w
                               + (x >> meta_bits)];
            if (gi != cur_group) {
                cur_group = gi;
                LOAD_GROUP(gi);
            }
        }
        s = rdsym(data, nbytes, nbits, &p, glut, gmask, gsng);
        if (s < 0) return s;
        if (s < 256) { /* literal */
            long red, blue, alpha;
            u32 px;
            red = rdsym(data, nbytes, nbits, &p, rlut, rmask, rsng);
            if (red < 0) return red;
            blue = rdsym(data, nbytes, nbits, &p, blut, bmask, bsng);
            if (blue < 0) return blue;
            alpha = rdsym(data, nbytes, nbits, &p, alut, amask, asng);
            if (alpha < 0) return alpha;
            px = ((u32)alpha << 24) | ((u32)red << 16)
               | ((u32)s << 8) | (u32)blue;
            out[pos++] = px;
            if (cache_size)
                cache[(u32)(0x1E35A7BDu * px) >> cache_shift] = px;
        } else if (s < 256 + 24) { /* LZ77 backward reference */
            long code = s - 256;
            i64 length, dist;
            long dcode;
            if (code < 4) {
                length = code + 1;
            } else {
                long extra = (code - 2) >> 1;
                if (p + extra > nbits) return -2;
                length = ((i64)(2 + (code & 1)) << extra)
                       + (win16(data, nbytes, p) & ((1L << extra) - 1))
                       + 1;
                p += extra;
            }
            dcode = (long)rdsym(data, nbytes, nbits, &p,
                                dlut, dmask, dsng);
            if (dcode < 0) return dcode;
            if (dcode < 4) {
                dist = dcode + 1;
            } else {
                long extra = (dcode - 2) >> 1;
                i64 eb;
                if (p + extra > nbits) return -2;
                if (extra <= 16) {
                    eb = win16(data, nbytes, p) & ((1L << extra) - 1);
                } else {
                    eb = win16(data, nbytes, p);
                    eb |= (i64)(win16(data, nbytes, p + 16)
                                & ((1L << (extra - 16)) - 1)) << 16;
                }
                dist = ((i64)(2 + (dcode & 1)) << extra) + eb + 1;
                p += extra;
            }
            if (dist > 120) {
                dist -= 120;
            } else {
                long dx = dist_map[2 * (dist - 1)];
                long dy = dist_map[2 * (dist - 1) + 1];
                dist = dy * w + dx;
                if (dist < 1) dist = 1;
            }
            if (dist > pos || pos + length > total) return -6;
            if (cache_size) {
                i64 j;
                for (j = 0; j < length; j++) {
                    u32 px = out[pos - dist];
                    out[pos++] = px;
                    cache[(u32)(0x1E35A7BDu * px) >> cache_shift] = px;
                }
            } else {
                i64 j;
                for (j = 0; j < length; j++) {
                    out[pos] = out[pos - dist];
                    pos++;
                }
            }
        } else { /* color-cache hit */
            long idx = s - 256 - 24;
            if (idx >= cache_size) return -7;
            out[pos++] = cache[idx];
        }
    }
    *final_pos = p;
    return 0;
}
