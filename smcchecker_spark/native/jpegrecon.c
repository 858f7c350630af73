/* Baseline-JPEG reconstruction kernel: dequant + fixed-point integer
 * IDCT + replication upsample + 16.16 YCbCr->RGB + clip, in one call.
 *
 * Self-contained C99 (stdlib-free) compiled on demand by
 * smcchecker_spark.native with the host `cc` and loaded via ctypes.
 * It computes the IDENTICAL integer arithmetic as the numpy reference
 * in jpegcodec._reconstruct — 2^18-scaled IDCT constants (passed in,
 * the same _IDCT_M literal), pass-1 shift 12 / pass-2 shift 24 with
 * round-half-up biases, integer samples before color convert — so the
 * two paths are property-testable for bit-exact pixel parity and phash
 * never depends on which path decoded the image.
 *
 * Determinism: pure int64 arithmetic; every intermediate fits int64
 * even for hostile streams (|coef| <= 32767 enforced by the scan
 * kernel, qt <= 255 => pass-2 sums <= ~2.2e15), so there is no
 * overflow wrap to agree on. Arithmetic right shift of negative i64 is
 * implementation-defined by C99 but arithmetic on every supported
 * compiler (matching numpy's int64 >>).
 *
 * Layout, per component c (natural-order coefficients):
 *   coefs[c] : int32, nb*64, block b = by*bw + bx (block raster)
 *   qts[c]   : int32, 64, natural order
 *   geo[4c..]: bw, bh, sx, sy  (x >> sx / y >> sy index the plane —
 *              replication factors are 1 or 2, stored as shifts 0/1)
 *   offs[c]  : this component's plane offset into scratch
 *              (plane is (bh*8) x (bw*8) int32, row-major)
 * m: the 64 int64 IDCT constants, row-major M[k][i].
 * out: h*w*3 uint8 RGB. Returns 0, or -1 for a bad component count. */

typedef long long i64;
typedef unsigned char u8;

static int clip255(i64 v)
{
    return v < 0 ? 0 : (v > 255 ? 255 : (int)v);
}

long reconstruct(
    const int **coefs, const int **qts,
    const i64 *geo, const i64 *offs,
    long ncomp, i64 h, i64 w,
    int *scratch, const i64 *m, u8 *out)
{
    long c;
    if (ncomp != 1 && ncomp != 3) return -1;

    for (c = 0; c < ncomp; c++) {
        const int *coef = coefs[c];
        const int *qt = qts[c];
        i64 bw = geo[4 * c], bh = geo[4 * c + 1];
        i64 pw = bw * 8;
        int *plane = scratch + offs[c];
        i64 by, bx;
        for (by = 0; by < bh; by++) {
            for (bx = 0; bx < bw; bx++) {
                const int *blk = coef + (by * bw + bx) * 64;
                i64 x[64], t1[64];
                int k, i, j, l;
                for (k = 0; k < 64; k++)
                    x[k] = (i64)blk[k] * qt[k];
                for (i = 0; i < 8; i++) {
                    for (l = 0; l < 8; l++) {
                        i64 s = 0;
                        for (k = 0; k < 8; k++)
                            s += m[k * 8 + i] * x[k * 8 + l];
                        t1[i * 8 + l] = (s + (1 << 11)) >> 12;
                    }
                }
                int *dst = plane + (by * 8) * pw + bx * 8;
                for (i = 0; i < 8; i++) {
                    for (j = 0; j < 8; j++) {
                        i64 s = 0;
                        for (l = 0; l < 8; l++)
                            s += t1[i * 8 + l] * m[l * 8 + j];
                        dst[i * pw + j] =
                            (int)(((s + (1 << 23)) >> 24) + 128);
                    }
                }
            }
        }
    }

    if (ncomp == 1) {
        const int *yp = scratch + offs[0];
        i64 pw = geo[0] * 8;
        i64 y, x;
        for (y = 0; y < h; y++) {
            const int *row = yp + y * pw;
            u8 *o = out + y * w * 3;
            for (x = 0; x < w; x++) {
                int v = clip255(row[x]);
                o[3 * x] = (u8)v;
                o[3 * x + 1] = (u8)v;
                o[3 * x + 2] = (u8)v;
            }
        }
        return 0;
    }

    {
        const int *yp = scratch + offs[0];
        const int *cbp = scratch + offs[1];
        const int *crp = scratch + offs[2];
        i64 ypw = geo[0] * 8, ysx = geo[2], ysy = geo[3];
        i64 cbpw = geo[4] * 8, cbsx = geo[6], cbsy = geo[7];
        i64 crpw = geo[8] * 8, crsx = geo[10], crsy = geo[11];
        i64 y, x;
        for (y = 0; y < h; y++) {
            const int *yrow = yp + (y >> ysy) * ypw;
            const int *cbrow = cbp + (y >> cbsy) * cbpw;
            const int *crrow = crp + (y >> crsy) * crpw;
            u8 *o = out + y * w * 3;
            for (x = 0; x < w; x++) {
                i64 yv = yrow[x >> ysx];
                i64 cb = (i64)cbrow[x >> cbsx] - 128;
                i64 cr = (i64)crrow[x >> crsx] - 128;
                o[3 * x] = (u8)clip255(yv + ((91881 * cr + 32768) >> 16));
                o[3 * x + 1] = (u8)clip255(
                    yv - ((22554 * cb + 46802 * cr + 32768) >> 16));
                o[3 * x + 2] = (u8)clip255(
                    yv + ((116130 * cb + 32768) >> 16));
            }
        }
    }
    return 0;
}
