/* Native entropy-coding core: range coder + contexts + residual coding.
 *
 * Bit-identical production implementation of the Python executable
 * specification in vvc_mm_tpu/common/cabac.py and residual_coding.py
 * (architecture notes there; reference analog: source/Lib/EncoderLib/
 * BinEncoder.cpp, DecoderLib/BinDecoder.cpp, CABACReader.cpp
 * residual_coding).  Arithmetic coding is inherently sequential per
 * substream — this is the host-side hot loop, so it is C (the TPU handles
 * the pixel math; SURVEY.md §7 "CABAC on host / chunked").
 *
 * Built as a shared library via vvc_mm_tpu/utils/native.py (ctypes).
 */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define PROB_BITS 15
#define PROB_ONE  (1 << PROB_BITS)
#define RATE0 4
#define RATE1 8
#define TOP (1u << 24)

/* ---------------- encoder ---------------- */

typedef struct {
    uint64_t low;
    uint32_t range;
    uint8_t  cache;
    uint64_t cache_size;
    uint8_t *out;
    size_t   out_len, out_cap;
    int32_t *p0, *p1;
    int      nctx;
} Enc;

static void enc_put(Enc *e, uint8_t b) {
    if (e->out_len == e->out_cap) {
        e->out_cap = e->out_cap ? e->out_cap * 2 : 4096;
        e->out = (uint8_t *)realloc(e->out, e->out_cap);
    }
    e->out[e->out_len++] = b;
}

Enc *enc_new(const int32_t *init_p1, int nctx) {
    Enc *e = (Enc *)calloc(1, sizeof(Enc));
    e->low = 0;
    e->range = 0xFFFFFFFFu;
    e->cache = 0;
    e->cache_size = 1;   /* first shift emits the (ignored) 0 cache */
    e->nctx = nctx;
    e->p0 = (int32_t *)malloc(nctx * sizeof(int32_t));
    e->p1 = (int32_t *)malloc(nctx * sizeof(int32_t));
    memcpy(e->p0, init_p1, nctx * sizeof(int32_t));
    memcpy(e->p1, init_p1, nctx * sizeof(int32_t));
    return e;
}

void enc_free(Enc *e) {
    if (!e) return;
    free(e->out); free(e->p0); free(e->p1); free(e);
}

static void shift_low(Enc *e) {
    if (e->low < 0xFF000000ull || e->low > 0xFFFFFFFFull) {
        uint32_t carry = (uint32_t)(e->low >> 32);
        uint32_t c = e->cache;
        while (e->cache_size) {
            enc_put(e, (uint8_t)((c + carry) & 0xFF));
            c = 0xFF;
            e->cache_size--;
        }
        e->cache = (uint8_t)((e->low >> 24) & 0xFF);
    }
    e->cache_size++;
    e->low = (e->low << 8) & 0xFFFFFFFFull;
}

static void enc_encode(Enc *e, int bin, int p1) {
    uint32_t bound = (e->range >> PROB_BITS) * (uint32_t)(PROB_ONE - p1);
    if (bin) {
        e->low += bound;
        e->range -= bound;
    } else {
        e->range = bound;
    }
    while (e->range < TOP) {
        e->range <<= 8;
        shift_low(e);
    }
}

void enc_bin(Enc *e, int bin, int ctx) {
    int p = (e->p0[ctx] + e->p1[ctx]) >> 1;
    if (p < 1) p = 1;
    if (p > PROB_ONE - 1) p = PROB_ONE - 1;
    enc_encode(e, bin, p);
    if (bin) {
        e->p0[ctx] += (PROB_ONE - e->p0[ctx]) >> RATE0;
        e->p1[ctx] += (PROB_ONE - e->p1[ctx]) >> RATE1;
    } else {
        e->p0[ctx] -= e->p0[ctx] >> RATE0;
        e->p1[ctx] -= e->p1[ctx] >> RATE1;
    }
}

void enc_bin_ep(Enc *e, int bin) { enc_encode(e, bin, PROB_ONE >> 1); }

void enc_bins_ep(Enc *e, uint32_t value, int nbits) {
    for (int i = nbits - 1; i >= 0; --i)
        enc_bin_ep(e, (value >> i) & 1);
}

void enc_eg(Enc *e, uint32_t value, int k) {
    while (value >= (1u << k)) {
        enc_bin_ep(e, 1);
        value -= 1u << k;
        k++;
    }
    enc_bin_ep(e, 0);
    if (k) enc_bins_ep(e, value, k);
}

int64_t enc_finish(Enc *e) {
    for (int i = 0; i < 5; ++i) shift_low(e);
    return (int64_t)e->out_len;
}

void enc_copy(Enc *e, uint8_t *dst) { memcpy(dst, e->out, e->out_len); }

/* ---------------- decoder ---------------- */

typedef struct {
    const uint8_t *data;
    size_t len, pos;
    uint32_t range;
    uint64_t code;
    int32_t *p0, *p1;
    int nctx;
} Dec;

static uint8_t dec_byte(Dec *d) {
    return d->pos < d->len ? d->data[d->pos++] : 0;
}

Dec *dec_new(const uint8_t *data, int64_t len, const int32_t *init_p1,
             int nctx) {
    Dec *d = (Dec *)calloc(1, sizeof(Dec));
    d->data = data;     /* borrowed: caller keeps the buffer alive */
    d->len = (size_t)len;
    d->range = 0xFFFFFFFFu;
    d->pos = 1;         /* first byte is the encoder's dummy cache */
    for (int i = 0; i < 4; ++i) d->code = (d->code << 8) | dec_byte(d);
    d->nctx = nctx;
    d->p0 = (int32_t *)malloc(nctx * sizeof(int32_t));
    d->p1 = (int32_t *)malloc(nctx * sizeof(int32_t));
    memcpy(d->p0, init_p1, nctx * sizeof(int32_t));
    memcpy(d->p1, init_p1, nctx * sizeof(int32_t));
    return d;
}

void dec_free(Dec *d) {
    if (!d) return;
    free(d->p0); free(d->p1); free(d);
}

static int dec_decode(Dec *d, int p1) {
    uint32_t bound = (d->range >> PROB_BITS) * (uint32_t)(PROB_ONE - p1);
    int bin;
    if (d->code < bound) {
        bin = 0;
        d->range = bound;
    } else {
        bin = 1;
        d->code -= bound;
        d->range -= bound;
    }
    while (d->range < TOP) {
        d->range <<= 8;
        d->code = ((d->code << 8) | dec_byte(d)) & 0xFFFFFFFFFFull;
    }
    return bin;
}

int dec_bin(Dec *d, int ctx) {
    int p = (d->p0[ctx] + d->p1[ctx]) >> 1;
    if (p < 1) p = 1;
    if (p > PROB_ONE - 1) p = PROB_ONE - 1;
    int bin = dec_decode(d, p);
    if (bin) {
        d->p0[ctx] += (PROB_ONE - d->p0[ctx]) >> RATE0;
        d->p1[ctx] += (PROB_ONE - d->p1[ctx]) >> RATE1;
    } else {
        d->p0[ctx] -= d->p0[ctx] >> RATE0;
        d->p1[ctx] -= d->p1[ctx] >> RATE1;
    }
    return bin;
}

int dec_bin_ep(Dec *d) { return dec_decode(d, PROB_ONE >> 1); }

uint32_t dec_bins_ep(Dec *d, int nbits) {
    uint32_t v = 0;
    for (int i = 0; i < nbits; ++i) v = (v << 1) | dec_bin_ep(d);
    return v;
}

uint32_t dec_eg(Dec *d, int k) {
    uint32_t value = 0;
    while (dec_bin_ep(d)) {
        value += 1u << k;
        k++;
    }
    if (k) value += dec_bins_ep(d, k);
    return value;
}

/* ---------------- residual coding (mirror of residual_coding.py) -------- */

typedef struct {
    int lastx_off, lasty_off, sigcg_off, sig_off, gtx_off;
} ResCtx;

static void last_group(int v, int *g, int *sl, int *suf) {
    if (v < 4) { *g = v; *sl = 0; *suf = 0; return; }
    int msb = 31 - __builtin_clz((unsigned)v);
    *sl = msb - 1;
    *g = 2 * msb + ((v >> *sl) & 1);
    *suf = v & ((1 << *sl) - 1);
}

static int group_min(int g) {
    if (g < 4) return g;
    int sl = (g >> 1) - 1;
    return (2 + (g & 1)) << sl;
}

static int mini(int a, int b) { return a < b ? a : b; }

static void enc_last_coord(Enc *e, int v, int log2size, int chroma,
                           int set_off) {
    int g, sl, suf, gmax, t1, t2;
    last_group(v, &g, &sl, &suf);
    last_group((1 << log2size) - 1, &gmax, &t1, &t2);
    int base = chroma ? 20 : (log2size - 2) * 5;
    for (int i = 0; i < g; ++i)
        enc_bin(e, 1, set_off + mini(base + mini(i, 4), 24));
    if (g < gmax)
        enc_bin(e, 0, set_off + mini(base + mini(g, 4), 24));
    if (sl) enc_bins_ep(e, (uint32_t)suf, sl);
}

static int dec_last_coord(Dec *d, int log2size, int chroma, int set_off) {
    int gmax, t1, t2;
    last_group((1 << log2size) - 1, &gmax, &t1, &t2);
    int base = chroma ? 20 : (log2size - 2) * 5;
    int g = 0;
    while (g < gmax && dec_bin(d, set_off + mini(base + mini(g, 4), 24)))
        g++;
    if (g < 4) return g;
    int sl = (g >> 1) - 1;
    return group_min(g) + (sl ? (int)dec_bins_ep(d, sl) : 0);
}

static int sig_ctx(const int64_t *cg, int pos, int cgw, int cgh, int chroma,
                   int sig_off) {
    int x = pos % cgw, y = pos / cgw;
    int n = 0;
    if (x + 1 < cgw && cg[y * cgw + x + 1] != 0) n++;
    if (y + 1 < cgh && cg[(y + 1) * cgw + x] != 0) n++;
    if (x + 1 < cgw && y + 1 < cgh && cg[(y + 1) * cgw + x + 1] != 0) n++;
    return sig_off + (chroma ? 12 : 0) + mini(n, 2);
}

/* levels: h*w int32 row-major; scan: h*w int32 flat scan order */
void enc_coeffs(Enc *e, const int32_t *levels, int h, int w,
                const int32_t *scan, int chroma, const ResCtx *cx) {
    int log2w = 31 - __builtin_clz((unsigned)w);
    int log2h = 31 - __builtin_clz((unsigned)h);
    int n = h * w;
    int last = -1;
    for (int i = 0; i < n; ++i)
        if (levels[scan[i]] != 0) last = i;
    /* caller guarantees a nonzero block */
    int lx = scan[last] % w, ly = scan[last] / w;
    enc_last_coord(e, lx, log2w, chroma, cx->lastx_off);
    enc_last_coord(e, ly, log2h, chroma, cx->lasty_off);

    int cgw = mini(w, 4), cgh = mini(h, 4);
    int cg_size = cgw * cgh;
    int ncg = last / cg_size + 1;
    int64_t cg2d[16];
    for (int cgi = ncg - 1; cgi >= 0; --cgi) {
        int base = cgi * cg_size;
        int has = 0;
        for (int k = 0; k < cg_size; ++k)
            if (base + k < n && levels[scan[base + k]] != 0) { has = 1; break; }
        int implied = (cgi == ncg - 1) || (cgi == 0);
        if (!implied) {
            enc_bin(e, has, cx->sigcg_off + 2 * chroma);
            if (!has) continue;
        }
        memset(cg2d, 0, sizeof(cg2d));
        int rice = 0;
        int start = (cgi == ncg - 1) ? mini(last - base, cg_size - 1)
                                     : cg_size - 1;
        for (int k = start; k >= 0; --k) {
            int p = scan[base + k];
            int v = levels[p];
            int px = p % w, py = p / w;
            int cxp = px % cgw, cyp = py % cgh;
            int a = v < 0 ? -v : v;
            int is_last = (base + k) == last;
            if (!is_last)
                enc_bin(e, a != 0,
                        sig_ctx(cg2d, cyp * cgw + cxp, cgw, cgh, chroma,
                                cx->sig_off));
            if (a != 0) {
                enc_bin(e, a > 1, cx->gtx_off + 11 * chroma);
                if (a > 1) {
                    enc_bin(e, a > 2, cx->gtx_off + 11 * chroma + 1);
                    if (a > 2) {
                        int rem = a - 3;
                        enc_eg(e, (uint32_t)rem, rice);
                        if (rem > (3 << rice)) rice = mini(rice + 1, 4);
                    }
                }
                cg2d[cyp * cgw + cxp] = a;
            }
        }
        for (int k = start; k >= 0; --k) {
            int v = levels[scan[base + k]];
            if (v != 0) enc_bin_ep(e, v < 0);
        }
    }
}

void dec_coeffs(Dec *d, int32_t *levels, int h, int w, const int32_t *scan,
                int chroma, const ResCtx *cx) {
    int log2w = 31 - __builtin_clz((unsigned)w);
    int log2h = 31 - __builtin_clz((unsigned)h);
    int n = h * w;
    memset(levels, 0, n * sizeof(int32_t));
    int lx = dec_last_coord(d, log2w, chroma, cx->lastx_off);
    int ly = dec_last_coord(d, log2h, chroma, cx->lasty_off);
    int lpos = ly * w + lx;
    int last = 0;
    for (int i = 0; i < n; ++i)
        if (scan[i] == lpos) { last = i; break; }

    int cgw = mini(w, 4), cgh = mini(h, 4);
    int cg_size = cgw * cgh;
    int ncg = last / cg_size + 1;
    int64_t cg2d[16];
    for (int cgi = ncg - 1; cgi >= 0; --cgi) {
        int base = cgi * cg_size;
        int implied = (cgi == ncg - 1) || (cgi == 0);
        if (!implied) {
            if (!dec_bin(d, cx->sigcg_off + 2 * chroma)) continue;
        }
        memset(cg2d, 0, sizeof(cg2d));
        int rice = 0;
        int start = (cgi == ncg - 1) ? mini(last - base, cg_size - 1)
                                     : cg_size - 1;
        for (int k = start; k >= 0; --k) {
            int p = scan[base + k];
            int px = p % w, py = p / w;
            int cxp = px % cgw, cyp = py % cgh;
            int is_last = (base + k) == last;
            int sig = is_last ? 1
                : dec_bin(d, sig_ctx(cg2d, cyp * cgw + cxp, cgw, cgh,
                                     chroma, cx->sig_off));
            if (sig) {
                int a = 1;
                if (dec_bin(d, cx->gtx_off + 11 * chroma)) {
                    a = 2;
                    if (dec_bin(d, cx->gtx_off + 11 * chroma + 1)) {
                        int rem = (int)dec_eg(d, rice);
                        a = 3 + rem;
                        if (rem > (3 << rice)) rice = mini(rice + 1, 4);
                    }
                }
                cg2d[cyp * cgw + cxp] = a;
                levels[p] = a;
            }
        }
        for (int k = start; k >= 0; --k) {
            int p = scan[base + k];
            if (levels[p] != 0 && dec_bin_ep(d)) levels[p] = -levels[p];
        }
    }
}
