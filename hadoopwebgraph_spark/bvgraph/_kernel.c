/* BVGraph decode kernel — C fast path loaded via ctypes (see native.py).
 *
 * Semantics are bit-for-bit identical to the pure-Python decoder in
 * codec.py (itself an independent re-implementation of the reference
 * pipeline, HdfsBVGraph.java:98-201): outdegree -> reference within the
 * window -> copy blocks (first raw, rest stored-1, alternating copy/skip
 * starting with copy, implicit tail when the count is even) -> intervals
 * (first left zigzag-offset from x, lengths stored minus
 * min_interval_length, then gap+1 lefts) -> residuals (zigzag first from
 * x, then +1 gaps), merged as sorted streams.  The Python implementation
 * stays the fallback and the executable spec; the hypothesis round-trip
 * suite pins both to the same outputs.
 *
 * Buffers passed in MUST be zero-padded by >= 16 bytes past the last
 * data byte (bitio.pad) — the 64-bit window fetch reads up to 9 bytes
 * past the cursor.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define ERR_OVERFLOW (-1) /* not used externally: overflow returns -needed */
#define ERR_BADCODE (-2)
#define ERR_OFFSETS (-3)
#define ERR_MALFORMED (-4)
#define ERR_NOMEM (-5)

#define CODE_DELTA 1
#define CODE_GAMMA 2
#define CODE_UNARY 7
#define CODE_ZETA 8
#define CODE_NIBBLE 9

#define MAX_DEPTH 128

typedef struct {
    const uint8_t *d;
    int64_t pos;
    int64_t limit; /* runaway guard: bit positions past this force errors */
} Bits;

/* 64 bits starting at the cursor (buffer is padded so the 9-byte fetch
 * never over-runs). */
static inline uint64_t window64(const uint8_t *d, int64_t pos) {
    uint64_t w;
    memcpy(&w, d + (pos >> 3), 8);
#if defined(__GNUC__)
    w = __builtin_bswap64(w);
#else
#error "need byteswap"
#endif
    int sh = (int)(pos & 7);
    if (sh == 0) return w;
    uint64_t next = d[(pos >> 3) + 8];
    return (w << sh) | (next >> (8 - sh));
}

static inline int read_bit(Bits *b) {
    int64_t p = b->pos;
    b->pos = p + 1;
    return (b->d[p >> 3] >> (7 - (p & 7))) & 1;
}

static inline int64_t read_unary(Bits *b) {
    int64_t n = 0;
    for (;;) {
        if (b->pos >= b->limit) return (int64_t)1 << 30; /* -> ERR upstream */
        uint64_t w = window64(b->d, b->pos);
        if (w) {
            int lz = __builtin_clzll(w);
            b->pos += lz + 1;
            return n + lz;
        }
        n += 64;
        b->pos += 64;
    }
}

static inline uint64_t read_int(Bits *b, int k) {
    if (k <= 0) return 0;
    uint64_t w = window64(b->d, b->pos);
    b->pos += k;
    return k >= 64 ? w : (w >> (64 - k));
}

static inline int64_t read_gamma(Bits *b) {
    int64_t msb = read_unary(b);
    if (msb > 62) return -1; /* value would overflow int64; caller errors */
    return (int64_t)(((uint64_t)1 << msb) | read_int(b, (int)msb)) - 1;
}

static inline int64_t read_delta(Bits *b) {
    int64_t msb = read_gamma(b);
    if (msb < 0 || msb > 62) return -1;
    return (int64_t)(((uint64_t)1 << msb) | read_int(b, (int)msb)) - 1;
}

static inline int64_t read_zeta(Bits *b, int k) {
    int64_t h = read_unary(b);
    int64_t hk = h * k;
    if (hk + k - 1 > 62) return -1;
    uint64_t left = (uint64_t)1 << hk;
    uint64_t m = read_int(b, (int)(hk + k - 1));
    if (m < left) return (int64_t)(m + left) - 1;
    return (int64_t)((m << 1) + read_bit(b)) - 1;
}

static inline int64_t read_nibble(Bits *b) {
    int64_t x = 0;
    for (;;) {
        uint64_t g = read_int(b, 4);
        x = (x << 3) | (int64_t)(g & 7);
        if (g & 8) return x;
        if (x > ((int64_t)1 << 56)) return -1;
    }
}

static inline int64_t read_code(Bits *b, int code, int k) {
    switch (code) {
    case CODE_GAMMA:
        return read_gamma(b);
    case CODE_DELTA:
        return read_delta(b);
    case CODE_UNARY:
        return read_unary(b);
    case CODE_ZETA:
        return read_zeta(b, k);
    case CODE_NIBBLE:
        return read_nibble(b);
    default:
        return -1;
    }
}

/* zigzag decode (Fast.nat2int) */
static inline int64_t nat2int(int64_t x) {
    return (x & 1) == 0 ? (x >> 1) : -((x >> 1) + 1);
}

/* ---- growable int32 vector ---- */

typedef struct {
    int32_t *v;
    int64_t len, cap;
} Vec;

static int vec_reserve(Vec *a, int64_t need) {
    if (need <= a->cap) return 0;
    int64_t cap = a->cap ? a->cap : 16;
    while (cap < need) cap <<= 1;
    int32_t *nv = (int32_t *)realloc(a->v, (size_t)cap * sizeof(int32_t));
    if (!nv) return -1;
    a->v = nv;
    a->cap = cap;
    return 0;
}

static inline int vec_push(Vec *a, int32_t x) {
    if (a->len == a->cap && vec_reserve(a, a->len + 1)) return -1;
    a->v[a->len++] = x;
    return 0;
}

/* per-recursion-depth scratch buffers (reused across nodes) */
typedef struct {
    Vec copied, ivals, resid, blocks, reflist;
} Scratch;

typedef struct {
    const uint8_t *data;
    int32_t window_size, max_ref_count, min_interval_length, zeta_k;
    int32_t c_out, c_ref, c_bcnt, c_blk, c_res;
    const int64_t *offs; /* rebased bit offsets for nodes [seed_base, seed_hi] */
    int64_t limit;
    int32_t seed_base, seed_hi;
    Scratch pool[MAX_DEPTH];
    int err;
} Ctx;

static void ctx_free(Ctx *c) {
    for (int i = 0; i < MAX_DEPTH; i++) {
        free(c->pool[i].copied.v);
        free(c->pool[i].ivals.v);
        free(c->pool[i].resid.v);
        free(c->pool[i].blocks.v);
        free(c->pool[i].reflist.v);
    }
}

/* Decode one node's successor list into *out (overwritten).
 * win != NULL: sequential mode — references resolve against the cyclic
 *   window (win has window_size+1 slots whose Vec.len is the outdegree).
 * win == NULL: random-access mode — references recurse via ctx->offs,
 *   exactly like codec.py's decode_node_random (HdfsBVGraph.java:189's
 *   fresh-stream recursion). */
static int decode_node(Ctx *c, Bits *b, int64_t x, Vec *win, int32_t cyclic,
                       Vec *out, int depth) {
    if (depth >= MAX_DEPTH) {
        c->err = ERR_MALFORMED;
        return -1;
    }
    Scratch *s = &c->pool[depth];

    int64_t d = read_code(b, c->c_out, c->zeta_k);
    if (d < 0) {
        c->err = ERR_BADCODE;
        return -1;
    }
    out->len = 0;
    if (d == 0) return 0;
    if (vec_reserve(out, d)) {
        c->err = ERR_NOMEM;
        return -1;
    }

    int64_t ref = -1;
    if (c->window_size > 0) {
        ref = read_code(b, c->c_ref, c->zeta_k);
        if (ref < 0) {
            c->err = ERR_BADCODE;
            return -1;
        }
    }

    Vec *copied = &s->copied;
    Vec *ivals = &s->ivals;
    Vec *resid = &s->resid;
    copied->len = ivals->len = resid->len = 0;

    int64_t extra = d;
    if (ref > 0) {
        if (ref > x) {
            c->err = ERR_MALFORMED;
            return -1;
        }
        int64_t bcount = read_code(b, c->c_bcnt, c->zeta_k);
        if (bcount < 0) {
            c->err = ERR_BADCODE;
            return -1;
        }
        Vec *blocks = &s->blocks;
        blocks->len = 0;
        for (int64_t i = 0; i < bcount; i++) {
            int64_t blk = read_code(b, c->c_blk, c->zeta_k);
            if (blk < 0) {
                c->err = ERR_BADCODE;
                return -1;
            }
            if (vec_push(blocks, (int32_t)(blk + (i ? 1 : 0)))) {
                c->err = ERR_NOMEM;
                return -1;
            }
        }

        const int32_t *ref_list;
        int64_t ref_len;
        if (win != NULL) {
            Vec *slot = &win[(x - ref) % cyclic];
            ref_list = slot->v;
            ref_len = slot->len;
        } else {
            int64_t y = x - ref;
            if (y < c->seed_base || y > c->seed_hi) {
                c->err = ERR_OFFSETS;
                return -1;
            }
            Bits rb = {c->data, c->offs[y - c->seed_base], c->limit};
            Vec *tmp = &s->reflist;
            if (decode_node(c, &rb, y, NULL, 0, tmp, depth + 1)) return -1;
            ref_list = tmp->v;
            ref_len = tmp->len;
        }

        /* alternating copy/skip runs starting with copy; Python slicing
         * clamps out-of-range silently — mirror that */
        int64_t pos = 0;
        int copying = 1;
        for (int64_t i = 0; i < blocks->len; i++) {
            int64_t blk = blocks->v[i];
            if (copying && pos < ref_len) {
                int64_t end = pos + blk;
                if (end > ref_len) end = ref_len;
                for (int64_t j = pos; j < end; j++)
                    if (vec_push(copied, ref_list[j])) {
                        c->err = ERR_NOMEM;
                        return -1;
                    }
            }
            pos += blk;
            copying ^= 1;
        }
        if (blocks->len % 2 == 0) { /* implicit trailing copy run */
            for (int64_t j = pos < 0 ? 0 : pos; j < ref_len; j++)
                if (vec_push(copied, ref_list[j])) {
                    c->err = ERR_NOMEM;
                    return -1;
                }
        }
        extra = d - copied->len;
    }

    if (extra > 0 && c->min_interval_length > 0) {
        int64_t icount = read_gamma(b);
        if (icount < 0) {
            c->err = ERR_BADCODE;
            return -1;
        }
        int64_t prev = 0;
        for (int64_t i = 0; i < icount; i++) {
            int64_t left, g;
            if (i == 0) {
                g = read_gamma(b);
                if (g < 0) {
                    c->err = ERR_BADCODE;
                    return -1;
                }
                left = nat2int(g) + x;
            } else {
                g = read_gamma(b);
                if (g < 0) {
                    c->err = ERR_BADCODE;
                    return -1;
                }
                left = g + prev + 1;
            }
            int64_t length = read_gamma(b);
            if (length < 0) {
                c->err = ERR_BADCODE;
                return -1;
            }
            length += c->min_interval_length;
            for (int64_t j = 0; j < length; j++)
                if (vec_push(ivals, (int32_t)(left + j))) {
                    c->err = ERR_NOMEM;
                    return -1;
                }
            prev = left + length;
            extra -= length;
        }
    }

    if (extra > 0) {
        int64_t v = 0;
        for (int64_t i = 0; i < extra; i++) {
            int64_t g = read_code(b, c->c_res, c->zeta_k);
            if (g < 0) {
                c->err = ERR_BADCODE;
                return -1;
            }
            v = (i == 0) ? x + nat2int(g) : v + g + 1;
            if (vec_push(resid, (int32_t)v)) {
                c->err = ERR_NOMEM;
                return -1;
            }
        }
    }

    /* 3-way merge of the sorted streams (MergedIntIterator equivalent) */
    if (copied->len == 0 && ivals->len == 0) {
        memcpy(out->v, resid->v, (size_t)resid->len * sizeof(int32_t));
        out->len = resid->len;
        return 0;
    }
    int64_t total = copied->len + ivals->len + resid->len;
    if (vec_reserve(out, total)) {
        c->err = ERR_NOMEM;
        return -1;
    }
    int64_t ia = 0, ib = 0, ic = 0, io = 0;
    while (ia < copied->len || ib < ivals->len || ic < resid->len) {
        int64_t best = INT64_MAX;
        int which = -1;
        if (ia < copied->len && copied->v[ia] < best) {
            best = copied->v[ia];
            which = 0;
        }
        if (ib < ivals->len && ivals->v[ib] < best) {
            best = ivals->v[ib];
            which = 1;
        }
        if (ic < resid->len && resid->v[ic] < best) {
            best = resid->v[ic];
            which = 2;
        }
        out->v[io++] = (int32_t)best;
        if (which == 0)
            ia++;
        else if (which == 1)
            ib++;
        else
            ic++;
    }
    out->len = io;
    return 0;
}

/* Decode nodes [from_node, up_to) sequentially (window seeding via the
 * shipped offsets slice when from_node > 0).
 *
 * out_values        int32 successor buffer of capacity out_cap
 * out_list_offsets  int64[(up_to - from_node) + 1] list boundaries
 * out_bitpos        optional int64[up_to - from_node]: bit cursor after
 *                   each node (for the offsets-writer utility); NULL ok
 *
 * Returns: total int32 values written (>= 0);
 *          -needed (< -8) if out_cap was too small (retry with `needed`);
 *          ERR_* (-2..-5) on malformed input / unsupported code / OOM. */
int64_t bvg_decode_range(
    const uint8_t *data, int64_t data_bytes,
    int32_t window_size, int32_t max_ref_count, int32_t min_interval_length,
    int32_t zeta_k, int32_t c_out, int32_t c_ref, int32_t c_bcnt,
    int32_t c_blk, int32_t c_res, int64_t from_node, int64_t up_to,
    const int64_t *seed_offsets, int64_t seed_base, int64_t start_bit,
    int32_t *out_values, int64_t out_cap, int64_t *out_list_offsets,
    int64_t *out_bitpos) {
    (void)max_ref_count;
    Ctx c;
    memset(&c, 0, sizeof(c));
    c.data = data;
    c.limit = (data_bytes + 8) * 8;
    c.window_size = window_size;
    c.max_ref_count = max_ref_count;
    c.min_interval_length = min_interval_length;
    c.zeta_k = zeta_k;
    c.c_out = c_out;
    c.c_ref = c_ref;
    c.c_bcnt = c_bcnt;
    c.c_blk = c_blk;
    c.c_res = c_res;
    c.offs = seed_offsets;
    c.seed_base = (int32_t)seed_base;
    c.seed_hi = seed_offsets ? (int32_t)from_node : -1;

    int32_t cyclic = window_size + 1;
    if (cyclic < 1) cyclic = 1;
    Vec *win = (Vec *)calloc((size_t)cyclic, sizeof(Vec));
    if (!win) return ERR_NOMEM;

    int rc = 0;
    int64_t written = 0, needed = 0;
    int overflow = 0;

    /* window seeding by random access (HdfsBVGraph.java:221-229) */
    if (from_node > 0) {
        if (!seed_offsets) {
            rc = ERR_OFFSETS;
            goto done;
        }
        int64_t lim = from_node + 1 < cyclic ? from_node + 1 : cyclic;
        for (int64_t i = 1; i < lim; i++) {
            int64_t y = from_node - i;
            Bits rb = {data, c.offs[y - seed_base], c.limit};
            if (decode_node(&c, &rb, y, NULL, 0, &win[y % cyclic], 0)) {
                rc = c.err;
                goto done;
            }
        }
    }

    {
        Bits b = {data, start_bit, c.limit};
        out_list_offsets[0] = 0;
        for (int64_t x = from_node; x < up_to; x++) {
            Vec *slot = &win[x % cyclic];
            if (decode_node(&c, &b, x, win, cyclic, slot, 0)) {
                rc = c.err;
                goto done;
            }
            needed += slot->len;
            if (!overflow && written + slot->len <= out_cap) {
                memcpy(out_values + written, slot->v,
                       (size_t)slot->len * sizeof(int32_t));
                written += slot->len;
            } else {
                overflow = 1; /* keep decoding to learn the true size */
            }
            out_list_offsets[x - from_node + 1] = needed;
            if (out_bitpos) out_bitpos[x - from_node] = b.pos;
        }
    }

done:
    for (int i = 0; i < cyclic; i++) free(win[i].v);
    free(win);
    ctx_free(&c);
    if (rc) return rc;
    if (overflow) return needed > 8 ? -needed : ERR_NOMEM;
    return written;
}

/* Fold a delta-coded offsets stream into absolute bit positions:
 * out[i] = sum of the first i+1 deltas.  Returns 0, or ERR_BADCODE. */
int64_t bvg_decode_offsets(const uint8_t *data, int64_t count, int32_t code,
                           int32_t zeta_k, int64_t *out) {
    Bits b = {data, 0, (count + 9) * 70};
    int64_t acc = 0;
    for (int64_t i = 0; i < count; i++) {
        int64_t g = read_code(&b, code, zeta_k);
        if (g < 0) return ERR_BADCODE;
        acc += g;
        out[i] = acc;
    }
    return 0;
}
