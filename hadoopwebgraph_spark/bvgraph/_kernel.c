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

/* Every reader checks pos against limit BEFORE touching memory: a
 * corrupt/truncated stream (or a bogus seek position) must surface as an
 * in-band error value, never as an out-of-bounds window64 read.  With
 * pos < limit, window64's 9-byte fetch stays inside the 16-byte pad. */

static inline int read_bit(Bits *b) {
    int64_t p = b->pos;
    b->pos = p + 1;
    if (p >= b->limit) return 0; /* deterministic; next prefix read errors */
    return (b->d[p >> 3] >> (7 - (p & 7))) & 1;
}

static inline int64_t read_unary(Bits *b) {
    /* Truncation is OUT-OF-BAND (-1): a corrupt stream whose field uses
     * CODE_UNARY directly must fail fast, not decode as a huge in-band
     * value that drives a ~4 GiB vec_reserve or a 2^30 block loop. */
    int64_t n = 0;
    for (;;) {
        if (b->pos >= b->limit) return -1; /* truncated */
        uint64_t w = window64(b->d, b->pos);
        if (w) {
            int lz = __builtin_clzll(w);
            b->pos += lz + 1;
            if (b->pos > b->limit) return -1; /* overshoot */
            return n + lz;
        }
        n += 64;
        b->pos += 64;
    }
}

static inline uint64_t read_int(Bits *b, int k) {
    if (k <= 0) return 0;
    if (b->pos >= b->limit) { /* no fetch past the guarded window */
        b->pos += k;
        return 0;
    }
    uint64_t w = window64(b->d, b->pos);
    b->pos += k;
    return k >= 64 ? w : (w >> (64 - k));
}

static inline int64_t read_gamma(Bits *b) {
    int64_t msb = read_unary(b);
    /* < 0: truncated unary; > 62: value would overflow int64 */
    if (msb < 0 || msb > 62) return -1;
    return (int64_t)(((uint64_t)1 << msb) | read_int(b, (int)msb)) - 1;
}

static inline int64_t read_delta(Bits *b) {
    int64_t msb = read_gamma(b);
    if (msb < 0 || msb > 62) return -1;
    return (int64_t)(((uint64_t)1 << msb) | read_int(b, (int)msb)) - 1;
}

static inline int64_t read_zeta(Bits *b, int k) {
    int64_t h = read_unary(b);
    if (h < 0) return -1; /* truncated unary prefix */
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
        if (b->pos >= b->limit) return -1; /* truncated nibble stream */
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
    int64_t data_bits; /* real data extent: seek targets must be <= this */
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
            int64_t sb = c->offs[y - c->seed_base];
            if (sb < 0 || sb > c->data_bits) { /* stale/corrupt offsets */
                c->err = ERR_OFFSETS;
                return -1;
            }
            Bits rb = {c->data, sb, c->limit};
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
    c.data_bits = data_bytes * 8;
    if (start_bit < 0 || start_bit > c.data_bits) return ERR_MALFORMED;
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
            int64_t sb = c.offs[y - seed_base];
            if (sb < 0 || sb > c.data_bits) {
                rc = ERR_OFFSETS;
                goto done;
            }
            Bits rb = {data, sb, c.limit};
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
        /* Mirror bvg_decode_offsets: a corrupt stream whose final fields
         * were satisfied by fabricated pad-zone reads (read_bit/read_int
         * return 0 past the limit) must error, not complete with a
         * garbage final value. */
        if (b.pos > c.data_bits) {
            rc = ERR_MALFORMED;
            goto done;
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
 * out[i] = sum of the first i+1 deltas.  data_bytes is the real (unpadded)
 * buffer length; the limit is derived from it — never from `count` — so a
 * truncated .offsets file or an inconsistent node count errors instead of
 * decoding past the pad.  Returns 0, ERR_BADCODE, or ERR_MALFORMED (the
 * cursor ran past the data extent: corrupt/truncated stream). */
int64_t bvg_decode_offsets(const uint8_t *data, int64_t data_bytes,
                           int64_t count, int32_t code, int32_t zeta_k,
                           int64_t *out) {
    Bits b = {data, 0, (data_bytes + 8) * 8};
    int64_t acc = 0;
    for (int64_t i = 0; i < count; i++) {
        int64_t g = read_code(&b, code, zeta_k);
        if (g < 0) return ERR_BADCODE;
        acc += g;
        out[i] = acc;
    }
    if (b.pos > data_bytes * 8) return ERR_MALFORMED;
    return 0;
}

/* ---------------------------------------------------------------------
 * Encoder — the sink's hot path (segment encode with reference-candidate
 * trials).  Mirrors codec.py's _encode_node / sink.py's per-segment loop
 * bit-for-bit: candidates are tried in order (0, 1, .., window) and a
 * strictly smaller bit count wins, so the chosen references — and hence
 * the output bytes — are identical to the Python encoder's.
 * ------------------------------------------------------------------- */

typedef struct {
    uint8_t *buf;
    int64_t cap;    /* bytes */
    uint64_t acc;   /* pending bits (low `fill`) */
    int fill;
    int64_t nbits;
    int overflow;   /* sticky: cap exceeded (nbits keeps counting) */
} Wr;

static inline void wr_flush_acc(Wr *w) {
    while (w->fill >= 8) {
        w->fill -= 8;
        int64_t byte_pos = (w->nbits - w->fill - 8) >> 3;
        if (byte_pos < w->cap)
            w->buf[byte_pos] = (uint8_t)(w->acc >> w->fill);
        else
            w->overflow = 1;
    }
    w->acc &= (w->fill ? ((uint64_t)1 << w->fill) - 1 : 0);
}

static inline void wr_bits(Wr *w, uint64_t x, int k) {
    /* write the k low bits of x, MSB first (k <= 56 per call) */
    if (k <= 0) return;
    w->acc = (w->acc << k) | (x & (k >= 64 ? ~(uint64_t)0 : (((uint64_t)1 << k) - 1)));
    w->fill += k;
    w->nbits += k;
    wr_flush_acc(w);
}

static inline void wr_int(Wr *w, uint64_t x, int k) {
    while (k > 56) { /* split very long fields */
        wr_bits(w, x >> (k - 56), 56);
        k -= 56;
        x &= ((uint64_t)1 << k) - 1;
    }
    wr_bits(w, x, k);
}

static inline void wr_unary(Wr *w, int64_t x) {
    while (x >= 32) {
        wr_bits(w, 0, 32);
        x -= 32;
    }
    wr_bits(w, 1, (int)x + 1);
}

static inline int bitlen64(uint64_t v) {
    return v ? 64 - __builtin_clzll(v) : 0;
}

static inline void wr_gamma(Wr *w, int64_t x) {
    uint64_t v = (uint64_t)x + 1;
    int msb = bitlen64(v) - 1;
    wr_unary(w, msb);
    wr_int(w, v, msb); /* low msb bits; implicit leading 1 dropped */
}

static inline void wr_delta(Wr *w, int64_t x) {
    uint64_t v = (uint64_t)x + 1;
    int msb = bitlen64(v) - 1;
    wr_gamma(w, msb);
    wr_int(w, v, msb);
}

static inline void wr_zeta(Wr *w, int64_t x, int k) {
    uint64_t v = (uint64_t)x + 1;
    int h = (bitlen64(v) - 1) / k;
    wr_unary(w, h);
    uint64_t left = (uint64_t)1 << (h * k);
    if (v - left < left)
        wr_int(w, v - left, h * k + k - 1);
    else
        wr_int(w, v, h * k + k);
}

static inline void wr_nibble(Wr *w, int64_t x) {
    int groups = 1;
    int64_t t = x >> 3;
    while (t) {
        groups++;
        t >>= 3;
    }
    for (int i = groups - 1; i >= 0; i--) {
        wr_bits(w, i == 0 ? 1 : 0, 1);
        wr_bits(w, (uint64_t)(x >> (3 * i)) & 7, 3);
    }
}

static inline void wr_code(Wr *w, int code, int k, int64_t x) {
    switch (code) {
    case CODE_GAMMA: wr_gamma(w, x); return;
    case CODE_DELTA: wr_delta(w, x); return;
    case CODE_UNARY: wr_unary(w, x); return;
    case CODE_ZETA: wr_zeta(w, x, k); return;
    case CODE_NIBBLE: wr_nibble(w, x); return;
    default: w->overflow = 2; return; /* unsupported */
    }
}

/* int2nat zigzag (Fast.int2nat) */
static inline int64_t int2nat(int64_t x) {
    return x >= 0 ? 2 * x : -2 * x - 1;
}

typedef struct {
    int32_t window_size, max_ref_count, min_interval_length, zeta_k;
    int32_t c_out, c_ref, c_bcnt, c_blk, c_res;
} EncProps;

/* Encode one node's list given a chosen reference (0 = none); mirrors
 * codec.py::_encode_node exactly. succ/ref_list are sorted ascending. */
static void enc_node(Wr *w, const EncProps *p, int64_t x,
                     const int32_t *succ, int64_t d,
                     int64_t ref, const int32_t *ref_list, int64_t ref_len,
                     int32_t *scratch /* >= d + ref_len + 2 ints */) {
    wr_code(w, p->c_out, p->zeta_k, d);
    if (d == 0) return;
    if (p->window_size > 0) wr_code(w, p->c_ref, p->zeta_k, ref);

    const int32_t *extras = succ;
    int64_t n_extras = d;
    int32_t *extra_buf = scratch;

    if (ref > 0) {
        /* membership mask of ref_list in succ via two-pointer merge
         * (both sorted ascending, duplicate-free) */
        int64_t i = 0, j = 0;
        /* alternating copy/skip run lengths over ref_list (copy first) */
        int copying = 1;
        int64_t run = 0;
        int64_t runs_cap = ref_len + 2;
        int32_t *runs = scratch + 0; /* reuse scratch head for runs */
        int64_t n_runs = 0;
        (void)runs_cap;
        for (i = 0, j = 0; i < ref_len; i++) {
            while (j < d && succ[j] < ref_list[i]) j++;
            int is_copy = (j < d && succ[j] == ref_list[i]);
            if (is_copy == copying) {
                run++;
            } else {
                runs[n_runs++] = (int32_t)run;
                copying = !copying;
                run = 1;
            }
        }
        runs[n_runs++] = (int32_t)run;
        /* last run implicit */
        int64_t n_blocks = n_runs - 1;
        wr_code(w, p->c_bcnt, p->zeta_k, n_blocks);
        for (i = 0; i < n_blocks; i++)
            wr_code(w, p->c_blk, p->zeta_k, i == 0 ? runs[i] : runs[i] - 1);

        /* extras = succ minus copied (copied = succ ∩ ref_list) */
        extra_buf = scratch + n_runs; /* runs no longer needed after loop?  keep disjoint */
        n_extras = 0;
        for (i = 0, j = 0; j < d; j++) {
            while (i < ref_len && ref_list[i] < succ[j]) i++;
            if (!(i < ref_len && ref_list[i] == succ[j]))
                extra_buf[n_extras++] = succ[j];
        }
        extras = extra_buf;
    }

    if (p->min_interval_length > 0 && n_extras > 0) {
        /* split extras into maximal runs >= min_len and residuals */
        int64_t i = 0;
        int64_t n_ivals = 0;
        /* first pass: count intervals */
        while (i < n_extras) {
            int64_t j = i;
            while (j + 1 < n_extras && extras[j + 1] == extras[j] + 1) j++;
            if (j - i + 1 >= p->min_interval_length) n_ivals++;
            i = j + 1;
        }
        wr_gamma(w, n_ivals);
        int64_t prev = 0, emitted = 0, res_n = 0;
        int32_t *res = extra_buf == scratch ? scratch + n_extras : scratch;
        i = 0;
        while (i < n_extras) {
            int64_t j = i;
            while (j + 1 < n_extras && extras[j + 1] == extras[j] + 1) j++;
            int64_t run = j - i + 1;
            if (run >= p->min_interval_length) {
                int64_t left = extras[i];
                if (emitted == 0)
                    wr_gamma(w, int2nat(left - x));
                else
                    wr_gamma(w, left - prev - 1);
                wr_gamma(w, run - p->min_interval_length);
                prev = left + run;
                emitted++;
            } else {
                for (int64_t t = i; t <= j; t++) res[res_n++] = extras[t];
            }
            i = j + 1;
        }
        extras = res;
        n_extras = res_n;
    }

    if (n_extras > 0) {
        wr_code(w, p->c_res, p->zeta_k, int2nat((int64_t)extras[0] - x));
        for (int64_t i = 1; i < n_extras; i++)
            wr_code(w, p->c_res, p->zeta_k,
                    (int64_t)extras[i] - extras[i - 1] - 1);
    }
}

/* Encode nodes first_src..first_src+n_nodes-1 (adjacency in CSR form) as
 * one window-isolated segment.  out_offsets gets n_nodes+1 bit positions.
 * Returns total bits written (>= 0), -needed_bytes if out_cap was too
 * small, or ERR_BADCODE for an unsupported code id. */
int64_t bvg_encode_segment(
    const int32_t *values, const int64_t *list_offsets, int64_t n_nodes,
    int64_t first_src,
    int32_t window_size, int32_t max_ref_count, int32_t min_interval_length,
    int32_t zeta_k, int32_t c_out, int32_t c_ref, int32_t c_bcnt,
    int32_t c_blk, int32_t c_res,
    uint8_t *out_buf, int64_t out_cap, int64_t *out_offsets) {
    EncProps p = {window_size, max_ref_count, min_interval_length, zeta_k,
                  c_out, c_ref, c_bcnt, c_blk, c_res};
    int cyclic = window_size + 1;
    if (cyclic < 1) cyclic = 1;
    int32_t *ref_counts = (int32_t *)calloc((size_t)cyclic, sizeof(int32_t));
    /* scratch sized to the largest adjacency list x2 + slack */
    int64_t max_d = 0;
    for (int64_t i = 0; i < n_nodes; i++) {
        int64_t d = list_offsets[i + 1] - list_offsets[i];
        if (d > max_d) max_d = d;
    }
    int32_t *scratch = (int32_t *)malloc((size_t)(2 * max_d + 8) * sizeof(int32_t));
    Wr scr = {0};
    scr.cap = 0; /* count-only scratch writer: never stores bytes */
    Wr out = {out_buf, out_cap, 0, 0, 0, 0};
    if (!ref_counts || !scratch) {
        free(ref_counts);
        free(scratch);
        return ERR_NOMEM;
    }

    out_offsets[0] = 0;
    for (int64_t lx = 0; lx < n_nodes; lx++) {
        int64_t x = first_src + lx;
        const int32_t *succ = values + list_offsets[lx];
        int64_t d = list_offsets[lx + 1] - list_offsets[lx];
        int64_t best_bits = -1, best_r = 0;
        for (int64_t r = 0; r <= (window_size > 0 ? (lx < window_size ? lx : window_size) : 0); r++) {
            if (r > 0 && ref_counts[(lx - r) % cyclic] + 1 > max_ref_count)
                continue;
            scr.acc = 0; scr.fill = 0; scr.nbits = 0; scr.overflow = 0;
            const int32_t *rl = r > 0 ? values + list_offsets[lx - r] : NULL;
            int64_t rlen = r > 0 ? list_offsets[lx - r + 1] - list_offsets[lx - r] : 0;
            enc_node(&scr, &p, x, succ, d, r, rl, rlen, scratch);
            if (scr.overflow == 2) {
                free(ref_counts);
                free(scratch);
                return ERR_BADCODE;
            }
            if (best_bits < 0 || scr.nbits < best_bits) {
                best_bits = scr.nbits;
                best_r = r;
            }
        }
        ref_counts[lx % cyclic] =
            best_r == 0 ? 0 : ref_counts[(lx - best_r) % cyclic] + 1;
        const int32_t *rl = best_r > 0 ? values + list_offsets[lx - best_r] : NULL;
        int64_t rlen = best_r > 0
                           ? list_offsets[lx - best_r + 1] - list_offsets[lx - best_r]
                           : 0;
        enc_node(&out, &p, x, succ, d, best_r, rl, rlen, scratch);
        out_offsets[lx + 1] = out.nbits;
    }
    free(ref_counts);
    free(scratch);
    if (out.overflow == 2) return ERR_BADCODE;
    if (out.overflow) return -(((out.nbits + 7) >> 3) + 8);
    /* flush the trailing partial byte into the buffer (padded-zero fill);
     * the caller reads back (nbits) and slices body/tail itself */
    if (out.fill) {
        int64_t byte_pos = (out.nbits + 7) / 8 - 1;
        if (byte_pos < out.cap)
            out.buf[byte_pos] = (uint8_t)((out.acc << (8 - out.fill)) & 0xFF);
        else
            return -(((out.nbits + 7) >> 3) + 8);
    }
    return out.nbits;
}

/* Delta-encode a monotone int64 sequence (the .offsets stream): writes
 * code(values[i] - previous) for each entry, where previous starts at
 * `prev` and becomes values[i].  Returns total bits (>= 0), -needed_bytes
 * if cap was too small, ERR_MALFORMED on a non-monotone input, or
 * ERR_BADCODE for an unsupported code id. */
int64_t bvg_encode_deltas(const int64_t *values, int64_t count, int64_t prev,
                          int32_t code, int32_t zeta_k, uint8_t *out,
                          int64_t cap) {
    Wr w = {out, cap, 0, 0, 0, 0};
    for (int64_t i = 0; i < count; i++) {
        int64_t d = values[i] - prev;
        if (d < 0) return ERR_MALFORMED;
        prev = values[i];
        wr_code(&w, code, zeta_k, d);
        if (w.overflow == 2) return ERR_BADCODE;
    }
    if (w.overflow) return -(((w.nbits + 7) >> 3) + 8);
    if (w.fill) {
        int64_t byte_pos = (w.nbits + 7) / 8 - 1;
        if (byte_pos < w.cap)
            w.buf[byte_pos] = (uint8_t)((w.acc << (8 - w.fill)) & 0xFF);
        else
            return -(((w.nbits + 7) >> 3) + 8);
    }
    return w.nbits;
}
