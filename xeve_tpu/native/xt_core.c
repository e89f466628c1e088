/*
 * xeve_tpu native core: serial closed-loop intra coding pass + SBAC.
 *
 * This is the framework's "runtime" tier (the part that must be native for
 * speed, mirroring the reference encoder's serial pass-2 design,
 * xeve_enc.c:416-596).  The TPU does the batched analysis; this library
 * walks the decided quadtrees in z-order and produces the spec-compliant
 * bitstream plus the exact reconstruction.
 *
 * Bit-exactness contract: every function here matches the Python/numpy
 * oracle modules (xeve_tpu/ops/reference_kernels.py, enc/rdoq.py,
 * entropy/sbac.py, ops/deblock_np.py) which are themselves validated
 * against reference-encoder bitstreams.  Tests assert byte-identical
 * bitstreams and recon between this library and the oracle.
 */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#include "tables.h"

#define XT_API __attribute__((visibility("default")))

/* ------------------------------------------------------------------ */
/* SBAC encoder                                                        */
/* ------------------------------------------------------------------ */

typedef struct {
    uint32_t range, code;
    int32_t  code_bits;
    uint32_t pending_byte;
    int32_t  is_pending;
    uint32_t stacked_ff, stacked_zero;
    int64_t  bin_counter;
    uint8_t *out;
    int64_t  out_len, out_cap;
} XtSbac;

/* context model set (Baseline subset) */
typedef struct {
    uint16_t split_cu_flag[1];
    uint16_t intra_dir[2];
    uint16_t cbf_luma[1], cbf_cb[1], cbf_cr[1], cbf_all[1];
    uint16_t run[24], last[2], level[24];
    uint16_t delta_qp[1];
    /* inter syntax models (wired when inter coding lands) */
    uint16_t skip_flag[2], direct_mode_flag[1], inter_dir[2];
    uint16_t pred_mode[3], refi[2], mvp_idx[3], mvd[1];
} XtCtx;

static void xt_ctx_init(XtCtx *c)
{
    uint16_t *p = (uint16_t *)c;
    size_t n = sizeof(XtCtx) / 2;
    for (size_t i = 0; i < n; i++) p[i] = 512; /* PROB_INIT */
}

static void xt_sbac_init(XtSbac *s, uint8_t *buf, int64_t cap)
{
    s->range = 16384; s->code = 0; s->code_bits = 11;
    s->pending_byte = 0; s->is_pending = 0;
    s->stacked_ff = 0; s->stacked_zero = 0; s->bin_counter = 0;
    s->out = buf; s->out_len = 0; s->out_cap = cap;
}

static inline void xt_emit(XtSbac *s, uint8_t b)
{
    if (s->out_len < s->out_cap) s->out[s->out_len] = b;
    s->out_len++;
}

static void xt_put_byte(XtSbac *s, uint32_t b)
{
    if (s->is_pending) {
        if (s->pending_byte == 0) s->stacked_zero++;
        else {
            while (s->stacked_zero) { xt_emit(s, 0); s->stacked_zero--; }
            xt_emit(s, (uint8_t)s->pending_byte);
        }
    }
    s->pending_byte = b;
    s->is_pending = 1;
}

static void xt_carry(XtSbac *s)
{
    uint32_t out_bits = s->code >> 17;
    s->code &= (1u << 17) - 1;
    if (out_bits < 0xFF) {
        while (s->stacked_ff) { xt_put_byte(s, 0xFF); s->stacked_ff--; }
        xt_put_byte(s, out_bits);
    } else if (out_bits > 0xFF) {
        s->pending_byte++;
        while (s->stacked_ff) { xt_put_byte(s, 0x00); s->stacked_ff--; }
        xt_put_byte(s, out_bits & 0xFF);
    } else {
        s->stacked_ff++;
    }
}

static inline void xt_renorm(XtSbac *s)
{
    while (s->range < 8192) {
        s->range <<= 1;
        s->code <<= 1;
        if (--s->code_bits == 0) { xt_carry(s); s->code_bits = 8; }
    }
}

static void xt_encode_bin(XtSbac *s, uint16_t *model, int bin)
{
    s->bin_counter++;
    uint16_t state = *model >> 1;
    uint16_t mps = *model & 1;
    uint32_t lps = ((uint32_t)state * s->range) >> 9;
    if (lps < 437) lps = 437;
    s->range -= lps;
    if ((uint32_t)bin != mps) {
        if (s->range >= lps) { s->code += s->range; s->range = lps; }
        state = state + ((512 - state + 16) >> 5);
        if (state > 256) { mps = 1 - mps; state = 512 - state; }
        *model = (uint16_t)((state << 1) | mps);
    } else {
        state = state - ((state + 16) >> 5);
        *model = (uint16_t)((state << 1) | mps);
    }
    xt_renorm(s);
}

static void xt_encode_bin_ep(XtSbac *s, int bin)
{
    s->bin_counter++;
    s->range >>= 1;
    if (bin) s->code += s->range;
    s->range <<= 1;
    s->code <<= 1;
    if (--s->code_bits == 0) { xt_carry(s); s->code_bits = 8; }
}

static void xt_encode_bin_trm(XtSbac *s, int bin)
{
    s->bin_counter++;
    s->range--;
    if (bin) { s->code += s->range; s->range = 1; }
    xt_renorm(s);
}

static void xt_write_unary(XtSbac *s, uint16_t *models, int num_ctx, uint32_t sym)
{
    int ctx_idx = 0;
    xt_encode_bin(s, &models[0], sym ? 1 : 0);
    if (sym == 0) return;
    while (sym--) {
        if (ctx_idx < num_ctx - 1) ctx_idx++;
        xt_encode_bin(s, &models[ctx_idx], sym ? 1 : 0);
    }
}

static void xt_sbac_finish(XtSbac *s)
{
    uint32_t tmp = (s->code + s->range - 1) & (0xFFFFFFFFu << 14);
    if (tmp < s->code) tmp += 8192;
    s->code = tmp << s->code_bits;
    xt_carry(s);
    s->code <<= 8;
    xt_carry(s);
    while (s->stacked_zero) { xt_emit(s, 0); s->stacked_zero--; }
    if (s->pending_byte != 0) xt_emit(s, (uint8_t)s->pending_byte);
    else if (s->code_bits < 4) xt_emit(s, 0);
}

/* ------------------------------------------------------------------ */
/* Transforms (exact integer; xeve_tq.c / xeve_itdq.c semantics)       */
/* ------------------------------------------------------------------ */

/* 1-D forward DCT-2 over `line` vectors of length n laid out with stride
 * `line`: uses the even/odd symmetry of the DCT matrix (tm[u][k] ==
 * +-tm[u][n-1-k]) to halve the multiply count; integer-exact. */
static void xt_fwd_1d_s32(const int32_t *src, int32_t *dst, int n, int line,
                          const int8_t *T)
{
    int32_t E[32], O[32];
    for (int j = 0; j < line; j++) {
        const int32_t *r = src + j * n;
        for (int k = 0; k < n / 2; k++) {
            E[k] = r[k] + r[n - 1 - k];
            O[k] = r[k] - r[n - 1 - k];
        }
        for (int u = 0; u < n; u += 2) {
            const int8_t *t = T + u * n;
            int64_t acc = 0;
            for (int k = 0; k < n / 2; k++) acc += (int64_t)t[k] * E[k];
            dst[u * line + j] = (int32_t)acc;
        }
        for (int u = 1; u < n; u += 2) {
            const int8_t *t = T + u * n;
            int64_t acc = 0;
            for (int k = 0; k < n / 2; k++) acc += (int64_t)t[k] * O[k];
            dst[u * line + j] = (int32_t)acc;
        }
    }
}

static void xt_fwd_dct2(const int32_t *resi, int32_t *coef, int lg, int bd)
{
    int n = 1 << lg;
    const int8_t *T = XT_TM[lg];
    int shift = (lg - 1 + bd - 8) + (lg + 6);
    int64_t add = 1ll << (shift - 1);
    int32_t tmp[64 * 64]; /* tmp[u][j] */
    xt_fwd_1d_s32(resi, tmp, n, n, T);
    /* second stage with combined shift; same even/odd trick on columns of
     * tmp (each row of tmp is one frequency u over spatial rows j) */
    int64_t E[32], O[32];
    for (int u = 0; u < n; u++) {
        const int32_t *m = tmp + u * n;
        for (int j = 0; j < n / 2; j++) {
            E[j] = (int64_t)m[j] + m[n - 1 - j];
            O[j] = (int64_t)m[j] - m[n - 1 - j];
        }
        for (int v = 0; v < n; v += 2) {
            const int8_t *t = T + v * n;
            int64_t acc = 0;
            for (int j = 0; j < n / 2; j++) acc += (int64_t)t[j] * E[j];
            coef[v * n + u] = (int32_t)((acc + add) >> shift);
        }
        for (int v = 1; v < n; v += 2) {
            const int8_t *t = T + v * n;
            int64_t acc = 0;
            for (int j = 0; j < n / 2; j++) acc += (int64_t)t[j] * O[j];
            coef[v * n + u] = (int32_t)((acc + add) >> shift);
        }
    }
}

static void xt_inv_dct2(const int32_t *coef, int32_t *resi, int lg, int bd)
{
    int n = 1 << lg;
    const int8_t *T = XT_TM[lg];
    int shift = 7 + (12 - (bd - 8));
    int64_t add = 1ll << (shift - 1);
    int32_t tmp[64 * 64]; /* tmp[k][u] */
    /* stage 1 (columns): dst[k] and dst[n-1-k] share even/odd partials */
    for (int u = 0; u < n; u++) {
        for (int k = 0; k < n / 2; k++) {
            int64_t se = 0, so = 0;
            for (int v = 0; v < n; v += 2)
                se += (int64_t)T[v * n + k] * coef[v * n + u];
            for (int v = 1; v < n; v += 2)
                so += (int64_t)T[v * n + k] * coef[v * n + u];
            int64_t a = se + so, b = se - so;
            if (a > 2147483647ll) a = 2147483647ll;
            if (a < -2147483647ll) a = -2147483647ll;
            if (b > 2147483647ll) b = 2147483647ll;
            if (b < -2147483647ll) b = -2147483647ll;
            tmp[k * n + u] = (int32_t)a;
            tmp[(n - 1 - k) * n + u] = (int32_t)b;
        }
    }
    for (int k = 0; k < n; k++) {
        const int32_t *m = tmp + k * n;
        for (int c = 0; c < n / 2; c++) {
            int64_t se = 0, so = 0;
            for (int u = 0; u < n; u += 2)
                se += (int64_t)m[u] * T[u * n + c];
            for (int u = 1; u < n; u += 2)
                so += (int64_t)m[u] * T[u * n + c];
            int64_t a = (se + so + add) >> shift;
            int64_t b = (se - so + add) >> shift;
            if (a > 32767) a = 32767;
            if (a < -32768) a = -32768;
            if (b > 32767) b = 32767;
            if (b < -32768) b = -32768;
            resi[k * n + c] = (int32_t)a;
            resi[k * n + (n - 1 - c)] = (int32_t)b;
        }
    }
}

static void xt_dequant(const int32_t *lev, int32_t *out, int lg, int qp, int bd)
{
    int n = 1 << lg;
    int log2_size = lg; /* square blocks */
    int scale = XT_DQ_SCALE[qp % 6] << (qp / 6);
    int tr_shift = 15 - bd - log2_size;
    int shift = 20 - 14 - tr_shift;
    int64_t offset = (shift == 0) ? 0 : (1ll << (shift - 1));
    for (int i = 0; i < n * n; i++) {
        int64_t v = ((int64_t)lev[i] * scale + offset) >> shift;
        if (v > 32767) v = 32767;
        if (v < -32768) v = -32768;
        out[i] = (int32_t)v;
    }
}

/* deadzone quant (non-RDOQ path) */
static int xt_quant(const int32_t *coef, int32_t *lev, int lg, int qp,
                    int slice_is_i, int bd)
{
    int n = 1 << lg;
    int scale = XT_QUANT_SCALE[qp % 6];
    int tr_shift = 15 - bd - lg;
    int shift = 14 + tr_shift + qp / 6;
    int64_t offset = (int64_t)(slice_is_i ? 171 : 85) << (shift - 9);
    int nnz = 0;
    for (int i = 0; i < n * n; i++) {
        int64_t a = coef[i] < 0 ? -(int64_t)coef[i] : coef[i];
        int64_t l = (a * scale + offset) >> shift;
        if (l > 32767) l = 32767;
        lev[i] = coef[i] < 0 ? (int32_t)-l : (int32_t)l;
        nnz += (l != 0);
    }
    return nnz;
}

/* ------------------------------------------------------------------ */
/* RDOQ (xeve_tq.c:497 semantics, context-state bit estimates)         */
/* ------------------------------------------------------------------ */

static int32_t xt_entropy_bits[1024];

static void xt_init_entropy_bits(void)
{
    for (int i = 0; i < 1024; i++) {
        double p = (512.0 * (i + 0.5)) / 1024.0;
        xt_entropy_bits[i] = (int32_t)(-32768.0 * (log(p) / log(2.0) - 9.0));
    }
}

static inline int32_t xt_biari_no_bits(int sym, uint16_t model)
{
    uint16_t mps = model & 1;
    uint16_t state = model >> 1;
    state = ((sym != 0) != mps) ? state : (uint16_t)(512 - state);
    return xt_entropy_bits[state << 1];
}

typedef struct {
    int32_t cbf_luma[2], cbf_cb[2], cbf_cr[2], cbf_all[2];
    int32_t run[24][2], level[24][2], last[2][2];
} XtRdoqEst;

static void xt_rdoq_est(const XtCtx *c, XtRdoqEst *e)
{
    for (int b = 0; b < 2; b++) {
        e->cbf_luma[b] = xt_biari_no_bits(b, c->cbf_luma[0]);
        e->cbf_cb[b] = xt_biari_no_bits(b, c->cbf_cb[0]);
        e->cbf_cr[b] = xt_biari_no_bits(b, c->cbf_cr[0]);
        e->cbf_all[b] = xt_biari_no_bits(b, c->cbf_all[0]);
        for (int x = 0; x < 24; x++) {
            e->run[x][b] = xt_biari_no_bits(b, c->run[x]);
            e->level[x][b] = xt_biari_no_bits(b, c->level[x]);
        }
        for (int x = 0; x < 2; x++)
            e->last[x][b] = xt_biari_no_bits(b, c->last[x]);
    }
}

#define XT_GET_IEP_RATE 32768

static inline int64_t xt_rate_cost(const XtRdoqEst *e, int abs_level,
                                   int run, int ctx_rl, int64_t lam)
{
    int64_t rate;
    if (abs_level == 0) {
        rate = e->run[run == 0 ? ctx_rl : ctx_rl + 1][1];
    } else {
        rate = XT_GET_IEP_RATE;
        rate += e->run[run == 0 ? ctx_rl : ctx_rl + 1][0];
        if (abs_level == 1) {
            rate += e->level[ctx_rl][0];
        } else {
            rate += e->level[ctx_rl][1];
            rate += (int64_t)e->level[ctx_rl + 1][1] * (abs_level - 2);
            rate += e->level[ctx_rl + 1][0];
        }
    }
    return rate * lam;
}

static int64_t xt_err_scale(int qp_rem, int log2_size, int bd)
{
    int q_value = XT_QUANT_SCALE[qp_rem];
    int tr_shift = 15 - bd - log2_size;
    double es = (double)(1 << 15) * pow(2.0, -tr_shift);
    es = es / q_value / (1 << (bd - 8));
    return (int64_t)(es * (double)(1 << 20));
}

static int xt_rdoq(const int32_t *coef, int32_t *dst, int lg, int qp,
                   double lam_f, int ch_type, int bd, const XtRdoqEst *e,
                   int slice_is_i)
{
    int n = 1 << lg;
    int num = n * n;
    int qp_rem = qp % 6;
    int q_value = XT_QUANT_SCALE[qp_rem];
    int tr_shift = 15 - bd - lg;
    int q_bits = 14 + tr_shift + qp / 6;
    int64_t lam = (int64_t)(lam_f * (double)(1 << 15) + 0.5);
    int64_t es = xt_err_scale(qp_rem, lg, bd);
    const uint16_t *scan = XT_SCAN[lg];

    /* fast zero-block check */
    {
        int64_t offset_fast = (int64_t)(slice_is_i ? 201 : 153) << (q_bits - 9);
        int64_t thr = (1ll << q_bits) - offset_fast;
        int coded = 0;
        for (int i = 0; i < num; i++) {
            int64_t a = coef[i] < 0 ? -(int64_t)coef[i] : coef[i];
            if (a * q_value >= thr) { coded = 1; break; }
        }
        if (!coded) { memset(dst, 0, sizeof(int32_t) * num); return 0; }
    }

    int64_t block_uncoded = 0;
    static int64_t level_double[64 * 64];
    static int32_t max_abs[64 * 64];
    for (int i = 0; i < num; i++) {
        int64_t a = coef[i] < 0 ? -(int64_t)coef[i] : coef[i];
        int64_t ld = a * q_value;
        int64_t cap = 2147483647ll - (1ll << (q_bits - 1));
        if (ld > cap) ld = cap;
        level_double[i] = ld;
        int64_t ma = ld >> q_bits;
        int lower = (ld - (ma << q_bits)) < (1ll << (q_bits - 1));
        if (!lower) ma++;
        max_abs[i] = (int32_t)ma;
        int64_t err = (ld * es) >> 20;
        block_uncoded += err * err;
    }

    int64_t best_cost, base_cost;
    const int32_t *cbf_est = (ch_type == 0) ? e->cbf_luma
                             : (ch_type == 1) ? e->cbf_cb : e->cbf_cr;
    best_cost = block_uncoded + (int64_t)cbf_est[0] * lam;
    base_cost = block_uncoded + (int64_t)cbf_est[1] * lam;

    int ctx_rl = (ch_type == 0) ? 0 : 2;
    int ctx_last = (ch_type == 0) ? 0 : 1;
    int64_t cost_last0 = (int64_t)e->last[ctx_last][0] * lam;
    int64_t cost_last1 = (int64_t)e->last[ctx_last][1] * lam;

    static int32_t levels_s[64 * 64];
    int run = 0;
    int best_last_p1 = 0;
    for (int sp = 0; sp < num; sp++) {
        int bp = scan[sp];
        int64_t ld = level_double[bp];
        int ma = max_abs[bp];
        int64_t err1 = (ld * es) >> 20;
        int64_t uncoded = err1 * err1;
        int best_lvl = 0;
        int64_t coded = uncoded + xt_rate_cost(e, 0, run, ctx_rl, lam);
        int mn = ma > 1 ? ma - 1 : 1;
        for (int lvl = ma; lvl >= mn; lvl--) {
            int64_t delta = ld - ((int64_t)lvl << q_bits);
            int64_t err = (delta * es) >> 20;
            int64_t c = err * err + xt_rate_cost(e, lvl, run, ctx_rl, lam);
            if (c < coded) { best_lvl = lvl; coded = c; }
        }
        base_cost += coded - uncoded;
        levels_s[sp] = best_lvl;
        if (best_lvl) {
            int64_t cur_last = base_cost + cost_last1;
            base_cost += cost_last0;
            if (cur_last < best_cost) { best_cost = cur_last; best_last_p1 = sp + 1; }
            run = 0;
        } else run++;
    }

    int nnz = 0;
    memset(dst, 0, sizeof(int32_t) * num);
    for (int sp = 0; sp < best_last_p1; sp++) {
        if (levels_s[sp]) {
            int bp = scan[sp];
            dst[bp] = (coef[bp] < 0) ? -levels_s[sp] : levels_s[sp];
            nnz++;
        }
    }
    return nnz;
}

/* ------------------------------------------------------------------ */
/* Intra prediction (xeve_ipred.c semantics)                           */
/* ------------------------------------------------------------------ */

static void xt_ipred(int mode, const int32_t *up, const int32_t *left,
                     int32_t ul, int32_t *pred, int n)
{
    switch (mode) {
    case 2: /* VER */
        for (int i = 0; i < n; i++)
            for (int j = 0; j < n; j++) pred[i * n + j] = up[j];
        break;
    case 1: /* HOR */
        for (int i = 0; i < n; i++)
            for (int j = 0; j < n; j++) pred[i * n + j] = left[i];
        break;
    case 0: { /* DC */
        int32_t dc = 0;
        for (int i = 0; i < n; i++) dc += left[i] + up[i];
        int lg = 0; while ((1 << lg) < n) lg++;
        dc = (dc + n) >> (lg + 1);
        for (int i = 0; i < n * n; i++) pred[i] = dc;
        break;
    }
    case 3: /* UL diagonal */
        for (int i = 0; i < n; i++)
            for (int j = 0; j < n; j++) {
                int d = i - j;
                pred[i * n + j] = d > 0 ? left[d - 1] : (d == 0 ? ul : up[-d - 1]);
            }
        break;
    case 4: /* UR */
        for (int i = 0; i < n; i++)
            for (int j = 0; j < n; j++)
                pred[i * n + j] = (up[i + j + 1] + left[i + j + 1]) >> 1;
        break;
    }
}

/* ------------------------------------------------------------------ */
/* Frame coding state                                                  */
/* ------------------------------------------------------------------ */

typedef struct {
    int32_t w, h, bd;
    int32_t qp, qp_u_off, qp_v_off;
    int32_t use_rdoq, use_deblock;
} XtFrameCfg;

typedef struct {
    const XtFrameCfg *cfg;
    const int16_t *oy, *ou, *ov;
    uint16_t *ry, *ru, *rv;         /* recon planes */
    uint8_t *map_cod, *map_if, *map_cbf;
    int8_t *map_ipm;
    int32_t w_scu, h_scu;
    const uint8_t *const *split_maps;  /* [lg] -> map or NULL */
    const uint8_t *const *mode_maps;
    XtSbac *sbac;
    XtCtx *ctx;
    XtRdoqEst est;
    int qp_y, qp_u, qp_v;
    double lam, lam_u, lam_v;
    int32_t *leaf_x, *leaf_y;
    int16_t *leaf_lg;
    int32_t n_leaf;
} XtFrame;

static int xt_chroma_qp(int qp)
{
    if (qp < 0) return 0;
    if (qp > 57) qp = 57;
    return XT_QP_CHROMA[qp];
}

/* gather neighbours: unit=4 luma / 2 chroma, per-SCU availability */
static void xt_gather_nb(const uint16_t *plane, int stride, int W, int H,
                         const uint8_t *map_cod, int w_scu, int h_scu,
                         int x, int y, int n, int x_scu, int y_scu, int unit,
                         int bd, int32_t *up, int32_t *left, int32_t *ul)
{
    int mid = 1 << (bd - 1);
    int n_units = (2 * n) / unit;
    for (int i = 0; i < 2 * n; i++) { up[i] = mid; left[i] = mid; }
    if (y_scu > 0) {
        for (int i = 0; i < n_units; i++) {
            int xi = x_scu + i;
            if (xi < w_scu && map_cod[(y_scu - 1) * w_scu + xi]) {
                int xs = x + i * unit;
                for (int k = 0; k < unit && xs + k < W; k++)
                    up[i * unit + k] = plane[(y - 1) * stride + xs + k];
            }
        }
    }
    if (x_scu > 0) {
        for (int i = 0; i < n_units; i++) {
            int yi = y_scu + i;
            if (yi < h_scu && map_cod[yi * w_scu + x_scu - 1]) {
                int ys = y + i * unit;
                for (int k = 0; k < unit && ys + k < H; k++)
                    left[i * unit + k] = plane[(ys + k) * stride + x - 1];
            }
        }
    }
    *ul = (x_scu > 0 && y_scu > 0 && map_cod[(y_scu - 1) * w_scu + x_scu - 1])
          ? plane[(y - 1) * stride + x - 1] : mid;
}

static void xt_write_coef_block(XtSbac *s, XtCtx *c, const int32_t *lev,
                                int lg, int ch_type)
{
    int n = 1 << lg;
    int num = n * n;
    const uint16_t *scan = XT_SCAN[lg];
    int t0 = (ch_type == 0) ? 0 : 2;
    int ctx_last = (ch_type == 0) ? 0 : 1;
    /* count sig */
    int nsig = 0;
    for (int i = 0; i < num; i++) nsig += (lev[i] != 0);
    int run = 0;
    int remaining = nsig;
    for (int sp = 0; sp < num; sp++) {
        int32_t v = lev[scan[sp]];
        if (v == 0) { run++; continue; }
        int level = v < 0 ? -v : v;
        xt_write_unary(s, &c->run[t0], 2, run);
        xt_write_unary(s, &c->level[t0], 2, level - 1);
        xt_encode_bin_ep(s, v < 0);
        if (sp == num - 1) break;
        run = 0;
        remaining--;
        int last = (remaining == 0);
        xt_encode_bin(s, &c->last[ctx_last], last);
        if (last) break;
    }
}

static void xt_code_cu(XtFrame *f, int x, int y, int lg)
{
    const XtFrameCfg *cfg = f->cfg;
    int n = 1 << lg;
    int bd = cfg->bd;
    int W = cfg->w, H = cfg->h;
    int x_scu = x >> 2, y_scu = y >> 2;
    int ipm = f->mode_maps[lg][(y >> lg) * (W >> lg) + (x >> lg)];

    int32_t up[128 + 2], left[128 + 2], ul;
    int32_t pred_y[64 * 64], resi[64 * 64], coef[64 * 64], lev_y[64 * 64];
    int32_t pred_c[32 * 32], lev_u[32 * 32], lev_v[32 * 32];

    /* --- luma --- */
    xt_gather_nb(f->ry, W, W, H, f->map_cod, f->w_scu, f->h_scu,
                 x, y, n, x_scu, y_scu, 4, bd, up, left, &ul);
    xt_ipred(ipm, up, left, ul, pred_y, n);
    for (int i = 0; i < n; i++)
        for (int j = 0; j < n; j++)
            resi[i * n + j] = (int32_t)f->oy[(y + i) * W + x + j] - pred_y[i * n + j];
    xt_fwd_dct2(resi, coef, lg, bd);
    int nnz_y;
    if (cfg->use_rdoq)
        nnz_y = xt_rdoq(coef, lev_y, lg, f->qp_y, f->lam, 0, bd, &f->est, 1);
    else
        nnz_y = xt_quant(coef, lev_y, lg, f->qp_y, 1, bd);
    {
        int mx = (1 << bd) - 1;
        if (nnz_y) {
            int32_t dq[64 * 64], rr[64 * 64];
            xt_dequant(lev_y, dq, lg, f->qp_y, bd);
            xt_inv_dct2(dq, rr, lg, bd);
            for (int i = 0; i < n; i++)
                for (int j = 0; j < n; j++) {
                    int16_t t = (int16_t)(rr[i * n + j] + pred_y[i * n + j]);
                    int32_t v = t;
                    if (v < 0) v = 0; if (v > mx) v = mx;
                    f->ry[(y + i) * W + x + j] = (uint16_t)v;
                }
        } else {
            for (int i = 0; i < n; i++)
                for (int j = 0; j < n; j++) {
                    int32_t v = pred_y[i * n + j];
                    if (v < 0) v = 0; if (v > mx) v = mx;
                    f->ry[(y + i) * W + x + j] = (uint16_t)v;
                }
        }
    }

    /* --- chroma --- */
    int xc = x >> 1, yc = y >> 1, nc = n >> 1;
    int Wc = W >> 1, Hc = H >> 1;
    int nnz_u = 0, nnz_v = 0;
    uint16_t *planes[2] = { f->ru, f->rv };
    const int16_t *origs[2] = { f->ou, f->ov };
    int qpc[2] = { f->qp_u, f->qp_v };
    double lamc[2] = { f->lam_u, f->lam_v };
    int32_t *levc[2] = { lev_u, lev_v };
    int nnzc[2] = { 0, 0 };
    for (int ch = 0; ch < 2; ch++) {
        xt_gather_nb(planes[ch], Wc, Wc, Hc, f->map_cod, f->w_scu, f->h_scu,
                     xc, yc, nc, x_scu, y_scu, 2, bd, up, left, &ul);
        xt_ipred(ipm, up, left, ul, pred_c, nc);
        for (int i = 0; i < nc; i++)
            for (int j = 0; j < nc; j++)
                resi[i * nc + j] = (int32_t)origs[ch][(yc + i) * Wc + xc + j] - pred_c[i * nc + j];
        xt_fwd_dct2(resi, coef, lg - 1, bd);
        if (cfg->use_rdoq)
            nnzc[ch] = xt_rdoq(coef, levc[ch], lg - 1, qpc[ch], lamc[ch],
                               ch + 1, bd, &f->est, 1);
        else
            nnzc[ch] = xt_quant(coef, levc[ch], lg - 1, qpc[ch], 1, bd);
        int mx = (1 << bd) - 1;
        if (nnzc[ch]) {
            int32_t dq[32 * 32], rr[32 * 32];
            xt_dequant(levc[ch], dq, lg - 1, qpc[ch], bd);
            xt_inv_dct2(dq, rr, lg - 1, bd);
            for (int i = 0; i < nc; i++)
                for (int j = 0; j < nc; j++) {
                    int16_t t = (int16_t)(rr[i * nc + j] + pred_c[i * nc + j]);
                    int32_t v = t;
                    if (v < 0) v = 0; if (v > mx) v = mx;
                    planes[ch][(yc + i) * Wc + xc + j] = (uint16_t)v;
                }
        } else {
            for (int i = 0; i < nc; i++)
                for (int j = 0; j < nc; j++) {
                    int32_t v = pred_c[i * nc + j];
                    if (v < 0) v = 0; if (v > mx) v = mx;
                    planes[ch][(yc + i) * Wc + xc + j] = (uint16_t)v;
                }
        }
    }
    nnz_u = nnzc[0]; nnz_v = nnzc[1];

    /* --- syntax --- */
    {
        /* MPM ranking (xeve_get_mpm) */
        int ipm_l = 0, ipm_u = 0;
        if (x_scu > 0 && f->map_if[y_scu * f->w_scu + x_scu - 1] &&
            f->map_cod[y_scu * f->w_scu + x_scu - 1])
            ipm_l = f->map_ipm[y_scu * f->w_scu + x_scu - 1] + 1;
        if (y_scu > 0 && f->map_if[(y_scu - 1) * f->w_scu + x_scu] &&
            f->map_cod[(y_scu - 1) * f->w_scu + x_scu])
            ipm_u = f->map_ipm[(y_scu - 1) * f->w_scu + x_scu] + 1;
        int rank = XT_MPM[(ipm_l * 6 + ipm_u) * 5 + ipm];
        xt_write_unary(f->sbac, f->ctx->intra_dir, 2, rank);
        xt_encode_bin(f->sbac, f->ctx->cbf_cb, nnz_u ? 1 : 0);
        xt_encode_bin(f->sbac, f->ctx->cbf_cr, nnz_v ? 1 : 0);
        xt_encode_bin(f->sbac, f->ctx->cbf_luma, nnz_y ? 1 : 0);
        if (nnz_y) xt_write_coef_block(f->sbac, f->ctx, lev_y, lg, 0);
        if (nnz_u) xt_write_coef_block(f->sbac, f->ctx, lev_u, lg - 1, 1);
        if (nnz_v) xt_write_coef_block(f->sbac, f->ctx, lev_v, lg - 1, 1);
    }

    /* --- maps --- */
    {
        int ws = n >> 2;
        for (int i = 0; i < ws; i++)
            for (int j = 0; j < ws; j++) {
                int idx = (y_scu + i) * f->w_scu + x_scu + j;
                f->map_cod[idx] = 1;
                f->map_if[idx] = 1;
                f->map_ipm[idx] = (int8_t)ipm;
                f->map_cbf[idx] = nnz_y ? 1 : 0;
            }
        f->leaf_x[f->n_leaf] = x;
        f->leaf_y[f->n_leaf] = y;
        f->leaf_lg[f->n_leaf] = (int16_t)lg;
        f->n_leaf++;
    }
}

static void xt_code_tree(XtFrame *f, int x, int y, int lg)
{
    const XtFrameCfg *cfg = f->cfg;
    int n = 1 << lg;
    int split;
    int boundary = (x + n > cfg->w) || (y + n > cfg->h);
    if (boundary) split = 1;
    else if (lg == 2) split = 0;
    else {
        const uint8_t *sm = f->split_maps[lg];
        split = sm ? sm[(y >> lg) * (cfg->w >> lg) + (x >> lg)] : 0;
    }
    if (n >= 8)
        xt_encode_bin(f->sbac, f->ctx->split_cu_flag, split);
    if (split) {
        int half = n >> 1;
        static const int dx[4] = {0, 1, 0, 1}, dy[4] = {0, 0, 1, 1};
        for (int p = 0; p < 4; p++) {
            int xp = x + dx[p] * half, yp = y + dy[p] * half;
            if (xp < cfg->w && yp < cfg->h)
                xt_code_tree(f, xp, yp, lg - 1);
        }
    } else {
        xt_code_cu(f, x, y, lg);
    }
}

/* ------------------------------------------------------------------ */
/* Deblocking (z-order leaves; vertical pass then horizontal pass)     */
/* ------------------------------------------------------------------ */

static inline int32_t xt_div_trunc(int32_t num, int32_t den)
{
    return num / den; /* C truncates toward zero, matching reference */
}

static void xt_df_luma_line(uint16_t *A, uint16_t *B, uint16_t *C, uint16_t *D,
                            int st, int bd)
{
    int32_t a = *A, b = *B, cc = *C, d = *D;
    int32_t diff = xt_div_trunc(a - 4 * b + 4 * cc - d, 8);
    int32_t ab = diff < 0 ? -diff : diff;
    int32_t sign = diff < 0 ? -1 : (diff > 0 ? 1 : 0);
    int32_t t16 = ab - st; if (t16 < 0) t16 = 0; t16 <<= 1;
    int32_t clip = ab - t16; if (clip < 0) clip = 0;
    int32_t d1 = sign * clip;
    int32_t clip2 = clip >> 1;
    int32_t ad4 = xt_div_trunc(a - d, 4);
    int32_t d2 = ad4;
    if (d2 < -clip2) d2 = -clip2;
    if (d2 > clip2) d2 = clip2;
    int mx = (1 << bd) - 1;
    int32_t an = a - d2, bn = b + d1, cn = cc - d1, dn = d + d2;
    *A = (uint16_t)(an < 0 ? 0 : (an > mx ? mx : an));
    *B = (uint16_t)(bn < 0 ? 0 : (bn > mx ? mx : bn));
    *C = (uint16_t)(cn < 0 ? 0 : (cn > mx ? mx : cn));
    *D = (uint16_t)(dn < 0 ? 0 : (dn > mx ? mx : dn));
}

static void xt_df_chroma_line(uint16_t *B, uint16_t *C, int32_t a, int32_t d,
                              int st, int bd)
{
    int32_t b = *B, cc = *C;
    int32_t diff = xt_div_trunc(a - 4 * b + 4 * cc - d, 8);
    int32_t ab = diff < 0 ? -diff : diff;
    int32_t sign = diff < 0 ? -1 : (diff > 0 ? 1 : 0);
    int32_t t16 = ab - st; if (t16 < 0) t16 = 0; t16 <<= 1;
    int32_t clip = ab - t16; if (clip < 0) clip = 0;
    int32_t d1 = sign * clip;
    int mx = (1 << bd) - 1;
    int32_t bn = b + d1, cn = cc - d1;
    *B = (uint16_t)(bn < 0 ? 0 : (bn > mx ? mx : bn));
    *C = (uint16_t)(cn < 0 ? 0 : (cn > mx ? mx : cn));
}

static void xt_deblock(XtFrame *f)
{
    const XtFrameCfg *cfg = f->cfg;
    int W = cfg->w, H = cfg->h, bd = cfg->bd;
    int Wc = W >> 1;
    int bdc8 = bd - 8;
    int qp = cfg->qp;
    (void)H;

    /* strengths: all-intra -> idx 0 everywhere; keep general via maps */
    for (int pass = 0; pass < 2; pass++) {
        for (int li = 0; li < f->n_leaf; li++) {
            int x = f->leaf_x[li], y = f->leaf_y[li];
            int n = 1 << f->leaf_lg[li];
            if (pass == 0) { /* vertical edges: left edge of CU */
                if (x == 0) continue;
                for (int i = 0; i < (n >> 2); i++) {
                    int yy = y + i * 4;
                    int scu = (yy >> 2) * f->w_scu + (x >> 2);
                    int scu_l = scu - 1;
                    int idx = (f->map_if[scu] || f->map_if[scu_l]) ? 0
                              : ((f->map_cbf[scu] || f->map_cbf[scu_l]) ? 1 : 3);
                    int st = (XT_DF_ST[idx * 52 + qp]) << bdc8;
                    if (st) {
                        for (int r = 0; r < 4; r++) {
                            uint16_t *row = f->ry + (yy + r) * W;
                            xt_df_luma_line(&row[x - 2], &row[x - 1], &row[x], &row[x + 1], st, bd);
                        }
                    }
                    int qp_ui = qp + cfg->qp_u_off;
                    int qp_vi = qp + cfg->qp_v_off;
                    if (qp_ui < -6 * bdc8) qp_ui = -6 * bdc8;
                    if (qp_ui > 57) qp_ui = 57;
                    if (qp_vi < -6 * bdc8) qp_vi = -6 * bdc8;
                    if (qp_vi > 57) qp_vi = 57;
                    uint16_t *cps[2] = { f->ru, f->rv };
                    int cqp[2] = { xt_chroma_qp(qp_ui), xt_chroma_qp(qp_vi) };
                    for (int ch = 0; ch < 2; ch++) {
                        int stc = (XT_DF_ST[idx * 52 + cqp[ch]]) << bdc8;
                        if (stc) {
                            int xcc = x >> 1, ycc = yy >> 1;
                            for (int r = 0; r < 2; r++) {
                                uint16_t *row = cps[ch] + (ycc + r) * Wc;
                                xt_df_chroma_line(&row[xcc - 1], &row[xcc],
                                                  row[xcc - 2], row[xcc + 1], stc, bd);
                            }
                        }
                    }
                }
            } else { /* horizontal edges: top edge of CU */
                if (y == 0) continue;
                for (int i = 0; i < (n >> 2); i++) {
                    int xx = x + i * 4;
                    int scu = (y >> 2) * f->w_scu + (xx >> 2);
                    int scu_u = scu - f->w_scu;
                    int idx = (f->map_if[scu] || f->map_if[scu_u]) ? 0
                              : ((f->map_cbf[scu] || f->map_cbf[scu_u]) ? 1 : 3);
                    int st = (XT_DF_ST[idx * 52 + qp]) << bdc8;
                    if (st) {
                        uint16_t *rA = f->ry + (y - 2) * W;
                        uint16_t *rB = f->ry + (y - 1) * W;
                        uint16_t *rC = f->ry + y * W;
                        uint16_t *rD = f->ry + (y + 1) * W;
                        for (int c2 = 0; c2 < 4; c2++)
                            xt_df_luma_line(&rA[xx + c2], &rB[xx + c2], &rC[xx + c2], &rD[xx + c2], st, bd);
                    }
                    int qp_ui = qp + cfg->qp_u_off;
                    int qp_vi = qp + cfg->qp_v_off;
                    if (qp_ui < -6 * bdc8) qp_ui = -6 * bdc8;
                    if (qp_ui > 57) qp_ui = 57;
                    if (qp_vi < -6 * bdc8) qp_vi = -6 * bdc8;
                    if (qp_vi > 57) qp_vi = 57;
                    uint16_t *cps[2] = { f->ru, f->rv };
                    int cqp[2] = { xt_chroma_qp(qp_ui), xt_chroma_qp(qp_vi) };
                    for (int ch = 0; ch < 2; ch++) {
                        int stc = (XT_DF_ST[idx * 52 + cqp[ch]]) << bdc8;
                        if (stc) {
                            int ycc = y >> 1, xcc = xx >> 1;
                            uint16_t *rB = cps[ch] + (ycc - 1) * Wc;
                            uint16_t *rC = cps[ch] + ycc * Wc;
                            uint16_t *rA = cps[ch] + (ycc - 2) * Wc;
                            uint16_t *rD = cps[ch] + (ycc + 1) * Wc;
                            for (int c2 = 0; c2 < 2; c2++)
                                xt_df_chroma_line(&rB[xcc + c2], &rC[xcc + c2],
                                                  rA[xcc + c2], rD[xcc + c2], stc, bd);
                        }
                    }
                }
            }
        }
    }
}

/* ------------------------------------------------------------------ */
/* Public API                                                          */
/* ------------------------------------------------------------------ */

typedef struct {
    int64_t payload_bytes;
    int64_t bin_count;
    int32_t n_leaf;
} XtStats;

XT_API int xt_encode_intra_frame(
    const XtFrameCfg *cfg,
    const int16_t *orig_y, const int16_t *orig_u, const int16_t *orig_v,
    const uint8_t *split2, const uint8_t *split3, const uint8_t *split4,
    const uint8_t *split5, const uint8_t *split6,
    const uint8_t *mode2, const uint8_t *mode3, const uint8_t *mode4,
    const uint8_t *mode5, const uint8_t *mode6,
    uint8_t *out_bs, int64_t out_cap,
    uint16_t *rec_y, uint16_t *rec_u, uint16_t *rec_v,
    XtStats *stats)
{
    static int init_done = 0;
    if (!init_done) { xt_init_entropy_bits(); init_done = 1; }

    int W = cfg->w, H = cfg->h, bd = cfg->bd;
    XtFrame f;
    memset(&f, 0, sizeof(f));
    f.cfg = cfg;
    f.oy = orig_y; f.ou = orig_u; f.ov = orig_v;
    f.ry = rec_y; f.ru = rec_u; f.rv = rec_v;
    f.w_scu = (W + 3) >> 2;
    f.h_scu = (H + 3) >> 2;
    int n_scu = f.w_scu * f.h_scu;
    f.map_cod = calloc(n_scu, 1);
    f.map_if = calloc(n_scu, 1);
    f.map_cbf = calloc(n_scu, 1);
    f.map_ipm = calloc(n_scu, 1);
    int max_leaf = (W / 4) * (H / 4) + 16;
    f.leaf_x = malloc(sizeof(int32_t) * max_leaf);
    f.leaf_y = malloc(sizeof(int32_t) * max_leaf);
    f.leaf_lg = malloc(sizeof(int16_t) * max_leaf);
    f.n_leaf = 0;

    const uint8_t *splits[7] = {0, 0, split2, split3, split4, split5, split6};
    const uint8_t *modes[7] = {0, 0, mode2, mode3, mode4, mode5, mode6};
    f.split_maps = splits;
    f.mode_maps = modes;

    int mid = 1 << (bd - 1);
    for (int i = 0; i < W * H; i++) rec_y[i] = mid;
    for (int i = 0; i < (W / 2) * (H / 2); i++) { rec_u[i] = mid; rec_v[i] = mid; }

    f.qp_y = cfg->qp + 6 * (bd - 8);
    int qpu_i = cfg->qp + cfg->qp_u_off;
    int qpv_i = cfg->qp + cfg->qp_v_off;
    if (qpu_i < -6 * (bd - 8)) qpu_i = -6 * (bd - 8);
    if (qpu_i > 57) qpu_i = 57;
    if (qpv_i < -6 * (bd - 8)) qpv_i = -6 * (bd - 8);
    if (qpv_i > 57) qpv_i = 57;
    f.qp_u = xt_chroma_qp(qpu_i) + 6 * (bd - 8);
    f.qp_v = xt_chroma_qp(qpv_i) + 6 * (bd - 8);
    f.lam = 0.57 * pow(2.0, (cfg->qp - 12) / 3.0);
    f.lam_u = f.lam / pow(2.0, (f.qp_y - f.qp_u) / 3.0);
    f.lam_v = f.lam / pow(2.0, (f.qp_y - f.qp_v) / 3.0);

    XtSbac sbac;
    XtCtx ctx;
    xt_sbac_init(&sbac, out_bs, out_cap);
    xt_ctx_init(&ctx);
    f.sbac = &sbac;
    f.ctx = &ctx;

    int w_lcu = (W + 63) >> 6, h_lcu = (H + 63) >> 6;
    for (int ly = 0; ly < h_lcu; ly++)
        for (int lx = 0; lx < w_lcu; lx++) {
            xt_rdoq_est(&ctx, &f.est);
            xt_code_tree(&f, lx << 6, ly << 6, 6);
        }
    xt_encode_bin_trm(&sbac, 1);
    xt_sbac_finish(&sbac);

    if (cfg->use_deblock) xt_deblock(&f);

    stats->payload_bytes = sbac.out_len;
    stats->bin_count = sbac.bin_counter;
    stats->n_leaf = f.n_leaf;

    free(f.map_cod); free(f.map_if); free(f.map_cbf); free(f.map_ipm);
    free(f.leaf_x); free(f.leaf_y); free(f.leaf_lg);
    return (sbac.out_len <= out_cap) ? 0 : -1;
}
