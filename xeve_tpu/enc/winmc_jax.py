"""Gather-free motion analysis primitives for the TPU device analyzer.

Round-3 profiling (with forced device sync — the axon remote platform's
block_until_ready is a no-op, so earlier numbers were async-skewed) showed
the fused B-frame analysis graph costs ~1.5 s/frame at 1080p: ~475 ms of
advanced-indexing gathers in the subpel refinement per reference plus
~145 ms of full-resolution exhaustive integer ME, per reference.  XLA:TPU
lowers per-block advanced indexing to scalar-unit gathers (16-83 ms per
frame-sized gather measured), while a one-hot matmul extraction of the
same windows runs under measurement noise (<2 ms) on the MXU.

This module re-expresses the whole inter analysis pipeline with ZERO
per-element gathers:

  coarse_me        dense full-search at quarter resolution (lax.scan over
                   rows of the search window; the 4x downsample cuts the
                   72 G abs-diff ops of full-res search to ~0.3 G while
                   WIDENING the effective range to +-24 full-res pels)
  build_patches    static overlapping per-block patch tensors (stride =
                   block, window = block + 2*margin) by strided reshapes
  onehot_extract   per-block window extraction at data-dependent integer
                   offsets as two one-hot einsums (MXU, f32-HIGHEST so
                   10-bit samples are exact)
  phase_windows    all 16 quarter-pel phase planes of each block window,
                   computed LOCALLY with static separable 8-tap filters
                   (integer-exact xeve_mc.c:39 semantics)
  eval_qpel        exhaustive SAD over the full +-8 qpel (+-2 pel)
                   candidate grid via static slices of the phase windows
                   — a quality superset of the reference's two-step
                   3x3 half/quarter pattern (xeve_pinter.c:553)
  perblock_mc      separable MC with per-block 12-tap filters (one-hot
                   over the 12 possible {int-offset, phase} combinations
                   per axis) — used to re-search large-CU MVs around the
                   median of their children (xeve_pinter.c:906 re-search
                   analog, fixing the median-only large-CU weakness)

Decisions only: the closed-loop native coding pass recomputes exact
integer costs, so analysis-side approximations change quality, never
conformance.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# xeve_tbl_mc_l_coeff rows 0/4/8/12 (/root/reference/src_base/xeve_mc.c:39)
MC_L = np.array([[0, 0, 0, 64, 0, 0, 0, 0],
                 [0, 1, -5, 52, 20, -5, 1, 0],
                 [0, 2, -10, 40, 40, -10, 2, 0],
                 [0, 1, -5, 20, 52, -5, 1, 0]], dtype=np.int32)

# 12-tap table for per-block {phase, int-offset} filters: T12[q+4] applies
# the 8-tap phase filter MC_L[q&3] at integer offset (q>>2) for qpel
# remainder q in [-4, 7]; out[r] = sum_t T12[q][t] * Wext[r + t] with the
# output block origin at Wext row 5 (see perblock_mc).
_T12 = np.zeros((12, 12), np.int32)
for _q in range(-4, 8):
    _d = _q >> 2
    _f = _q & 3
    for _j in range(8):
        _T12[_q + 4, 2 + _d + _j] = MC_L[_f, _j]

# extraction precision: one-hot matmuls must be exact for 10-bit samples;
# TPU default matmul precision is bf16 (8-bit mantissa) which rounds them
_HI = jax.lax.Precision.HIGHEST

MAX_MV_PEL = 23          # integer-pel MV clamp (patch margin 32 = 23+2+7)


def _ceil_div(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# coarse motion search (quarter resolution, full search)
# ---------------------------------------------------------------------------


def _pool4(x):
    h, w = x.shape
    h4, w4 = h // 4, w // 4
    return x[:h4 * 4, :w4 * 4].reshape(h4, 4, w4, 4).sum(axis=(1, 3))


def coarse_me(cur_y_f32, ref_pad_f32, pad: int, nby: int, nbx: int,
              R4: int = 6):
    """Full-search ME at quarter resolution on the 4x4-pooled planes.
    cur (hc, wc) f32 with hc = nby*16; ref_pad edge-padded by `pad`.
    Returns (nby, nbx, 2) full-res integer MVs (multiples of 4 pels,
    clamped to +-MAX_MV_PEL), effective range +-4*R4 full-res pels."""
    hc, wc = nby * 16, nbx * 16
    cur4 = _pool4(cur_y_f32)                       # (nby*4, nbx*4)
    # pooled reference with R4+1 pooled-pel padding around the frame
    margin4 = R4 + 1
    r0 = pad - 4 * margin4
    ref_c = jax.lax.dynamic_slice(
        ref_pad_f32, (r0, r0), (hc + 8 * margin4, wc + 8 * margin4))
    ref4 = _pool4(ref_c)                           # (+2*margin4 each dim)
    H4, W4 = nby * 4, nbx * 4

    dxs = jnp.arange(-R4, R4 + 1)

    def row(carry, dy):
        best_sad, best_dx, best_dy = carry
        strip = jax.lax.dynamic_slice(ref4, (margin4 + dy, 0),
                                      (H4, W4 + 2 * margin4))
        cands = jnp.stack([strip[:, margin4 - R4 + i:margin4 - R4 + i + W4]
                           for i in range(2 * R4 + 1)])
        d = jnp.abs(cur4[None] - cands)
        # block = 4 pooled pels = 16 full-res
        sads = d.reshape(2 * R4 + 1, nby, 4, nbx, 4).sum(axis=(2, 4))
        reg = 4.0 * (jnp.abs(dxs)[:, None, None] + jnp.abs(dy)) \
            .astype(cur4.dtype)
        sads = sads + reg
        am = jnp.argmin(sads, axis=0)
        mn = jnp.min(sads, axis=0)
        upd = mn < best_sad
        best_sad = jnp.where(upd, mn, best_sad)
        best_dx = jnp.where(upd, dxs[am], best_dx)
        best_dy = jnp.where(upd, dy, best_dy)
        return (best_sad, best_dx, best_dy), None

    init = (jnp.full((nby, nbx), jnp.inf, cur4.dtype),
            jnp.zeros((nby, nbx), jnp.int32),
            jnp.zeros((nby, nbx), jnp.int32))
    (_, bdx, bdy), _ = jax.lax.scan(row, init, jnp.arange(-R4, R4 + 1))
    mv = jnp.stack([bdx, bdy], axis=-1) * 4
    return jnp.clip(mv, -MAX_MV_PEL, MAX_MV_PEL)


# ---------------------------------------------------------------------------
# patches + one-hot extraction
# ---------------------------------------------------------------------------


def build_patches(plane_pad, bs: int, k: int, off: int, nby: int, nbx: int,
                  pad: int):
    """(nby, nbx, k*bs, k*bs) f32 patches: patch[i,j,a,b] =
    plane_pad[pad + bs*i + a - off, pad + bs*j + b - off].  Static strided
    slicing only; requires off <= pad and (k*bs - off) <= pad + bs."""
    win = k * bs
    Wp = plane_pad.shape[1]
    rows = []
    for sa in range(k):
        r0 = pad - off + bs * sa
        rows.append(jax.lax.dynamic_slice(
            plane_pad, (r0, 0), (nby * bs, Wp)).reshape(nby, bs, Wp))
    Pr = jnp.concatenate(rows, axis=1)             # (nby, win, Wp)
    cols = []
    for sb in range(k):
        c0 = pad - off + bs * sb
        cols.append(jax.lax.dynamic_slice(
            Pr, (0, 0, c0), (nby, win, nbx * bs)).reshape(nby, win, nbx, bs))
    P = jnp.concatenate(cols, axis=3)              # (nby, win, nbx, win)
    return P.transpose(0, 2, 1, 3).astype(jnp.float32)


def onehot_extract(P, off_r, off_c, oh: int, ow: int):
    """Extract (oh, ow) windows at per-block integer offsets (off_r, off_c)
    into the patch, as two one-hot matmuls on the MXU.  P: (nby, nbx, win,
    win) f32; offsets (nby, nbx) int32 in [0, win - oh/ow]."""
    win = P.shape[-1]
    arr = jnp.arange(oh)
    arc = jnp.arange(ow)
    idx = jnp.arange(win)
    oh_r = (off_r[..., None, None] + arr[None, None, :, None]
            == idx[None, None, None, :]).astype(jnp.float32)
    oh_c = (off_c[..., None, None] + arc[None, None, :, None]
            == idx[None, None, None, :]).astype(jnp.float32)
    t = jnp.einsum('ijrk,ijkc->ijrc', oh_r, P, precision=_HI)
    return jnp.einsum('ijrc,ijwc->ijrw', t, oh_c, precision=_HI)


# ---------------------------------------------------------------------------
# local quarter-pel phase windows (exact xeve_mc.c integer semantics)
# ---------------------------------------------------------------------------


def _hfilt(W, co, shift, lo, n):
    """8-tap filter along the last axis at output cols [lo, lo+n);
    taps at input offsets c-3..c+4.  W int32 (..., h, w)."""
    acc = None
    for kk in range(8):
        term = co[kk] * jax.lax.slice_in_dim(W, lo - 3 + kk, lo - 3 + kk + n,
                                             axis=-1)
        acc = term if acc is None else acc + term
    return acc >> shift


def _vfilt(W, co, shift, off, lo, n):
    acc = None
    for kk in range(8):
        term = co[kk] * jax.lax.slice_in_dim(W, lo - 3 + kk, lo - 3 + kk + n,
                                             axis=-2)
        acc = term if acc is None else acc + term
    return (acc + off) >> shift


def phase_windows(W32, bd: int, lo: int = 3, n: int = 24):
    """All 16 qpel phase planes of each (32, 32) block window, over window
    coords [lo, lo+n) x [lo, lo+n).  W32: (..., 32, 32) int32.  Returns
    (..., 16, n, n) int32, plane index fy*4+fx; integer-exact
    analysis_inter_jax._phase_planes semantics."""
    mx = (1 << bd) - 1
    shift1 = min(4, bd - 8)
    shift2 = max(8, 20 - bd)
    off2 = 1 << (shift2 - 1)
    co = MC_L
    # horizontal stage
    h_full = {0: jax.lax.slice_in_dim(W32, lo, lo + n, axis=-1)}
    h_tmp = {}
    for fx in (1, 2, 3):
        h_full[fx] = jnp.clip(_hfilt(W32, co[fx], 6, lo, n), 0, mx)
        t = _hfilt(W32, co[fx], shift1, lo, n)
        h_tmp[fx] = t.astype(jnp.int16).astype(jnp.int32)
    planes = []
    for fy in range(4):
        for fx in range(4):
            if fy == 0:
                p = jax.lax.slice_in_dim(h_full[fx], lo, lo + n, axis=-2)
            elif fx == 0:
                p = jnp.clip(_vfilt(W32, co[fy], 6, 0, lo, n)
                             [..., lo:lo + n], 0, mx)
            else:
                p = jnp.clip(_vfilt(h_tmp[fx], co[fy], shift2, off2, lo, n),
                             0, mx)
            planes.append(p.astype(jnp.int16))
    return jnp.stack(planes, axis=-3)


# ---------------------------------------------------------------------------
# exhaustive qpel candidate evaluation
# ---------------------------------------------------------------------------


def _cand_table(rng: int, lo: int, origin: int):
    """(n_cand,) arrays (qx, qy, pidx, r0, c0) for the qpel candidate grid,
    zero offset first so SAD ties favor it."""
    offs = [0] + [q for q in range(-rng, rng + 1) if q != 0]
    qx, qy, pidx, r0, c0 = [], [], [], [], []
    for oy in offs:
        for ox in offs:
            qx.append(ox)
            qy.append(oy)
            pidx.append((oy & 3) * 4 + (ox & 3))
            r0.append(origin + (oy >> 2) - lo)
            c0.append(origin + (ox >> 2) - lo)
    mk = lambda a: jnp.asarray(np.array(a, np.int32))
    return mk(qx), mk(qy), mk(pidx), mk(r0), mk(c0)


def eval_qpel(cur16, vw, rng: int = 8, lo: int = 3, origin: int = 7):
    """Exhaustive SAD over the (2*rng+1)^2 qpel offsets in [-rng, rng]^2
    for every block, as a lax.scan over the candidate table (tiny compiled
    body; each step is a frame-sized SAD).  cur16: (nby, nbx, 16, 16)
    int32; vw: (nby, nbx, 16, n, n) int16 phase windows with window coord
    `origin` = block start, planes offset by `lo`.  Returns (best_q
    (nby,nbx,2), best_sad, best_sq, best_pred): the squared-diff block and
    prediction of the winner."""
    nby, nbx = cur16.shape[:2]
    tbl = jnp.stack(_cand_table(rng, lo, origin), axis=1)   # (n_cand, 5)

    def step(carry, row):
        best_sad, best_q, best_sq, best_pred = carry
        qx, qy, pidx, r0, c0 = row[0], row[1], row[2], row[3], row[4]
        pred = jax.lax.dynamic_slice(
            vw, (0, 0, pidx, r0, c0), (nby, nbx, 1, 16, 16))[:, :, 0] \
            .astype(jnp.int32)
        diff = cur16 - pred
        sad = jnp.abs(diff).sum(axis=(-1, -2))
        upd = sad < best_sad
        best_sad = jnp.where(upd, sad, best_sad)
        best_q = jnp.where(upd[..., None], jnp.stack([qx, qy]), best_q)
        best_sq = jnp.where(upd[..., None, None], diff * diff, best_sq)
        best_pred = jnp.where(upd[..., None, None], pred, best_pred)
        return (best_sad, best_q, best_sq, best_pred), None

    init = (jnp.full((nby, nbx), jnp.int32(1 << 30)),
            jnp.zeros((nby, nbx, 2), jnp.int32),
            jnp.zeros_like(cur16), jnp.zeros_like(cur16))
    (best_sad, best_q, best_sq, best_pred), _ = jax.lax.scan(
        step, init, tbl)
    return best_q, best_sad, best_sq, best_pred


def eval_qpel_target(target, vw, rng: int = 8, lo: int = 3, origin: int = 7):
    """eval_qpel against an arbitrary f32 target (bi refinement: target =
    2*cur - pred0, analyze_bi analog xeve_pinter.c:1567).  Returns best_q
    only."""
    nby, nbx = target.shape[:2]
    tbl = jnp.stack(_cand_table(rng, lo, origin), axis=1)

    def step(carry, row):
        best_cost, best_q = carry
        qx, qy, pidx, r0, c0 = row[0], row[1], row[2], row[3], row[4]
        pred = jax.lax.dynamic_slice(
            vw, (0, 0, pidx, r0, c0), (nby, nbx, 1, 16, 16))[:, :, 0] \
            .astype(jnp.float32)
        cost = jnp.abs(target - pred).sum(axis=(-1, -2))
        upd = cost < best_cost
        best_cost = jnp.where(upd, cost, best_cost)
        best_q = jnp.where(upd[..., None], jnp.stack([qx, qy]), best_q)
        return (best_cost, best_q), None

    init = (jnp.full((nby, nbx), jnp.inf, jnp.float32),
            jnp.zeros((nby, nbx, 2), jnp.int32))
    (_, best_q), _ = jax.lax.scan(step, init, tbl)
    return best_q


# ---------------------------------------------------------------------------
# per-block-tap MC (large-CU re-search around the children median)
# ---------------------------------------------------------------------------


def perblock_mc(Wext, q_rel_x, q_rel_y, s: int, bd: int):
    """Exact-shape separable MC with per-block qpel remainders q_rel in
    [-4, 7] (int offset q>>2 in {-1,0,1} + phase q&3).  Wext: (nby, nbx,
    s+12, s+12) int32 with the output block origin at row/col 5 (so
    Wext[..., 5 + x, 5 + y] is the integer-grid sample at block position
    (x, y) for the base MV).  T12 places the 8-tap phase filter MC_L[q&3]
    at t = 2 + (q>>2) + j, so out[r] = sum_t taps[t] * Wext[r + t] with no
    further origin shift.  Returns (nby, nbx, s, s) int32 prediction
    (generic two-stage path for all phases — analysis cost only, <=1 LSB
    from the single-direction exact path)."""
    mx = (1 << bd) - 1
    shift1 = min(4, bd - 8)
    shift2 = max(8, 20 - bd)
    off2 = 1 << (shift2 - 1)
    t12 = jnp.asarray(_T12)
    ohx = (q_rel_x[..., None] + 4 == jnp.arange(12)).astype(jnp.int32)
    ohy = (q_rel_y[..., None] + 4 == jnp.arange(12)).astype(jnp.int32)
    tx = jnp.einsum('ijq,qt->ijt', ohx, t12)
    ty = jnp.einsum('ijq,qt->ijt', ohy, t12)
    # horizontal over ALL rows (the v-stage needs rows [0, s+11)), then
    # int16 truncation, then vertical
    tmp = None
    for t in range(12):
        sl = jax.lax.slice_in_dim(Wext, t, t + s, axis=-1)
        term = tx[..., None, None, t] * sl
        tmp = term if tmp is None else tmp + term
    tmp = (tmp >> shift1).astype(jnp.int16).astype(jnp.int32)
    out = None
    for t in range(12):
        sl = jax.lax.slice_in_dim(tmp, t, t + s, axis=-2)
        term = ty[..., None, None, t] * sl
        out = term if out is None else out + term
    return jnp.clip((out + off2) >> shift2, 0, mx)
