"""Fused single-dispatch device analyzer (TPU) with a device-resident
original-frame ring.

Redesign of the per-frame analysis stage around the measured cost model of
a remote-attached TPU: host<->device round-trips (~25 ms each) and link
bandwidth dominate, device FLOPs are nearly free.  Consequences:

  - every original frame is uploaded ONCE (int16) and kept in a device
    ring keyed by POC; motion estimation runs against *original* frames
    (the reference's lookahead does the same at half resolution,
    xeve_fcst.c:1000) so analysis never depends on reconstructed pixels
    and can run arbitrarily far ahead of the closed-loop coding pass,
  - one fused jit per frame computes the intra level costs, dense ME +
    quarter-pel refinement + per-level inter costs, and the partition DP
    ON DEVICE (SURVEY.md section 7.1 batch-everything),
  - exactly ONE device->host transfer per frame: a small packed int16
    decision vector (modes, splits, 16x16 MV field).

The closed-loop native coding pass (native/xt_core.c) re-evaluates
skip/direct/inter/intra with exact integer costs against the true
reconstructed references, so analysis-side approximations (open-loop ME,
f32 cost model) affect quality only, never conformance.

Reference counterparts: xeve_pinter.c:699 (EPZS ME), xeve_mode.c:2007
(recursive RDO tree) — both re-expressed as dense batched tensor work.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .analysis_jax import _level_cost_impl, level_params
from .analysis_inter_jax import (_phase_planes, _gather_blocks, _cur_blocks,
                                 _subpel_refine, _mvd_bits)
from .me_jax import _me_int_jit
from .analysis_inter_np import InterAnalysisResult, ME_BLK_LOG2
from .analysis_np import corrected_leaf, AnalysisResult

PAD = 64 + 16   # matches api.py DPB padding (PIC_PAD_SIZE_L)


def _ceil_div(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# shared (device + host twin) per-level MV derivation from the padded
# 16x16 MV field.  mv16c covers the CEIL grid (edge-replicated), so every
# level's map is fully defined even for non-16-multiple frame sizes.
# ---------------------------------------------------------------------------


def _mv_for_level_dev(mv16c, lg, nby, nbx):
    if lg <= ME_BLK_LOG2:
        f = 1 << (ME_BLK_LOG2 - lg)
        return jnp.repeat(jnp.repeat(mv16c, f, axis=0), f,
                          axis=1)[:nby, :nbx]
    f = 1 << (lg - ME_BLK_LOG2)
    m = mv16c[:nby * f, :nbx * f].reshape(nby, f, nbx, f, 2)
    m = m.transpose(0, 2, 1, 3, 4).reshape(nby, nbx, f * f, 2)
    return jnp.median(m, axis=2).astype(jnp.int32)


def _mv_for_level_np(mv16c, lg, nby, nbx):
    if lg <= ME_BLK_LOG2:
        f = 1 << (ME_BLK_LOG2 - lg)
        return np.repeat(np.repeat(mv16c, f, axis=0), f, axis=1)[:nby, :nbx]
    f = 1 << (lg - ME_BLK_LOG2)
    m = mv16c[:nby * f, :nbx * f].reshape(nby, f, nbx, f, 2)
    m = m.transpose(0, 2, 1, 3, 4).reshape(nby, nbx, f * f, 2)
    return np.median(m, axis=2).astype(np.int32)


# ---------------------------------------------------------------------------
# fused device graph
# ---------------------------------------------------------------------------


def _me_mv16c(y_i32, ref_y_pad, R, pad, h, w, bd):
    """Dense full-search + quarter-pel refinement against a padded original
    reference; returns the 16x16 qpel MV field edge-padded to the ceil grid
    plus the phase planes (reused by the cost stage)."""
    nby16, nbx16 = h // 16, w // 16
    hc, wc = nby16 * 16, nbx16 * 16
    refc = jax.lax.dynamic_slice(
        ref_y_pad, (0, 0), (2 * pad + hc, 2 * pad + wc)).astype(jnp.float32)
    int_mv, _ = _me_int_jit(y_i32[:hc, :wc].astype(jnp.float32), refc, R, pad)
    planes = _phase_planes(ref_y_pad, bd)
    cur16 = _cur_blocks(y_i32, 16)
    mv16 = _subpel_refine(cur16, planes, int_mv, pad)
    py = _ceil_div(h, 16) - nby16
    px = _ceil_div(w, 16) - nbx16
    mv16c = jnp.pad(mv16, ((0, py), (0, px), (0, 0)), mode="edge")
    return mv16c, planes


def _inter_level_costs(y_i32, u_i32, v_i32, planes, ref_u_pad, ref_v_pad,
                       mv16c, prm3, pad, min_log2, max_log2, h, w):
    """Per-level inter cost maps from the phase planes (same cost model as
    analysis_inter_jax._inter_costs_jit)."""
    lam, w_u, w_v = prm3[0], prm3[1], prm3[2]
    costs = {}
    for lg in range(min_log2, max_log2 + 1):
        s = 1 << lg
        nby, nbx = h // s, w // s
        mv_l = _mv_for_level_dev(mv16c, lg, nby, nbx)
        g = _gather_blocks(planes, mv_l, s, pad, nby, nbx)
        cb = _cur_blocks(y_i32, s)[:nby, :nbx]
        d = ((cb - g) ** 2).sum(axis=(-1, -2)).astype(jnp.float32)
        sc = s >> 1
        ivc = (mv_l + 4) >> 3
        mvc = ivc << 2
        gu = _gather_blocks(ref_u_pad.astype(jnp.int16)[None], mvc, sc,
                            pad // 2, nby, nbx)
        gv = _gather_blocks(ref_v_pad.astype(jnp.int16)[None], mvc, sc,
                            pad // 2, nby, nbx)
        cu = _cur_blocks(u_i32, sc)[:nby, :nbx]
        cv = _cur_blocks(v_i32, sc)[:nby, :nbx]
        du = ((cu - gu) ** 2).sum(axis=(-1, -2)).astype(jnp.float32)
        dv = ((cv - gv) ** 2).sum(axis=(-1, -2)).astype(jnp.float32)
        dall = d + w_u * du + w_v * dv
        bits = 8.0 + _mvd_bits(mv_l).astype(jnp.float32)
        costs[lg] = jnp.minimum(
            dall + lam * 4.0,
            0.35 * dall + lam * (bits + 0.02 * jnp.sqrt(dall) * s))
    return costs


def _partition_dp_dev(leaf_cost, lam, h, w, min_log2, max_log2):
    split = {min_log2: jnp.zeros_like(leaf_cost[min_log2], dtype=jnp.int16)}
    tree = corrected_leaf(min_log2, leaf_cost[min_log2])
    for lg in range(min_log2 + 1, max_log2 + 1):
        s = 1 << lg
        nby, nbx = leaf_cost[lg].shape
        ch = tree[:nby * 2, :nbx * 2]
        sum4 = ch[0::2, 0::2] + ch[0::2, 1::2] + ch[1::2, 0::2] + ch[1::2, 1::2]
        ys = (np.arange(nby) + 1) * s
        xs = (np.arange(nbx) + 1) * s
        valid = jnp.asarray((ys[:, None] <= h) & (xs[None, :] <= w))
        leafc = jnp.where(valid, corrected_leaf(lg, leaf_cost[lg]), jnp.inf)
        sp = sum4 + lam < leafc
        split[lg] = sp.astype(jnp.int16)
        tree = jnp.where(sp, sum4 + lam, leafc)
    return split


def _bi_refine(y_i32, planes0, planes1, mv0c, mv1c, pad, h, w, R):
    """Joint bi-prediction refinement of the L1 MV plane given the L0 plane
    (analyze_bi analog, xeve_pinter.c:1567): minimize |2*cur − pred0 −
    pred1(mv1+d)| over a coarse-then-fine qpel offset grid.  Returns the
    refined 16x16 L1 MV plane (ceil grid)."""
    nby, nbx = h // 16, w // 16
    cur = _cur_blocks(y_i32, 16)[:nby, :nbx].astype(jnp.float32)
    mv0 = mv0c[:nby, :nbx]
    mv1 = mv1c[:nby, :nbx]
    p0 = _gather_blocks(planes0, mv0, 16, pad, nby, nbx).astype(jnp.float32)
    tgt = 2.0 * cur - p0
    lim = 4 * (R + 2)

    def refine_pass(mv_cur, offs):
        cands, costs = [], []
        for dy in offs:
            for dx in offs:
                cand = jnp.clip(mv_cur + jnp.array([dx, dy], jnp.int32),
                                -lim, lim)
                p1 = _gather_blocks(planes1, cand, 16, pad, nby,
                                    nbx).astype(jnp.float32)
                cands.append(cand)
                costs.append(((tgt - p1) ** 2).sum(axis=(-1, -2)))
        cost = jnp.stack(costs)                     # (n_cand, nby, nbx)
        best = jnp.argmin(cost, axis=0)             # (nby, nbx)
        cand = jnp.stack(cands)                     # (n_cand, nby, nbx, 2)
        return jnp.take_along_axis(
            cand, best[None, :, :, None], axis=0)[0]

    mv_r = refine_pass(mv1, (-8, -4, 0, 4, 8))
    mv_r = refine_pass(mv_r, (-2, -1, 0, 1, 2))
    py = _ceil_div(h, 16) - nby
    px = _ceil_div(w, 16) - nbx
    return jnp.pad(mv_r, ((0, py), (0, px), (0, 0)), mode="edge")


def _fused_impl(y16, u16, v16, ref0, ref0b, ref1, ref1b, prms, prm3, *,
                bd, R, pad, min_log2, max_log2, refine):
    """refs: (y16,u16,v16) originals or None — ref0/ref0b are L0 refi 0/1,
    ref1/ref1b are L1 refi 0/1 (multi-ref per xeve_picman.c:271 lists).
    prms: (n_levels, 15) per-level quant params; prm3: (3,) lam/w_u/w_v.
    Returns one packed int16 vector: mode/split per level, then the 16x16
    qpel MV planes for each present ref in order [L0r0, L0r1, L1r0, L1r1,
    bi-refined L1]."""
    h, w = y16.shape
    yf = y16.astype(jnp.float32)
    uf = u16.astype(jnp.float32)
    vf = v16.astype(jnp.float32)
    y_i32 = y16.astype(jnp.int32)
    u_i32 = u16.astype(jnp.int32)
    v_i32 = v16.astype(jnp.int32)
    lam = prm3[0]

    mode, leaf = {}, {}
    for i, lg in enumerate(range(min_log2, max_log2 + 1)):
        m, c = _level_cost_impl(yf, uf, vf, prms[i], bd, lg)
        mode[lg] = m
        leaf[lg] = c

    mv16c = mv16c_0b = mv16c_1 = mv16c_1b = mv16c_bi = None
    planes0 = planes1 = None
    if ref0 is not None:
        ry = jnp.pad(ref0[0].astype(jnp.int32), pad, mode="edge")
        ru = jnp.pad(ref0[1].astype(jnp.int32), pad // 2, mode="edge")
        rv = jnp.pad(ref0[2].astype(jnp.int32), pad // 2, mode="edge")
        mv16c, planes0 = _me_mv16c(y_i32, ry, R, pad, h, w, bd)
        icosts = _inter_level_costs(y_i32, u_i32, v_i32, planes0, ru, rv,
                                    mv16c, prm3, pad, min_log2, max_log2,
                                    h, w)
        for lg in leaf:
            leaf[lg] = jnp.minimum(leaf[lg], icosts[lg])
    if ref0b is not None:
        ryb = jnp.pad(ref0b[0].astype(jnp.int32), pad, mode="edge")
        mv16c_0b, _ = _me_mv16c(y_i32, ryb, R, pad, h, w, bd)
    if ref1 is not None:
        ry1 = jnp.pad(ref1[0].astype(jnp.int32), pad, mode="edge")
        mv16c_1, planes1 = _me_mv16c(y_i32, ry1, R, pad, h, w, bd)
    if ref1b is not None:
        ry1b = jnp.pad(ref1b[0].astype(jnp.int32), pad, mode="edge")
        mv16c_1b, _ = _me_mv16c(y_i32, ry1b, R, pad, h, w, bd)
    if refine and ref0 is not None and ref1 is not None:
        mv16c_bi = _bi_refine(y_i32, planes0, planes1, mv16c, mv16c_1,
                              pad, h, w, R)

    split = _partition_dp_dev(leaf, lam, h, w, min_log2, max_log2)

    parts = []
    for lg in range(min_log2, max_log2 + 1):
        parts.append(mode[lg].astype(jnp.int16).reshape(-1))
        parts.append(split[lg].reshape(-1))
    for m in (mv16c, mv16c_0b, mv16c_1, mv16c_1b, mv16c_bi):
        if m is not None:
            parts.append(m.astype(jnp.int16).reshape(-1))
    # RC complexity: total best-mode cost at the 16x16 level, packed as
    # two int16 halves of a >>16-scaled int32 — the one scalar the
    # frame-level rate model consumes (replaces the host Hadamard proxy)
    rci = jnp.clip(leaf[4].sum() / 65536.0, 0, 2.0 ** 30).astype(jnp.int32)
    parts.append(jnp.stack([(rci >> 15).astype(jnp.int16),
                            (rci & 0x7fff).astype(jnp.int16)]))
    return jnp.concatenate(parts)


_fused_jit = jax.jit(_fused_impl,
                     static_argnames=("bd", "R", "pad", "min_log2",
                                      "max_log2", "refine"))


# ---------------------------------------------------------------------------
# host-side driver
# ---------------------------------------------------------------------------


class _Handle:
    """kind: 'I' | 'P' | 'B' (legacy) — or pass `planes`, a 5-tuple of
    bools (L0r0, L0r1, L1r0, L1r1, bi-refined) saying which MV planes the
    packed vector carries.  `args` keeps the dispatch arguments for
    failure recovery (re-dispatch / host fallback)."""
    __slots__ = ("vec", "kind", "h", "w", "min_log2", "max_log2", "planes",
                 "args")

    def __init__(self, vec, kind, h, w, min_log2, max_log2, planes=None,
                 args=None):
        self.vec = vec
        self.kind = kind
        self.h, self.w = h, w
        self.min_log2, self.max_log2 = min_log2, max_log2
        if planes is None:
            planes = {"I": (False,) * 5,
                      "P": (True, False, False, False, False),
                      "B": (True, False, True, False, False)}[kind]
        self.planes = planes
        self.args = args


class DeviceAnalyzer:
    """Original-frame ring + fused per-frame analysis dispatch.

    dispatch() is asynchronous (returns a handle immediately; the device
    computes in the background); collect() blocks on the single packed
    transfer and materializes the decision maps."""

    def __init__(self, w: int, h: int, bd: int = 10, search_range: int = 16,
                 min_log2: int = 2, max_log2: int = 6, ring_size: int = 24):
        if bd not in (8, 10):
            raise ValueError("device analyzer supports 8/10-bit internal")
        self.w, self.h, self.bd = w, h, bd
        self.R = int(search_range)
        self.min_log2, self.max_log2 = min_log2, max_log2
        self.ring: dict[int, tuple] = {}
        self.host_ring: dict[int, tuple] = {}
        self.ring_size = ring_size
        self.failures = 0          # recovered device failures (telemetry)

    # -- frame ring ------------------------------------------------------
    def put_frame(self, poc: int, y, u, v):
        """Upload one original frame (async).  Arrays must be the aligned
        coded size.  A host-side copy is kept for failure recovery
        (SURVEY.md §5.3: the device can die mid-encode; analysis falls
        back to the numpy oracle from host originals)."""
        hy = np.asarray(y, np.int16)
        hu = np.asarray(u, np.int16)
        hv = np.asarray(v, np.int16)
        self.host_ring[poc] = (hy, hu, hv)
        self.ring[poc] = (jnp.asarray(hy), jnp.asarray(hu), jnp.asarray(hv))
        if len(self.ring) > self.ring_size:
            for k in sorted(self.ring)[:len(self.ring) - self.ring_size]:
                del self.ring[k]
                self.host_ring.pop(k, None)

    def has_frame(self, poc: int) -> bool:
        return poc in self.ring

    # -- analysis --------------------------------------------------------
    def dispatch(self, poc: int, qp: int, qp_y: int, qp_u: int, qp_v: int,
                 ref_poc: int | None = None,
                 ref1_poc: int | None = None,
                 ref0b_poc: int | None = None,
                 ref1b_poc: int | None = None,
                 bi_refine: bool = False) -> _Handle:
        """bi_refine is opt-in: the joint refinement adds a second full
        device pass worth of gathers (~1.5 s at 1080p on the measured
        remote TPU, doubling B-frame analysis) for a marginal BD gain —
        the closed-loop pass already evaluates the unrefined bi
        candidate."""
        y, u, v = self.ring[poc]
        kind = "I" if ref_poc is None else (
            "B" if (ref1_poc is not None and ref1_poc != ref_poc) else "P")
        prms = jnp.asarray(np.stack(
            [level_params(qp, qp_y, qp_u, qp_v, self.bd, lg)
             for lg in range(self.min_log2, self.max_log2 + 1)]))
        lam = 0.57 * 2.0 ** ((qp - 12) / 3.0)
        w_u = 2.0 ** ((qp_y - qp_u) / 3.0)
        w_v = 2.0 ** ((qp_y - qp_v) / 3.0)
        prm3 = jnp.asarray(np.array([lam, w_u, w_v], np.float32))
        ref0 = self.ring[ref_poc] if kind in ("P", "B") else None
        ref1 = self.ring[ref1_poc] if kind == "B" else None
        ref0b = (self.ring[ref0b_poc]
                 if (kind != "I" and ref0b_poc is not None
                     and ref0b_poc in self.ring) else None)
        ref1b = (self.ring[ref1b_poc]
                 if (kind == "B" and ref1b_poc is not None
                     and ref1b_poc in self.ring) else None)
        refine = bool(bi_refine and kind == "B")
        vec = _fused_jit(y, u, v, ref0, ref0b, ref1, ref1b, prms, prm3,
                         bd=self.bd, R=self.R, pad=PAD,
                         min_log2=self.min_log2, max_log2=self.max_log2,
                         refine=refine)
        planes = (ref0 is not None, ref0b is not None, ref1 is not None,
                  ref1b is not None, refine)
        return _Handle(vec, kind, self.h, self.w, self.min_log2,
                       self.max_log2, planes=planes,
                       args=(poc, qp, qp_y, qp_u, qp_v, ref_poc, ref1_poc,
                             ref0b_poc, ref1b_poc, bi_refine))

    # -- failure recovery (SURVEY.md §5.3) -------------------------------
    def _redispatch(self, hd: _Handle) -> _Handle:
        """Re-upload the involved originals from the host ring and re-run
        the dispatch (device restart / preemption recovery)."""
        poc, _, _, _, _, r0, r1, r0b, r1b, _ = hd.args
        for q in (poc, r0, r1, r0b, r1b):
            if q is not None and q in self.host_ring:
                y, u, v = self.host_ring[q]
                self.ring[q] = (jnp.asarray(y), jnp.asarray(u),
                                jnp.asarray(v))
        return self.dispatch(*hd.args)

    def _host_fallback(self, hd: _Handle):
        """Device unrecoverable: compute this frame's analysis with the
        numpy oracle from the host-side original ring so the encode
        continues CPU-only."""
        from .analysis_np import analyze_frame
        from .analysis_inter_np import analyze_frame_inter
        from ..ops import mc_np
        poc, qp, qp_y, qp_u, qp_v, r0, r1, r0b, r1b, _ = hd.args
        y, u, v = [np.asarray(p, np.int32) for p in self.host_ring[poc]]
        if r0 is None:
            return analyze_frame(y, u, v, qp, qp_y, qp_u, qp_v, self.bd,
                                 min_log2=self.min_log2)

        def ref(q):
            ry, ru, rv = self.host_ring[q]
            return {"poc": q,
                    "y_pad": mc_np.pad_picture(np.asarray(ry, np.int32),
                                               PAD),
                    "u_pad": mc_np.pad_picture(np.asarray(ru, np.int32),
                                               PAD // 2),
                    "v_pad": mc_np.pad_picture(np.asarray(rv, np.int32),
                                               PAD // 2)}
        refp = [ref(r0)] + ([ref(r0b)] if r0b is not None else [])
        refp1 = None
        if r1 is not None and r1 != r0:
            refp1 = [ref(r1)] + ([ref(r1b)] if r1b is not None else [])
        return analyze_frame_inter(y, u, v, refp, qp, qp_y, qp_u, qp_v,
                                   self.bd, search_range=self.R,
                                   refp1=refp1, min_log2=self.min_log2)

    def collect(self, hd: _Handle):
        """Block on the packed transfer; build the decision maps the coding
        pass consumes (split/mode per level, per-level MV maps).  On a
        device failure: one re-dispatch, then the numpy-oracle fallback —
        the encode never dies with the device."""
        try:
            vec = np.asarray(hd.vec)
        except Exception:
            self.failures += 1
            if hd.args is None:
                raise
            try:
                hd = self._redispatch(hd)
                vec = np.asarray(hd.vec)
            except Exception:
                return self._host_fallback(hd)
        return self._parse(hd, vec)

    def _parse(self, hd: _Handle, vec):
        h, w = hd.h, hd.w
        mode, split = {}, {}
        off = 0
        for lg in range(hd.min_log2, hd.max_log2 + 1):
            s = 1 << lg
            nby, nbx = h // s, w // s
            n = nby * nbx
            mode[lg] = vec[off:off + n].reshape(nby, nbx).astype(np.int32)
            off += n
            split[lg] = vec[off:off + n].reshape(nby, nbx).astype(bool)
            off += n
        if hd.kind == "I":
            rc = None
            if off + 2 <= len(vec):
                rc = float((int(vec[off]) << 15) | int(vec[off + 1])) * 65536.0
            return AnalysisResult(mode=mode, split=split, leaf_cost=None,
                                  tree_cost=None, rc_cost=rc)
        nby16c, nbx16c = _ceil_div(h, 16), _ceil_div(w, 16)
        n16 = nby16c * nbx16c * 2

        def next_plane():
            nonlocal off
            m16 = vec[off:off + n16].reshape(nby16c, nbx16c,
                                             2).astype(np.int32)
            off += n16
            maps = {}
            for lg in range(hd.min_log2, hd.max_log2 + 1):
                s = 1 << lg
                maps[lg] = _mv_for_level_np(m16, lg, h // s, w // s)
            return maps

        has0, has0b, has1, has1b, hasbi = hd.planes
        mv = next_plane() if has0 else None
        mv0b = next_plane() if has0b else None
        mv1 = next_plane() if has1 else None
        mv1b = next_plane() if has1b else None
        mvbi = next_plane() if hasbi else None

        def rc_cost():
            if off + 2 > len(vec):     # older packed vecs (meshed twin)
                return None
            hi, lo = int(vec[off]), int(vec[off + 1])
            return float((hi << 15) | lo) * 65536.0

        if hd.kind == "B" and mv1 is None:
            mv1 = {lg: mv[lg] for lg in mv}
        return InterAnalysisResult(mode=mode, split=split, leaf_cost=None,
                                   tree_cost=None, mv=mv, mv1=mv1,
                                   mv0b=mv0b, mv1b=mv1b, mvbi=mvbi,
                                   rc_cost=rc_cost())
