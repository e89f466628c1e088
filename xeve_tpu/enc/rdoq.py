"""Rate-distortion optimized quantization (run-length), exact semantics of
xeve_rdoq_run_length_cc (src_base/xeve_tq.c:497-649) with context-state
derived bit estimates (src_base/xeve_mode.c:304-373).
"""
from __future__ import annotations

import numpy as np

from ..constants import (SCAN, QUANT_SCALE, MAX_TX_DYNAMIC_RANGE, QUANT_SHIFT,
                         SLICE_I)
from ..entropy.sbac import SbacCtx

SCALE_BITS = 15
ERR_SCALE_PRECISION_BITS = 20
GET_IEP_RATE = 32768

# entropy_bits table (xeve_mode.c:304)
_ENTROPY_BITS = np.empty(1024, dtype=np.int64)
for _i in range(1024):
    _p = (512 * (_i + 0.5)) / 1024
    _ENTROPY_BITS[_i] = int(-32768 * (np.log(_p) / np.log(2.0) - 9))


def biari_no_bits(symbol: int, model: int) -> int:
    mps = model & 1
    state = model >> 1
    state = state if (1 if symbol else 0) != mps else 512 - state
    return int(_ENTROPY_BITS[state << 1])


def bit_est_tables(ctx: SbacCtx):
    """Per-LCU refresh of RDOQ rate estimates from current context states."""
    est = {}
    est['cbf_luma'] = [biari_no_bits(b, ctx.cbf_luma[0]) for b in (0, 1)]
    est['cbf_cb'] = [biari_no_bits(b, ctx.cbf_cb[0]) for b in (0, 1)]
    est['cbf_cr'] = [biari_no_bits(b, ctx.cbf_cr[0]) for b in (0, 1)]
    est['cbf_all'] = [biari_no_bits(b, ctx.cbf_all[0]) for b in (0, 1)]
    est['run'] = [[biari_no_bits(b, m) for b in (0, 1)] for m in ctx.run]
    est['level'] = [[biari_no_bits(b, m) for b in (0, 1)] for m in ctx.level]
    est['last'] = [[biari_no_bits(b, m) for b in (0, 1)] for m in ctx.last]
    return est


def err_scale(qp_rem: int, log2_size: int, bit_depth: int, tool_iqt: int = 0) -> int:
    """xeve_init_err_scale (xeve_tq.c:406); log2_size in 1..7."""
    q_value = int(QUANT_SCALE[tool_iqt][qp_rem])
    tr_shift = MAX_TX_DYNAMIC_RANGE - bit_depth - log2_size
    es = float(1 << SCALE_BITS) * (2.0 ** (-tr_shift))
    es = es / q_value / (1 << (bit_depth - 8))
    return int(es * float(1 << ERR_SCALE_PRECISION_BITS))


def _rate_cost(abs_level, run, ctx_run, ctx_level, lam, est):
    if abs_level == 0:
        rate = est['run'][ctx_run if run == 0 else ctx_run + 1][1]
    else:
        rate = GET_IEP_RATE
        rate += est['run'][ctx_run if run == 0 else ctx_run + 1][0]
        if abs_level == 1:
            rate += est['level'][ctx_level][0]
        else:
            rate += est['level'][ctx_level][1]
            rate += est['level'][ctx_level + 1][1] * (abs_level - 2)
            rate += est['level'][ctx_level + 1][0]
    return rate * lam


def rdoq_block(coef: np.ndarray, qp: int, lam_f: float, slice_type: int,
               ch_type: int, is_intra: bool, bit_depth: int, est,
               tool_iqt: int = 0):
    """Exact RDOQ for one transform block.  Returns (levels, nnz)."""
    h, w = coef.shape
    log2_w, log2_h = w.bit_length() - 1, h.bit_length() - 1
    qp_rem = qp % 6
    ns_shift = 7 if (log2_w + log2_h) & 1 else 0
    ns_scale = 181 if (log2_w + log2_h) & 1 else 1
    ns_offset = (1 << (ns_shift - 1)) if ns_shift else 0
    q_value = (int(QUANT_SCALE[tool_iqt][qp_rem]) * ns_scale + ns_offset) >> ns_shift
    log2_size = (log2_w + log2_h) >> 1
    tr_shift = MAX_TX_DYNAMIC_RANGE - bit_depth - log2_size
    q_bits = QUANT_SHIFT + tr_shift + qp // 6
    lam = int(lam_f * (1 << SCALE_BITS) + 0.5)
    es = err_scale(qp_rem, log2_size, bit_depth, tool_iqt)
    scan = SCAN[(w, h)]
    flat = coef.reshape(-1).astype(np.int64)
    num = w * h

    # fast zero-block check (xeve_quant_nnz rdoq pre-check, xeve_tq.c:666)
    offset_fast = (201 if slice_type == SLICE_I else 153) << (q_bits + ns_shift - 9)
    thr = (1 << (q_bits + ns_shift)) - offset_fast
    lev_all = np.abs(flat) * int(QUANT_SCALE[tool_iqt][qp_rem]) * ns_scale
    if not (lev_all >= thr).any():
        return np.zeros((h, w), dtype=np.int32), 0

    # per-coefficient quantization bounds
    level_double = np.minimum(np.abs(flat) * q_value,
                              (2 ** 31 - 1) - (1 << (q_bits - 1)))
    max_abs = (level_double >> q_bits).astype(np.int64)
    lower = (level_double - (max_abs << q_bits)) < (1 << (q_bits - 1))
    max_abs = np.where(lower, max_abs, max_abs + 1)

    err0 = (level_double * es) >> ERR_SCALE_PRECISION_BITS
    block_uncoded_cost = int((err0 * err0).sum())

    if not is_intra and ch_type == 0:
        best_cost = block_uncoded_cost + est['cbf_all'][0] * lam
        base_cost = block_uncoded_cost + est['cbf_all'][1] * lam
    else:
        key = ('cbf_luma', 'cbf_cb', 'cbf_cr')[ch_type]
        best_cost = block_uncoded_cost + est[key][0] * lam
        base_cost = block_uncoded_cost + est[key][1] * lam

    ctx_rl = 0 if ch_type == 0 else 2
    ctx_last = 0 if ch_type == 0 else 1
    cost_last0 = est['last'][ctx_last][0] * lam
    cost_last1 = est['last'][ctx_last][1] * lam

    levels = np.zeros(num, dtype=np.int64)
    run = 0
    best_last_p1 = 0
    ld_s = level_double[scan]
    ma_s = max_abs[scan]
    sgn_s = flat[scan] < 0
    for sp in range(num):
        ld = int(ld_s[sp])
        ma = int(ma_s[sp])
        # get_coded_level_rl (xeve_tq.c:458): uncoded = err1^2 (distortion
        # only); coded starts at uncoded + rate(level 0) and is minimized
        # over {max_abs, max_abs-1}
        err1 = (ld * es) >> ERR_SCALE_PRECISION_BITS
        uncoded = err1 * err1
        best_lvl, coded = 0, uncoded + _rate_cost(0, run, ctx_rl, ctx_rl, lam, est)
        mn = ma - 1 if ma > 1 else 1
        for lvl in range(ma, mn - 1, -1):
            delta = ld - (lvl << q_bits)
            err = (delta * es) >> ERR_SCALE_PRECISION_BITS
            c = err * err + _rate_cost(lvl, run, ctx_rl, ctx_rl, lam, est)
            if c < coded:
                best_lvl, coded = lvl, c
        base_cost += coded - uncoded
        levels[sp] = best_lvl
        if best_lvl:
            cur_last_cost = base_cost + cost_last1
            base_cost += cost_last0
            if cur_last_cost < best_cost:
                best_cost = cur_last_cost
                best_last_p1 = sp + 1
            run = 0
        else:
            run += 1

    levels[best_last_p1:] = 0
    out = np.zeros(num, dtype=np.int32)
    signed = np.where(sgn_s, -levels, levels)
    out[scan] = signed
    nnz = int(np.count_nonzero(levels[:best_last_p1]))
    return out.reshape(h, w), nnz
