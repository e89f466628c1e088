"""SBAC syntax writer for Baseline (mirror of dec/decoder.py parsing).

Reference semantics: src_base/xeve_eco.c:674-1654 and xeve_enc.c:35-101.
"""
from __future__ import annotations

import numpy as np

from ..constants import SCAN, MPM_TBL, MIN_CU_LOG2
from ..entropy.sbac import SbacEncoder, SbacCtx


def write_split_flag(sbac: SbacEncoder, ctx: SbacCtx, split: int):
    sbac.encode_bin(1 if split else 0, ctx.split_cu_flag, 0)


def write_intra_dir(sbac: SbacEncoder, ctx: SbacCtx, rank: int):
    sbac.write_unary_sym(rank, ctx.intra_dir, 0, 2)


def write_cbf_intra(sbac: SbacEncoder, ctx: SbacCtx, cbf_y, cbf_u, cbf_v):
    sbac.encode_bin(cbf_u, ctx.cbf_cb, 0)
    sbac.encode_bin(cbf_v, ctx.cbf_cr, 0)
    sbac.encode_bin(cbf_y, ctx.cbf_luma, 0)


def write_dqp(sbac: SbacEncoder, ctx: SbacCtx, dqp: int):
    abs_dqp = abs(dqp)
    sbac.write_unary_sym(abs_dqp, ctx.delta_qp, 0, 1)
    if abs_dqp > 0:
        sbac.encode_bin_ep(1 if dqp < 0 else 0)


def write_coef_block(sbac: SbacEncoder, ctx: SbacCtx, coef: np.ndarray,
                     ch_type: int):
    """xeve_eco_run_length_cc (xeve_eco.c:707), sps_cm_init_flag == 0."""
    h, w = coef.shape
    flat = coef.reshape(-1)
    scan = SCAN[(w, h)]
    num_coeff = w * h
    scanned = flat[scan]
    sig_positions = np.nonzero(scanned)[0]
    num_sig = len(sig_positions)
    assert num_sig > 0
    t0 = 0 if ch_type == 0 else 2
    ctx_last = 0 if ch_type == 0 else 1
    run = 0
    prev = -1
    for k, pos in enumerate(sig_positions):
        run = int(pos) - prev - 1
        prev = int(pos)
        level = int(scanned[pos])
        sbac.write_unary_sym(run, ctx.run, t0, 2)
        sbac.write_unary_sym(abs(level) - 1, ctx.level, t0, 2)
        sbac.encode_bin_ep(1 if level < 0 else 0)
        if pos == num_coeff - 1:
            break
        last = 1 if k == num_sig - 1 else 0
        sbac.encode_bin(last, ctx.last, ctx_last)
        if last:
            break


def mpm_rank_table(map_cod, map_if, map_ipm, x_scu: int, y_scu: int):
    """Return the rank table (ipm -> rank) for a CU at (x_scu, y_scu),
    following xeve_get_mpm (xeve_ipred.c:230)."""
    ipm_l = 0
    ipm_u = 0
    if x_scu > 0 and map_if[y_scu, x_scu - 1] and map_cod[y_scu, x_scu - 1]:
        ipm_l = int(map_ipm[y_scu, x_scu - 1]) + 1
    if y_scu > 0 and map_if[y_scu - 1, x_scu] and map_cod[y_scu - 1, x_scu]:
        ipm_u = int(map_ipm[y_scu - 1, x_scu]) + 1
    return MPM_TBL[ipm_l, ipm_u]
