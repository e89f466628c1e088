"""Closed-loop intra frame coding pass.

Takes the open-loop analysis decisions (partition + per-CU intra mode),
walks the CTU quadtrees in z-order, and for each leaf CU performs the exact
closed-loop reconstruction (neighbour gather from recon, prediction,
residual, DCT, RDOQ, dequant, inverse, recon) while driving the SBAC syntax
writer.  This mirrors the reference's serial pass-2 (xeve_enc.c:416-596) —
by construction its output bitstream decodes to exactly the recon it keeps.

A C implementation of this pass lives in xeve_tpu/native for speed; this
numpy version is the oracle.
"""
from __future__ import annotations

import numpy as np

from ..constants import (MIN_CU_LOG2, MIN_CU_SIZE, SLICE_I,
                         chroma_qp_dynamic)
from ..entropy.sbac import SbacEncoder, SbacCtx
from ..ops import reference_kernels as rk
from ..ops.intra_np import gather_nb
from ..ops.deblock_np import deblock_frame
from . import syntax
from .rdoq import rdoq_block, bit_est_tables
from .analysis_np import AnalysisResult


class IntraFramePass:
    def __init__(self, w, h, bd, bd_chroma_minus8, qp, qp_u_off, qp_v_off,
                 use_rdoq=True, use_deblock=True):
        self.w, self.h, self.bd = w, h, bd
        self.bdc8 = bd_chroma_minus8
        self.qp = qp
        self.qp_u_off, self.qp_v_off = qp_u_off, qp_v_off
        self.qp_y = qp + 6 * (bd - 8)
        qpu_i = int(np.clip(qp + qp_u_off, -6 * bd_chroma_minus8, 57))
        qpv_i = int(np.clip(qp + qp_v_off, -6 * bd_chroma_minus8, 57))
        self.qp_u = chroma_qp_dynamic(qpu_i) + 6 * bd_chroma_minus8
        self.qp_v = chroma_qp_dynamic(qpv_i) + 6 * bd_chroma_minus8
        self.lam = 0.57 * 2.0 ** ((qp - 12) / 3.0)
        self.lam_u = self.lam / (2.0 ** ((self.qp_y - self.qp_u) / 3.0))
        self.lam_v = self.lam / (2.0 ** ((self.qp_y - self.qp_v) / 3.0))
        self.use_rdoq = use_rdoq
        self.use_deblock = use_deblock
        self.w_scu = (w + MIN_CU_SIZE - 1) >> MIN_CU_LOG2
        self.h_scu = (h + MIN_CU_SIZE - 1) >> MIN_CU_LOG2
        self.w_lcu = (w + 63) >> 6
        self.h_lcu = (h + 63) >> 6

    def encode(self, orig_y, orig_u, orig_v, analysis: AnalysisResult,
               sbac: SbacEncoder, ctx: SbacCtx):
        """Codes all CTUs of the slice; returns (rec_y, rec_u, rec_v,
        leaf_cus) with recon already deblocked if enabled."""
        w, h, bd = self.w, self.h, self.bd
        mid = 1 << (bd - 1)
        self.orig_y, self.orig_u, self.orig_v = orig_y, orig_u, orig_v
        self.rec_y = np.full((h, w), mid, dtype=np.int32)
        self.rec_u = np.full((h >> 1, w >> 1), mid, dtype=np.int32)
        self.rec_v = np.full((h >> 1, w >> 1), mid, dtype=np.int32)
        self.map_cod = np.zeros((self.h_scu, self.w_scu), dtype=bool)
        self.map_if = np.zeros((self.h_scu, self.w_scu), dtype=bool)
        self.map_ipm = np.full((self.h_scu, self.w_scu), -1, dtype=np.int32)
        self.map_qp = np.full((self.h_scu, self.w_scu), self.qp, dtype=np.int32)
        self.map_cbf_l = np.zeros((self.h_scu, self.w_scu), dtype=bool)
        self.leaf_cus = []
        self.an = analysis
        self.sbac = sbac
        self.ctx = ctx

        for ly in range(self.h_lcu):
            for lx in range(self.w_lcu):
                self.est = bit_est_tables(ctx)  # per-LCU RDOQ estimates
                self._code_tree(lx << 6, ly << 6, 6)
        sbac.encode_bin_trm(1)

        if self.use_deblock:
            deblock_frame(self.rec_y, self.rec_u, self.rec_v, self.leaf_cus,
                          self.map_if, self.map_cbf_l, self.map_qp,
                          self.qp_u_off, self.qp_v_off, bd, self.bdc8)
        return self.rec_y, self.rec_u, self.rec_v, self.leaf_cus

    # ------------------------------------------------------------------
    def _code_tree(self, x, y, lg):
        s = 1 << lg
        boundary = (x + s > self.w) or (y + s > self.h)
        if boundary:
            split = True
        elif lg == 2:
            split = False
        else:
            by, bx = y >> lg, x >> lg
            split = bool(self.an.split[lg][by, bx]) if lg in self.an.split else False
        # split flag coded unless CU is 4x4 (both dims < 8)
        if s >= 8:
            syntax.write_split_flag(self.sbac, self.ctx, 1 if split else 0)
        if split:
            half = s >> 1
            for (dx, dy) in ((0, 0), (half, 0), (0, half), (half, half)):
                xp, yp = x + dx, y + dy
                if xp < self.w and yp < self.h:
                    self._code_tree(xp, yp, lg - 1)
        else:
            self._code_cu(x, y, lg)

    def _code_cu(self, x, y, lg):
        s = 1 << lg
        bd = self.bd
        x_scu, y_scu = x >> MIN_CU_LOG2, y >> MIN_CU_LOG2
        ipm = int(self.an.mode[lg][y >> lg, x >> lg])

        # --- luma closed loop ---
        up, left, ul = gather_nb(self.rec_y, self.map_cod, x, y, s, s,
                                 x_scu, y_scu, MIN_CU_SIZE,
                                 self.w_scu, self.h_scu, bd)
        pred_y = rk.ipred(ipm, up, left, ul, s, s)
        resi = self.orig_y[y:y + s, x:x + s].astype(np.int32) - pred_y
        coef_y = rk.forward_dct2(resi, bd)
        if self.use_rdoq:
            lev_y, nnz_y = rdoq_block(coef_y, self.qp_y, self.lam, SLICE_I, 0,
                                      True, bd, self.est)
        else:
            lev_y, nnz_y = rk.quant(coef_y, self.qp_y, SLICE_I, bd)
        if nnz_y:
            resi_rec = rk.inverse_dct2(rk.dequant(lev_y, self.qp_y, bd), bd)
            self.rec_y[y:y + s, x:x + s] = rk.recon_block(pred_y, resi_rec, bd)
        else:
            self.rec_y[y:y + s, x:x + s] = rk.recon_block(pred_y, None, bd)

        # --- chroma closed loop ---
        xc, yc, sc = x >> 1, y >> 1, s >> 1
        out_c = []
        for (plane, orig, qp_c, lam_c, ch) in (
                (self.rec_u, self.orig_u, self.qp_u, self.lam_u, 1),
                (self.rec_v, self.orig_v, self.qp_v, self.lam_v, 2)):
            up, left, ul = gather_nb(plane, self.map_cod, xc, yc, sc, sc,
                                     x_scu, y_scu, MIN_CU_SIZE >> 1,
                                     self.w_scu, self.h_scu, bd)
            pred = rk.ipred(ipm, up, left, ul, sc, sc)
            resi = orig[yc:yc + sc, xc:xc + sc].astype(np.int32) - pred
            coef = rk.forward_dct2(resi, bd)
            if self.use_rdoq:
                lev, nnz = rdoq_block(coef, qp_c, lam_c, SLICE_I, ch,
                                      True, bd, self.est)
            else:
                lev, nnz = rk.quant(coef, qp_c, SLICE_I, bd)
            if nnz:
                rr = rk.inverse_dct2(rk.dequant(lev, qp_c, bd), bd)
                plane[yc:yc + sc, xc:xc + sc] = rk.recon_block(pred, rr, bd)
            else:
                plane[yc:yc + sc, xc:xc + sc] = rk.recon_block(pred, None, bd)
            out_c.append((lev, nnz))

        (lev_u, nnz_u), (lev_v, nnz_v) = out_c

        # --- syntax ---
        rank_tbl = syntax.mpm_rank_table(self.map_cod, self.map_if,
                                         self.map_ipm, x_scu, y_scu)
        syntax.write_intra_dir(self.sbac, self.ctx, int(rank_tbl[ipm]))
        syntax.write_cbf_intra(self.sbac, self.ctx,
                               1 if nnz_y else 0, 1 if nnz_u else 0,
                               1 if nnz_v else 0)
        if nnz_y:
            syntax.write_coef_block(self.sbac, self.ctx, lev_y, 0)
        if nnz_u:
            syntax.write_coef_block(self.sbac, self.ctx, lev_u, 1)
        if nnz_v:
            syntax.write_coef_block(self.sbac, self.ctx, lev_v, 1)

        # --- maps ---
        hs = ws = s >> MIN_CU_LOG2
        self.map_cod[y_scu:y_scu + hs, x_scu:x_scu + ws] = True
        self.map_if[y_scu:y_scu + hs, x_scu:x_scu + ws] = True
        self.map_ipm[y_scu:y_scu + hs, x_scu:x_scu + ws] = ipm
        self.map_cbf_l[y_scu:y_scu + hs, x_scu:x_scu + ws] = bool(nnz_y)
        self.leaf_cus.append((x, y, s, s))
