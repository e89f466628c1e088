"""Conformance decoder for EVC Baseline (all-intra subset first).

This decoder is the correctness oracle of the framework: it must decode both
our own bitstreams and the reference encoder's (xeve) bitstreams to the exact
reconstruction the encoder produced.  It is written for clarity (numpy +
Python), not speed.

Syntax/semantics derived from the reference encoder:
  - NAL/SPS/PPS/SH: src_base/xeve_eco.c:45-290
  - CTU tree + CU syntax: src_base/xeve_enc.c:35-101 (xeve_eco_tree),
    src_base/xeve_eco.c:1431-1654 (xeve_eco_unit)
  - coefficient run-length decode: src_base/xeve_eco.c:707-771
  - intra reconstruction: src_base/xeve_ipred.c, xeve_itdq.c, xeve_recon.c
  - deblocking: src_base/xeve_df.c (vertical edges pass then horizontal)
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..constants import (
    MIN_CU_LOG2, MIN_CU_SIZE, MPM_TBL, SCAN, SLICE_I,
    NUT_IDR, NUT_NONIDR, NUT_SPS, NUT_PPS, NUT_SEI,
    IPD_CNT_B, chroma_qp_dynamic,
)
from ..hls import SPS, PPS, SliceHeader, split_nals
from ..io.bits import BitReader
from ..entropy.sbac import SbacDecoder, SbacCtx
from ..ops import reference_kernels as rk

# rank -> ipm inverse of MPM table
MPM_INV = np.zeros_like(MPM_TBL)
for _l in range(6):
    for _u in range(6):
        for _ipm in range(5):
            MPM_INV[_l, _u, MPM_TBL[_l, _u, _ipm]] = _ipm


@dataclass
class DecodedFrame:
    y: np.ndarray
    u: np.ndarray
    v: np.ndarray
    poc: int = 0
    slice_type: int = SLICE_I
    qp: int = 32


class BaselineIntraDecoder:
    """Decodes Baseline-profile streams (I slices; P/B to come with inter)."""

    def __init__(self):
        self.sps: SPS | None = None
        self.pps: PPS | None = None
        self.frames: list[DecodedFrame] = []

    # -- top level ----------------------------------------------------------
    def decode(self, stream: bytes) -> list[DecodedFrame]:
        for hdr, payload, _full in split_nals(stream):
            if hdr.nal_unit_type == NUT_SPS:
                self.sps = SPS.parse(BitReader(payload))
                self._setup_dims()
            elif hdr.nal_unit_type == NUT_PPS:
                self.pps = PPS.parse(BitReader(payload))
            elif hdr.nal_unit_type in (NUT_IDR, NUT_NONIDR):
                self._decode_slice(payload, hdr.nal_unit_type)
            elif hdr.nal_unit_type == NUT_SEI:
                pass
            else:
                pass
        return self.frames

    def _setup_dims(self):
        s = self.sps
        self.w = s.pic_width_in_luma_samples
        self.h = s.pic_height_in_luma_samples
        self.bd = s.bit_depth_luma_minus8 + 8
        self.max_cuwh = 64  # Baseline CTU (128 for Main, via sps_btt)
        self.log2_max_cuwh = 6
        self.w_lcu = (self.w + self.max_cuwh - 1) // self.max_cuwh
        self.h_lcu = (self.h + self.max_cuwh - 1) // self.max_cuwh
        self.w_scu = (self.w + MIN_CU_SIZE - 1) >> MIN_CU_LOG2
        self.h_scu = (self.h + MIN_CU_SIZE - 1) >> MIN_CU_LOG2

    # -- slice decode -------------------------------------------------------
    def _decode_slice(self, payload: bytes, nut: int):
        br = BitReader(payload)
        sh = SliceHeader.parse(br, nut)
        assert sh.slice_type == SLICE_I, "inter decoding lands with inter coding"
        assert br.is_byte_aligned()
        sbac = SbacDecoder(payload, br.byte_pos)
        ctx = SbacCtx()

        w, h, bd = self.w, self.h, self.bd
        mid = 1 << (bd - 1)
        # reconstruction planes (pre-deblock)
        self.rec_y = np.full((h, w), mid, dtype=np.int32)
        self.rec_u = np.full((h >> 1, w >> 1), mid, dtype=np.int32)
        self.rec_v = np.full((h >> 1, w >> 1), mid, dtype=np.int32)
        # SCU maps
        self.map_cod = np.zeros((self.h_scu, self.w_scu), dtype=bool)
        self.map_if = np.zeros((self.h_scu, self.w_scu), dtype=bool)
        self.map_ipm = np.full((self.h_scu, self.w_scu), -1, dtype=np.int32)
        self.map_qp = np.full((self.h_scu, self.w_scu), sh.qp, dtype=np.int32)
        self.map_cbf_l = np.zeros((self.h_scu, self.w_scu), dtype=bool)
        self.leaf_cus: list[tuple[int, int, int, int]] = []  # z-order (x,y,w,h)

        self.sh = sh
        self.qp_prev_eco = sh.qp
        qp_u = int(np.clip(sh.qp + sh.qp_u_offset, -6 * (self.sps.bit_depth_chroma_minus8), 57))
        qp_v = int(np.clip(sh.qp + sh.qp_v_offset, -6 * (self.sps.bit_depth_chroma_minus8), 57))
        self.qp_u = chroma_qp_dynamic(qp_u) + 6 * self.sps.bit_depth_chroma_minus8
        self.qp_v = chroma_qp_dynamic(qp_v) + 6 * self.sps.bit_depth_chroma_minus8
        self.qp_y = sh.qp + 6 * self.sps.bit_depth_luma_minus8

        for lcu_y in range(self.h_lcu):
            for lcu_x in range(self.w_lcu):
                self._decode_tree(sbac, ctx, lcu_x << 6, lcu_y << 6,
                                  self.max_cuwh, self.max_cuwh)
        tile_end = sbac.decode_bin_trm()
        assert tile_end == 1

        if sh.deblocking_filter_on:
            self._deblock()

        self.frames.append(DecodedFrame(
            self.rec_y.copy(), self.rec_u.copy(), self.rec_v.copy(),
            poc=len(self.frames), slice_type=sh.slice_type, qp=sh.qp))

    # -- CTU tree -----------------------------------------------------------
    def _decode_tree(self, sbac: SbacDecoder, ctx: SbacCtx, x0, y0, cuw, cuh):
        in_bounds = (x0 + cuw <= self.w) and (y0 + cuh <= self.h)
        if cuw < 8 and cuh < 8:
            split = 0
        else:
            # Baseline (no BTT): split flag coded at every node >= 8,
            # including boundary nodes (xeve_enc.c:56-58, xeve_eco.c:1377)
            split = sbac.decode_bin(ctx.split_cu_flag, 0)
        if split:
            half = cuw >> 1
            for (dx, dy) in ((0, 0), (half, 0), (0, half), (half, half)):
                xp, yp = x0 + dx, y0 + dy
                if xp < self.w and yp < self.h:
                    self._decode_tree(sbac, ctx, xp, yp, half, half)
        else:
            assert in_bounds, "leaf CU crossing the picture boundary"
            self._decode_cu(sbac, ctx, x0, y0, cuw, cuh)

    # -- CU decode ----------------------------------------------------------
    def _get_mpm_inv(self, x_scu, y_scu):
        ipm_l = 0
        ipm_u = 0
        if x_scu > 0 and self.map_if[y_scu, x_scu - 1] and self.map_cod[y_scu, x_scu - 1]:
            ipm_l = int(self.map_ipm[y_scu, x_scu - 1]) + 1
        if y_scu > 0 and self.map_if[y_scu - 1, x_scu] and self.map_cod[y_scu - 1, x_scu]:
            ipm_u = int(self.map_ipm[y_scu - 1, x_scu]) + 1
        return MPM_INV[ipm_l, ipm_u]

    def _decode_coef_block(self, sbac: SbacDecoder, ctx: SbacCtx, w, h, ch_type):
        """xeve_eco_run_length_cc inverse."""
        coef = np.zeros(w * h, dtype=np.int32)
        scan = SCAN[(w, h)]
        num_coeff = w * h
        scan_pos = 0
        t0 = 0 if ch_type == 0 else 2  # sps_cm_init_flag == 0
        ctx_last = 0 if ch_type == 0 else 1
        while scan_pos < num_coeff:
            run = sbac.read_unary_sym(ctx.run, t0, 2)
            scan_pos += run
            level = sbac.read_unary_sym(ctx.level, t0, 2) + 1
            sign = sbac.decode_bin_ep()
            coef[scan[scan_pos]] = -level if sign else level
            if scan_pos == num_coeff - 1:
                break
            scan_pos += 1
            last = sbac.decode_bin(ctx.last, ctx_last)
            if last:
                break
        return coef.reshape(h, w)

    def _decode_cu(self, sbac: SbacDecoder, ctx: SbacCtx, x, y, cuw, cuh):
        x_scu, y_scu = x >> MIN_CU_LOG2, y >> MIN_CU_LOG2
        # intra dir from MPM ranking
        rank = sbac.read_unary_sym(ctx.intra_dir, 0, 2)
        ipm = int(self._get_mpm_inv(x_scu, y_scu)[rank])

        # cbf (intra branch of xeve_eco_cbf, xeve_eco.c:866-891)
        cbf_u = sbac.decode_bin(ctx.cbf_cb, 0)
        cbf_v = sbac.decode_bin(ctx.cbf_cr, 0)
        cbf_y = sbac.decode_bin(ctx.cbf_luma, 0)

        if self.pps.cu_qp_delta_enabled_flag and (cbf_y or cbf_u or cbf_v):
            abs_dqp = sbac.read_unary_sym(ctx.delta_qp, 0, 1)
            if abs_dqp > 0:
                sign = sbac.decode_bin_ep()
                dqp = -abs_dqp if sign else abs_dqp
            else:
                dqp = 0
            qp = self.qp_prev_eco + dqp
            self.qp_prev_eco = qp
        else:
            qp = self.qp_prev_eco
        qp_y = qp + 6 * self.sps.bit_depth_luma_minus8
        # NOTE: chroma qp follows the slice-level mapping of the luma qp
        qp_u_i = int(np.clip(qp + self.sh.qp_u_offset, -12, 57))
        qp_v_i = int(np.clip(qp + self.sh.qp_v_offset, -12, 57))
        qp_u = chroma_qp_dynamic(qp_u_i) + 6 * self.sps.bit_depth_chroma_minus8
        qp_v = chroma_qp_dynamic(qp_v_i) + 6 * self.sps.bit_depth_chroma_minus8

        coef_y = coef_u = coef_v = None
        if cbf_y:
            coef_y = self._decode_coef_block(sbac, ctx, cuw, cuh, 0)
        if cbf_u:
            coef_u = self._decode_coef_block(sbac, ctx, cuw >> 1, cuh >> 1, 1)
        if cbf_v:
            coef_v = self._decode_coef_block(sbac, ctx, cuw >> 1, cuh >> 1, 1)

        # reconstruct
        self._recon_intra_cu(x, y, cuw, cuh, ipm, qp_y, qp_u, qp_v,
                             coef_y, coef_u, coef_v)

        # update maps
        ys, xs = y_scu, x_scu
        hs, ws = cuh >> MIN_CU_LOG2, cuw >> MIN_CU_LOG2
        self.map_cod[ys:ys + hs, xs:xs + ws] = True
        self.map_if[ys:ys + hs, xs:xs + ws] = True
        self.map_ipm[ys:ys + hs, xs:xs + ws] = ipm
        self.map_qp[ys:ys + hs, xs:xs + ws] = qp
        self.map_cbf_l[ys:ys + hs, xs:xs + ws] = bool(cbf_y)
        self.leaf_cus.append((x, y, cuw, cuh))

    # -- intra reconstruction ----------------------------------------------
    def _avail_rows(self, x_scu, y_scu, n_units, step_scu):
        """Availability per unit along the up row, reference semantics
        (xeve_ipred.c:73-83): y_scu>0, x within picture, neighbor COD."""
        out = np.zeros(n_units, dtype=bool)
        if y_scu > 0:
            for i in range(n_units):
                xi = x_scu + i * step_scu
                if xi < self.w_scu and self.map_cod[y_scu - 1, xi]:
                    out[i] = True
        return out

    def _avail_cols(self, x_scu, y_scu, n_units, step_scu):
        out = np.zeros(n_units, dtype=bool)
        if x_scu > 0:
            for i in range(n_units):
                yi = y_scu + i * step_scu
                if yi < self.h_scu and self.map_cod[yi, x_scu - 1]:
                    out[i] = True
        return out

    def gather_nb(self, plane, x, y, w, h, x_scu, y_scu, unit, step_scu):
        n_up_units = (w + h) // unit
        n_le_units = (h + w) // unit
        up_avail = self._avail_rows(x_scu, y_scu, n_up_units, step_scu)
        le_avail = self._avail_cols(x_scu, y_scu, n_le_units, step_scu)
        ul_avail = (x_scu > 0 and y_scu > 0 and
                    self.map_cod[y_scu - 1, x_scu - 1])
        mid = 1 << (self.bd - 1)
        up = np.full(w + h, mid, dtype=np.int32)
        left = np.full(h + w, mid, dtype=np.int32)
        H, W = plane.shape
        for i in range(n_up_units):
            if up_avail[i]:
                xs = x + i * unit
                seg = plane[y - 1, xs:min(xs + unit, W)]
                up[i * unit:i * unit + len(seg)] = seg
        for i in range(n_le_units):
            if le_avail[i]:
                ysg = y + i * unit
                seg = plane[ysg:min(ysg + unit, H), x - 1]
                left[i * unit:i * unit + len(seg)] = seg
        up_left = int(plane[y - 1, x - 1]) if ul_avail else mid
        return up, left, up_left

    def _recon_intra_cu(self, x, y, cuw, cuh, ipm, qp_y, qp_u, qp_v,
                        coef_y, coef_u, coef_v):
        bd = self.bd
        x_scu, y_scu = x >> MIN_CU_LOG2, y >> MIN_CU_LOG2
        # luma
        up, left, ul = self.gather_nb(self.rec_y, x, y, cuw, cuh,
                                      x_scu, y_scu, MIN_CU_SIZE, 1)
        pred = rk.ipred(ipm, up, left, ul, cuw, cuh)
        resi = None
        if coef_y is not None:
            resi = rk.inverse_dct2(rk.dequant(coef_y, qp_y, bd), bd)
        self.rec_y[y:y + cuh, x:x + cuw] = rk.recon_block(pred, resi, bd)
        # chroma
        xc, yc = x >> 1, y >> 1
        wc, hc = cuw >> 1, cuh >> 1
        for plane, coef, qp_c in ((self.rec_u, coef_u, qp_u),
                                  (self.rec_v, coef_v, qp_v)):
            up, left, ul = self.gather_nb(plane, xc, yc, wc, hc,
                                          x_scu, y_scu, MIN_CU_SIZE >> 1, 1)
            pred = rk.ipred(ipm, up, left, ul, wc, hc)
            resi = None
            if coef is not None:
                resi = rk.inverse_dct2(rk.dequant(coef, qp_c, bd), bd)
            plane[yc:yc + hc, xc:xc + wc] = rk.recon_block(pred, resi, bd)

    # -- deblocking ---------------------------------------------------------
    def _deblock(self):
        from ..ops.deblock_np import deblock_frame
        deblock_frame(self.rec_y, self.rec_u, self.rec_v, self.leaf_cus,
                      self.map_if, self.map_cbf_l, self.map_qp,
                      self.sh.qp_u_offset, self.sh.qp_v_offset,
                      self.bd, self.sps.bit_depth_chroma_minus8)
