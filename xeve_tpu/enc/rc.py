"""Frame-level rate control: ABR (CBR-style) and CRF.

Model family follows the reference (src_base/xeve_rc.c): quantizer factor
qf = 0.85 * 2^((qp-21)/8.4) (qp_to_qf, xeve_rc.c:97), frame complexity
raised to pow 0.4, ABR qf = k * cpx^0.4 / target_bpf with k adapted from
real bits, CRF qf = cpx^0.4 / ratefactor, plus VBV buffer clipping
(get_vbv_qfactor, xeve_rc.c:351).

TPU-native redesign: instead of the reference's separate half-resolution
forecast pass (xeve_fcst.c), frame complexity comes from the batched
analysis stage itself (the 16x16-level SATD-like costs it already
computes), so rate control adds no extra device work.
"""
from __future__ import annotations

import numpy as np

from ..constants import SLICE_I, SLICE_P, SLICE_B

POW_CPLX = 0.4
INTRA_RATE_RATIO = 3.0   # I frames get ~3x the per-frame budget


def qp_to_qf(qp: float) -> float:
    return 0.85 * 2.0 ** ((qp - 21.0) / 8.4)


def qf_to_qp(qf: float) -> float:
    return 21.0 + 4.2 * np.log(qf / 0.85) * 2.88538


def frame_complexity(y: np.ndarray, prev_y: np.ndarray | None) -> float:
    """Cheap SATD-ish complexity: 8x8 Hadamard-energy of the frame (intra)
    or of the temporal difference (inter)."""
    src = y.astype(np.float32)
    if prev_y is not None:
        src = src - prev_y.astype(np.float32)
        # remove DC per 8x8 block to approximate prediction
    h, w = src.shape
    hb, wb = h // 8, w // 8
    blocks = src[:hb * 8, :wb * 8].reshape(hb, 8, wb, 8)
    dc = blocks.mean(axis=(1, 3), keepdims=True)
    return float(np.abs(blocks - dc).sum()) + 1.0


class RateControl:
    """rc_type: 'abr' (bitrate target) or 'crf' (quality target)."""

    def __init__(self, rc_type: str, w: int, h: int, fps: float,
                 bitrate_kbps: float = 0.0, crf: int = 32,
                 qp_min: int = 0, qp_max: int = 51,
                 vbv_msec: int = 2000):
        self.rc_type = rc_type
        self.fps = fps
        self.bitrate = bitrate_kbps * 1000.0
        self.crf = crf
        self.qp_min, self.qp_max = qp_min, qp_max
        self.bpf = self.bitrate / fps if fps > 0 else 0.0
        self.target_bits = 0.0          # accumulated budget minus spend
        self.cpx_sum = 0.0
        self.cpx_cnt = 0.0
        self.df_cplx = 0.5
        self.k_param = 1.0
        self.k_cnt = 0.0
        self.base_cplx = None
        self.vbv_size = self.bitrate * vbv_msec / 1000.0
        self.vbv_fullness = 0.0
        self.frames = 0

    # ------------------------------------------------------------------
    def pick_qp(self, slice_type: int, slice_depth: int, cpx: float) -> int:
        self.cpx_sum = self.cpx_sum * self.df_cplx + cpx
        self.cpx_cnt = self.cpx_cnt * self.df_cplx + 1.0
        cpx_avg = self.cpx_sum / self.cpx_cnt
        cpx_pow = cpx_avg ** POW_CPLX
        if self.base_cplx is None:
            self.base_cplx = cpx

        if self.rc_type == "crf":
            rf = self.crf + (1.0 if slice_depth <= 1 else 1.1 * (slice_depth + 2.0))
            ratefactor = (self.base_cplx ** POW_CPLX) / qp_to_qf(rf - 3.0)
            qf = cpx_pow / ratefactor
        else:
            target = self.bpf
            if slice_type == SLICE_I:
                target *= INTRA_RATE_RATIO
            elif slice_type == SLICE_B and slice_depth > 2:
                target *= 0.5
            self.target_bits += self.bpf
            if self.k_cnt == 0:
                # bootstrap: bits ~ cpx^0.4 / qf * k, assume k from first qp
                qf = qp_to_qf(34)
                self.k_param = qf * target / max(cpx_pow, 1e-6)
            else:
                qf = self.k_param * cpx_pow / max(target, 1.0)
            # budget feedback: spend deficit/surplus over ~1s window
            if self.bpf > 0:
                drift = self.target_bits / (self.bpf * max(self.fps, 1.0))
                qf *= float(np.clip(1.0 - 0.5 * drift, 0.5, 2.0))
            qf = self._vbv_clip(qf, target)

        qp = int(np.clip(round(qf_to_qp(qf)), self.qp_min, self.qp_max))
        return qp

    def _vbv_clip(self, qf: float, target: float) -> float:
        if self.vbv_size <= 0:
            return qf
        if self.vbv_fullness > self.vbv_size:
            qf *= self.vbv_fullness / self.vbv_size
        return qf

    # ------------------------------------------------------------------
    def update(self, slice_type: int, qp: int, bits: int, cpx: float):
        self.frames += 1
        qf = qp_to_qf(qp)
        if self.rc_type == "abr":
            self.target_bits -= bits
            k_obs = qf * bits / max(cpx ** POW_CPLX, 1e-6)
            w = min(1.0, 3.0 / max(self.k_cnt, 1.0))
            if self.k_cnt == 0:
                self.k_param = k_obs
            else:
                self.k_param = (1 - w) * self.k_param + w * k_obs
            self.k_cnt += 1
            if self.vbv_size > 0:
                self.vbv_fullness += bits - self.bpf
                self.vbv_fullness = float(np.clip(self.vbv_fullness, 0,
                                                  self.vbv_size * 1.5))
