"""Encoder parameters (3-level config mirroring the reference design:
defaults -> profile/preset/tune -> explicit key/value; see SURVEY.md §5.6,
reference src_base/xeve_param_parse.c / xeve_enc.c:2290)."""
from __future__ import annotations

from dataclasses import dataclass, field

from .constants import PROFILE_BASELINE


@dataclass
class EncoderParams:
    w: int = 0
    h: int = 0
    qp: int = 32
    profile: int = PROFILE_BASELINE
    codec_bit_depth: int = 10
    input_depth: int = 8
    keyint: int = 0              # 0 = first frame I only; 1 = all intra
    bframes: int = 0
    fps: float = 30.0
    threads: int = 1
    use_deblock: bool = True
    rdoq: bool = True
    use_pic_sign: bool = False
    qp_cb_offset: int = 0
    qp_cr_offset: int = 0
    closed_gop: bool = False
    level_idc: int = 40
    preset: str = "medium"
    rc_type: str = "cq"          # cq | abr | crf
    bitrate_kbps: float = 0.0
    crf: int = 32
    qp_min: int = 0
    qp_max: int = 51

    def validate(self):
        assert self.w > 0 and self.h > 0
        assert 0 <= self.qp <= 51, f"qp {self.qp} out of range [0, 51]"
        assert self.codec_bit_depth in (10,)
        return self

    @property
    def w_aligned(self):
        return (self.w + 7) & ~7

    @property
    def h_aligned(self):
        return (self.h + 7) & ~7


def params_from_kv(base: EncoderParams | None = None, **kv) -> EncoderParams:
    p = base or EncoderParams()
    for k, v in kv.items():
        if not hasattr(p, k):
            raise KeyError(f"unknown parameter {k}")
        setattr(p, k, v)
    return p
