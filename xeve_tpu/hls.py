"""High-level syntax: NAL unit framing, SPS/PPS/SH write + parse.

Bitstream layout per reference encoder output (src_base/xeve_eco.c:35-290):
every NAL unit is prefixed with a 4-byte big-endian length (payload length
excluding the 4 length bytes), followed by a 2-byte NAL header.
"""
from __future__ import annotations

from dataclasses import dataclass, field

from .io.bits import BitWriter, BitReader
from .constants import (NUT_IDR, NUT_NONIDR, NUT_SPS, NUT_PPS, NUT_SEI,
                        SLICE_I, SLICE_P, SLICE_B)


# ---------------------------------------------------------------------------
# NAL
# ---------------------------------------------------------------------------

@dataclass
class NalHeader:
    nal_unit_type: int = NUT_NONIDR
    nuh_temporal_id: int = 0

    def write(self, bw: BitWriter):
        bw.write1(0)                              # forbidden_zero_bit
        bw.write(self.nal_unit_type + 1, 6)       # nal_unit_type_plus1
        bw.write(self.nuh_temporal_id, 3)
        bw.write(0, 5)                            # nuh_reserved_zero_5bits
        bw.write1(0)                              # nuh_extension_flag

    @classmethod
    def parse(cls, br: BitReader) -> "NalHeader":
        br.read1()
        nut = br.read(6) - 1
        tid = br.read(3)
        br.read(5)
        br.read1()
        return cls(nut, tid)


def wrap_nal(payload: bytes) -> bytes:
    return len(payload).to_bytes(4, "big") + payload


def split_nals(stream: bytes):
    """Yield (nal_unit_type, temporal_id, payload_bytes_after_header,
    full_payload) for each length-prefixed NAL in the stream."""
    pos = 0
    while pos + 4 <= len(stream):
        size = int.from_bytes(stream[pos:pos + 4], "big")
        payload = stream[pos + 4:pos + 4 + size]
        br = BitReader(payload)
        hdr = NalHeader.parse(br)
        yield hdr, payload[2:], payload
        pos += 4 + size


# ---------------------------------------------------------------------------
# SPS  (xeve_eco_sps, xeve_eco.c:140)
# ---------------------------------------------------------------------------

@dataclass
class SPS:
    sps_seq_parameter_set_id: int = 0
    profile_idc: int = 0
    level_idc: int = 120
    toolset_idc_h: int = 0
    toolset_idc_l: int = 0
    chroma_format_idc: int = 1
    pic_width_in_luma_samples: int = 0
    pic_height_in_luma_samples: int = 0
    bit_depth_luma_minus8: int = 2
    bit_depth_chroma_minus8: int = 2
    sps_btt_flag: int = 0
    sps_suco_flag: int = 0
    tool_admvp: int = 0
    tool_eipd: int = 0
    tool_cm_init: int = 0
    tool_iqt: int = 0
    tool_addb: int = 0
    tool_alf: int = 0
    tool_htdf: int = 0
    tool_rpl: int = 0
    tool_pocs: int = 0
    dquant_flag: int = 0
    tool_dra: int = 0
    log2_sub_gop_length: int = 0
    log2_ref_pic_gap_length: int = 0
    max_num_ref_pics: int = 0
    picture_cropping_flag: int = 0
    picture_crop_left_offset: int = 0
    picture_crop_right_offset: int = 0
    picture_crop_top_offset: int = 0
    picture_crop_bottom_offset: int = 0
    chroma_qp_table_present_flag: int = 0
    vui_parameters_present_flag: int = 0

    def write(self, bw: BitWriter):
        bw.write_ue(self.sps_seq_parameter_set_id)
        bw.write(self.profile_idc, 8)
        bw.write(self.level_idc, 8)
        bw.write(self.toolset_idc_h, 32)
        bw.write(self.toolset_idc_l, 32)
        bw.write_ue(self.chroma_format_idc)
        bw.write_ue(self.pic_width_in_luma_samples)
        bw.write_ue(self.pic_height_in_luma_samples)
        bw.write_ue(self.bit_depth_luma_minus8)
        bw.write_ue(self.bit_depth_chroma_minus8)
        for f in (self.sps_btt_flag, self.sps_suco_flag, self.tool_admvp,
                  self.tool_eipd, self.tool_cm_init, self.tool_iqt,
                  self.tool_addb, self.tool_alf, self.tool_htdf, self.tool_rpl,
                  self.tool_pocs, self.dquant_flag, self.tool_dra):
            bw.write1(f)
        bw.write_ue(self.log2_sub_gop_length)
        if self.log2_sub_gop_length == 0:
            bw.write_ue(self.log2_ref_pic_gap_length)
        bw.write_ue(self.max_num_ref_pics)
        bw.write1(self.picture_cropping_flag)
        if self.picture_cropping_flag:
            bw.write_ue(self.picture_crop_left_offset)
            bw.write_ue(self.picture_crop_right_offset)
            bw.write_ue(self.picture_crop_top_offset)
            bw.write_ue(self.picture_crop_bottom_offset)
        if self.chroma_format_idc != 0:
            bw.write1(self.chroma_qp_table_present_flag)
            assert self.chroma_qp_table_present_flag == 0, "explicit table TBD"
        bw.write1(self.vui_parameters_present_flag)
        assert self.vui_parameters_present_flag == 0
        bw.byte_align()

    @classmethod
    def parse(cls, br: BitReader) -> "SPS":
        s = cls()
        s.sps_seq_parameter_set_id = br.read_ue()
        s.profile_idc = br.read(8)
        s.level_idc = br.read(8)
        s.toolset_idc_h = br.read(32)
        s.toolset_idc_l = br.read(32)
        s.chroma_format_idc = br.read_ue()
        s.pic_width_in_luma_samples = br.read_ue()
        s.pic_height_in_luma_samples = br.read_ue()
        s.bit_depth_luma_minus8 = br.read_ue()
        s.bit_depth_chroma_minus8 = br.read_ue()
        (s.sps_btt_flag, s.sps_suco_flag, s.tool_admvp, s.tool_eipd,
         s.tool_cm_init, s.tool_iqt, s.tool_addb, s.tool_alf, s.tool_htdf,
         s.tool_rpl, s.tool_pocs, s.dquant_flag, s.tool_dra) = \
            (br.read1() for _ in range(13))
        s.log2_sub_gop_length = br.read_ue()
        if s.log2_sub_gop_length == 0:
            s.log2_ref_pic_gap_length = br.read_ue()
        s.max_num_ref_pics = br.read_ue()
        s.picture_cropping_flag = br.read1()
        if s.picture_cropping_flag:
            s.picture_crop_left_offset = br.read_ue()
            s.picture_crop_right_offset = br.read_ue()
            s.picture_crop_top_offset = br.read_ue()
            s.picture_crop_bottom_offset = br.read_ue()
        if s.chroma_format_idc != 0:
            s.chroma_qp_table_present_flag = br.read1()
            assert s.chroma_qp_table_present_flag == 0, "explicit chroma QP table unsupported"
        s.vui_parameters_present_flag = br.read1()
        assert s.vui_parameters_present_flag == 0
        br.byte_align()
        return s


# ---------------------------------------------------------------------------
# PPS  (xeve_eco_pps, xeve_eco.c:215)
# ---------------------------------------------------------------------------

@dataclass
class PPS:
    pps_pic_parameter_set_id: int = 0
    pps_seq_parameter_set_id: int = 0
    num_ref_idx_default_active_minus1: tuple = (0, 0)
    additional_lt_poc_lsb_len: int = 0
    rpl1_idx_present_flag: int = 0
    single_tile_in_pic_flag: int = 1
    tile_id_len_minus1: int = 0
    explicit_tile_id_flag: int = 0
    pic_dra_enabled_flag: int = 0
    arbitrary_slice_present_flag: int = 0
    constrained_intra_pred_flag: int = 0
    cu_qp_delta_enabled_flag: int = 0
    cu_qp_delta_area: int = 6

    def write(self, bw: BitWriter):
        bw.write_ue(self.pps_pic_parameter_set_id)
        bw.write_ue(self.pps_seq_parameter_set_id)
        bw.write_ue(self.num_ref_idx_default_active_minus1[0])
        bw.write_ue(self.num_ref_idx_default_active_minus1[1])
        bw.write_ue(self.additional_lt_poc_lsb_len)
        bw.write1(self.rpl1_idx_present_flag)
        bw.write1(self.single_tile_in_pic_flag)
        assert self.single_tile_in_pic_flag == 1, "multi-tile HLS TBD"
        bw.write_ue(self.tile_id_len_minus1)
        bw.write1(self.explicit_tile_id_flag)
        bw.write1(self.pic_dra_enabled_flag)
        bw.write1(self.arbitrary_slice_present_flag)
        bw.write1(self.constrained_intra_pred_flag)
        bw.write1(self.cu_qp_delta_enabled_flag)
        if self.cu_qp_delta_enabled_flag:
            bw.write_ue(self.cu_qp_delta_area - 6)
        bw.byte_align()

    @classmethod
    def parse(cls, br: BitReader) -> "PPS":
        p = cls()
        p.pps_pic_parameter_set_id = br.read_ue()
        p.pps_seq_parameter_set_id = br.read_ue()
        p.num_ref_idx_default_active_minus1 = (br.read_ue(), br.read_ue())
        p.additional_lt_poc_lsb_len = br.read_ue()
        p.rpl1_idx_present_flag = br.read1()
        p.single_tile_in_pic_flag = br.read1()
        assert p.single_tile_in_pic_flag == 1, "multi-tile HLS unsupported yet"
        p.tile_id_len_minus1 = br.read_ue()
        p.explicit_tile_id_flag = br.read1()
        p.pic_dra_enabled_flag = br.read1()
        p.arbitrary_slice_present_flag = br.read1()
        p.constrained_intra_pred_flag = br.read1()
        p.cu_qp_delta_enabled_flag = br.read1()
        if p.cu_qp_delta_enabled_flag:
            p.cu_qp_delta_area = br.read_ue() + 6
        br.byte_align()
        return p


# ---------------------------------------------------------------------------
# Slice header  (xeve_eco_sh, xeve_eco.c:248)
# ---------------------------------------------------------------------------

@dataclass
class SliceHeader:
    slice_pic_parameter_set_id: int = 0
    slice_type: int = SLICE_I
    no_output_of_prior_pics_flag: int = 0
    num_ref_idx_active_override_flag: int = 0
    num_ref_idx_active: tuple = (1, 1)
    deblocking_filter_on: int = 1
    qp: int = 32
    qp_u_offset: int = 0
    qp_v_offset: int = 0

    def write(self, bw: BitWriter, nut: int):
        bw.write_ue(self.slice_pic_parameter_set_id)
        bw.write_ue(self.slice_type)
        if nut == NUT_IDR:
            bw.write1(self.no_output_of_prior_pics_flag)
        if self.slice_type != SLICE_I:
            bw.write1(self.num_ref_idx_active_override_flag)
            if self.num_ref_idx_active_override_flag:
                bw.write_ue(self.num_ref_idx_active[0] - 1)
                if self.slice_type == SLICE_B:
                    bw.write_ue(self.num_ref_idx_active[1] - 1)
        bw.write1(self.deblocking_filter_on)
        bw.write(self.qp, 6)
        bw.write_se(self.qp_u_offset)
        bw.write_se(self.qp_v_offset)
        bw.byte_align()

    @classmethod
    def parse(cls, br: BitReader, nut: int) -> "SliceHeader":
        sh = cls()
        sh.slice_pic_parameter_set_id = br.read_ue()
        sh.slice_type = br.read_ue()
        if nut == NUT_IDR:
            sh.no_output_of_prior_pics_flag = br.read1()
        if sh.slice_type != SLICE_I:
            sh.num_ref_idx_active_override_flag = br.read1()
            if sh.num_ref_idx_active_override_flag:
                n0 = br.read_ue() + 1
                n1 = 1
                if sh.slice_type == SLICE_B:
                    n1 = br.read_ue() + 1
                sh.num_ref_idx_active = (n0, n1)
        sh.deblocking_filter_on = br.read1()
        sh.qp = br.read(6)
        sh.qp_u_offset = br.read_se()
        sh.qp_v_offset = br.read_se()
        br.byte_align()
        return sh
