"""Build + load the native library (gcc -O3 shared object via ctypes)."""
from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libxevetpu.so")
_SRC = os.path.join(_DIR, "xt_core.c")
_TABLES = os.path.join(_DIR, "tables.h")

_lib = None


class XtFrameCfg(ctypes.Structure):
    _fields_ = [("w", ctypes.c_int32), ("h", ctypes.c_int32),
                ("bd", ctypes.c_int32), ("qp", ctypes.c_int32),
                ("qp_u_off", ctypes.c_int32), ("qp_v_off", ctypes.c_int32),
                ("use_rdoq", ctypes.c_int32), ("use_deblock", ctypes.c_int32),
                ("main_eipd", ctypes.c_int32), ("tool_iqt", ctypes.c_int32),
                ("cm_init", ctypes.c_int32),
                ("tile_cols", ctypes.c_int32), ("tile_rows", ctypes.c_int32),
                ("threads", ctypes.c_int32),
                ("cu_qp_delta", ctypes.c_int32),
                ("cu_qp_delta_area", ctypes.c_int32),
                ("dquant_flag", ctypes.c_int32),
                ("tool_ats", ctypes.c_int32),
                ("tool_htdf", ctypes.c_int32),
                ("tool_addb", ctypes.c_int32),
                ("addb_alpha_off", ctypes.c_int32),
                ("addb_beta_off", ctypes.c_int32),
                ("sps_btt", ctypes.c_int32),
                ("exact_rd", ctypes.c_int32)]


class XtStats(ctypes.Structure):
    _fields_ = [("payload_bytes", ctypes.c_int64),
                ("bin_count", ctypes.c_int64),
                ("n_leaf", ctypes.c_int32),
                ("n_tiles", ctypes.c_int32),
                ("tile_len", ctypes.c_int32 * 64)]


class XtRefPic(ctypes.Structure):
    """Reference picture (padded planes + motion map) for the inter pass."""
    _fields_ = [("y", ctypes.POINTER(ctypes.c_uint16)),
                ("u", ctypes.POINTER(ctypes.c_uint16)),
                ("v", ctypes.POINTER(ctypes.c_uint16)),
                ("map_mv", ctypes.POINTER(ctypes.c_int32)),
                ("poc", ctypes.c_int32),
                ("list0_poc", ctypes.c_int32)]


def _needs_build() -> bool:
    if not os.path.exists(_SO):
        return True
    so_t = os.path.getmtime(_SO)
    for dep in (_SRC, _TABLES, __file__):
        if os.path.exists(dep) and os.path.getmtime(dep) > so_t:
            return True
    return False


def build():
    if not os.path.exists(_TABLES) or \
            os.path.getmtime(_TABLES) < os.path.getmtime(
                os.path.join(_DIR, "gen_tables.py")):
        subprocess.check_call(["python", os.path.join(_DIR, "gen_tables.py"),
                               _TABLES])
    subprocess.check_call(
        ["gcc", "-O3", "-march=native", "-fPIC", "-shared", "-fvisibility=hidden",
         "-o", _SO, _SRC, "-lm", "-lpthread"])


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if _needs_build():
        build()
    lib = ctypes.CDLL(_SO)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i16p = ctypes.POINTER(ctypes.c_int16)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    i8p = ctypes.POINTER(ctypes.c_int8)
    lib.xt_encode_intra_frame.restype = ctypes.c_int
    lib.xt_encode_intra_frame.argtypes = [
        ctypes.POINTER(XtFrameCfg), i16p, i16p, i16p,
        u8p, u8p, u8p, u8p, u8p,      # split maps 2..6
        u8p, u8p, u8p, u8p, u8p,      # mode maps 2..6
        i8p,                          # per-SCU AQ offsets or NULL
        u8p, ctypes.c_int64,
        u16p, u16p, u16p,
        ctypes.POINTER(XtStats),
    ]
    lib.xt_encode_main_intra_frame.restype = ctypes.c_int
    lib.xt_encode_main_intra_frame.argtypes = \
        lib.xt_encode_intra_frame.argtypes
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.xt_encode_frame.restype = ctypes.c_int
    lib.xt_encode_frame.argtypes = [
        ctypes.POINTER(XtFrameCfg),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,   # slice_type, poc, pad_l
        i16p, i16p, i16p,
        ctypes.POINTER(XtRefPic), ctypes.c_int32,         # L0 list, count
        ctypes.POINTER(XtRefPic), ctypes.c_int32,         # L1 list, count
        ctypes.POINTER(u8p), ctypes.POINTER(u8p),         # split/mode map tables
        ctypes.POINTER(i32p), ctypes.POINTER(i32p),       # mv/mv1 map tables
        ctypes.POINTER(i32p), ctypes.POINTER(i32p),       # mv0b/mv1b (refi=1)
        ctypes.POINTER(i32p),                             # mvbi (bi-refined L1)
        ctypes.POINTER(ctypes.c_int8),                    # per-SCU AQ offsets
        u8p, ctypes.c_int64,
        u16p, u16p, u16p,
        i32p, ctypes.POINTER(ctypes.c_int8),
        ctypes.POINTER(XtStats),
    ]
    _lib = lib
    return lib
