"""Conformance: our decoder must reproduce the reference encoder's recon
bit-exactly on the committed golden bitstreams."""
import os

import numpy as np
import pytest

from xeve_tpu.dec.decoder import BaselineIntraDecoder
from tests.conftest import DATA, load_rec10

CASES = [
    ("tiny_ai_q32", 64, 64, 1),
    ("s96_ai_q27", 96, 80, 2),
    ("cif_ai_q32", 352, 288, 2),
]


@pytest.mark.parametrize("name,w,h,n", CASES)
def test_decode_reference_bitstream(name, w, h, n):
    stream = open(os.path.join(DATA, f"{name}.evc"), "rb").read()
    frames = BaselineIntraDecoder().decode(stream)
    assert len(frames) == n
    for i, f in enumerate(frames):
        gy, gu, gv = load_rec10(os.path.join(DATA, f"{name}_rec.yuv"), w, h, i)
        assert np.array_equal(f.y, gy), f"{name} frame {i} luma mismatch"
        assert np.array_equal(f.u, gu), f"{name} frame {i} cb mismatch"
        assert np.array_equal(f.v, gv), f"{name} frame {i} cr mismatch"


LDP_CASES = [
    ("s96_zl", 96, 80, 2),
    ("s96_zl6", 96, 80, 6),
]


@pytest.mark.parametrize("name,w,h,n", LDP_CASES)
def test_decode_reference_ldp_bitstream(name, w, h, n):
    """Low-delay P (zerolatency) streams: validates inter MC, MVP list,
    skip mode, inter cbf semantics, MV-based deblock strengths."""
    stream = open(os.path.join(DATA, f"{name}.evc"), "rb").read()
    frames = BaselineIntraDecoder().decode(stream)
    assert len(frames) == n
    for i, f in enumerate(frames):
        gy, gu, gv = load_rec10(os.path.join(DATA, f"{name}_rec.yuv"), w, h, i)
        assert np.array_equal(f.y, gy), f"{name} frame {i} luma mismatch"
        assert np.array_equal(f.u, gu), f"{name} frame {i} cb mismatch"
        assert np.array_equal(f.v, gv), f"{name} frame {i} cr mismatch"
