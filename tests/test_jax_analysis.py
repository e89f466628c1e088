"""JAX analysis stage: decision agreement vs exact-integer numpy oracle, and
multi-chip sharding (virtual CPU mesh from conftest)."""
import os

import numpy as np
import pytest

from tests.conftest import DATA, load_yuv8
from xeve_tpu.constants import chroma_qp_dynamic


def test_jax_analysis_agrees_with_numpy():
    from xeve_tpu.enc.analysis_np import analyze_frame
    from xeve_tpu.enc.analysis_jax import analyze_frame_jax
    w, h = 96, 80
    y8, u8, v8 = load_yuv8(os.path.join(DATA, "s96.yuv"), w, h, 0)
    y, u, v = y8 << 2, u8 << 2, v8 << 2
    qp = 32
    qp_y = qp + 12
    qp_u = chroma_qp_dynamic(qp) + 12
    a_np = analyze_frame(y, u, v, qp, qp_y, qp_u, qp_u, 10)
    a_jx = analyze_frame_jax(y, u, v, qp, qp_y, qp_u, qp_u, 10)
    for lg in a_np.mode:
        agree = (a_np.mode[lg] == a_jx.mode[lg]).mean()
        assert agree > 0.90, f"level {lg}: mode agreement {agree}"
        if lg in a_np.split:
            s_agree = (a_np.split[lg] == a_jx.split[lg]).mean()
            assert s_agree > 0.90, f"level {lg}: split agreement {s_agree}"


def test_batch_analyzer_matches_single():
    from xeve_tpu.enc.analysis_jax import BatchAnalyzer, analyze_frame_jax
    w, h = 96, 80
    frames = []
    for i in range(2):
        y8, u8, v8 = load_yuv8(os.path.join(DATA, "s96.yuv"), w, h, i)
        frames.append((np.asarray(y8 << 2, np.int16),
                       np.asarray(u8 << 2, np.int16),
                       np.asarray(v8 << 2, np.int16)))
    qp = 27
    qp_y = qp + 12
    qp_u = chroma_qp_dynamic(qp) + 12
    ba = BatchAnalyzer(w, h, qp, qp_y, qp_u, qp_u)
    res = ba.analyze(frames)
    ref = analyze_frame_jax(frames[1][0], frames[1][1], frames[1][2],
                            qp, qp_y, qp_u, qp_u, 10)
    for lg in ref.mode:
        assert np.array_equal(res[1].mode[lg], ref.mode[lg])
        assert np.array_equal(res[1].split[lg], ref.split[lg])


def test_meshed_analysis_multichip():
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device (virtual) platform")
    import __graft_entry__ as ge
    ge.dryrun_multichip(min(8, len(jax.devices())))


def test_pallas_me_agrees_with_numpy():
    """Pallas full-search ME vs the exact numpy oracle (interpret mode on
    CPU so the test runs without TPU hardware)."""
    import jax
    from xeve_tpu.ops import mc_np
    from xeve_tpu.enc.analysis_inter_np import integer_me
    y0, _, _ = load_yuv8(os.path.join(DATA, "s96b.yuv"), 96, 80, 0)
    y1, _, _ = load_yuv8(os.path.join(DATA, "s96b.yuv"), 96, 80, 1)
    ref_pad = mc_np.pad_picture((y0 << 2).astype(np.int32), 80)
    cur = (y1 << 2).astype(np.int32)
    mv_np, _ = integer_me(cur, ref_pad, 80, 8)
    from xeve_tpu.enc.me_jax import integer_me_jax
    mv_jx, _ = integer_me_jax(cur, ref_pad, 80, 8)
    assert (mv_np == np.asarray(mv_jx)).all()
