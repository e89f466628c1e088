"""Golden tests for the exact-integer kernels."""
import numpy as np

from xeve_tpu.constants import TM, dct2_matrix, zigzag_scan, SCAN
from xeve_tpu.ops import reference_kernels as rk


def test_dct2_matrix_properties():
    for n in (2, 4, 8, 16, 32, 64):
        T = TM[n]
        assert T.shape == (n, n)
        assert (T[0] == T[0][0]).all()          # flat DC row
        assert abs(int(T[0][0])) == 64
        # near-orthogonality: T @ T.T ~ diag(64^2 * n)
        g = T @ T.T
        off = g - np.diag(np.diag(g))
        assert np.abs(off).max() < 0.02 * np.abs(np.diag(g)).max()


def test_zigzag_scan_is_permutation():
    for w, h in ((4, 4), (8, 8), (16, 16), (2, 2), (32, 32), (64, 64)):
        s = SCAN[(w, h)]
        assert sorted(s.tolist()) == list(range(w * h))
        assert s[0] == 0 and s[1] == 1  # starts right then down (zigzag)


def test_transform_roundtrip_small_residual():
    rng = np.random.RandomState(3)
    for s in (4, 8, 16, 32, 64):
        resi = rng.randint(-64, 64, size=(s, s)).astype(np.int32)
        coef = rk.forward_dct2(resi, 10)
        back = rk.inverse_dct2(coef, 10)
        err = np.abs(back - resi)
        assert err.max() <= 2, f"size {s}: max err {err.max()}"


def test_quant_dequant_identity_at_low_qp():
    rng = np.random.RandomState(4)
    coef = rng.randint(-500, 500, size=(8, 8)).astype(np.int32)
    lev, nnz = rk.quant(coef, 4, 2, 10)
    deq = rk.dequant(lev, 4, 10)
    assert nnz > 0
    # at QP 4 the quantizer is near-lossless in coefficient domain
    assert np.abs(deq - coef).max() <= 4


def test_intra_pred_modes():
    up = np.arange(16, dtype=np.int32) + 100
    left = np.arange(16, dtype=np.int32) + 200
    ul = 512
    # vertical copies up row
    p = rk.ipred(2, up, left, ul, 8, 8)
    assert (p == up[:8][None, :]).all()
    # horizontal copies left column
    p = rk.ipred(1, up, left, ul, 8, 8)
    assert (p == left[:8][:, None]).all()
    # dc is the rounded mean
    p = rk.ipred(0, up, left, ul, 8, 8)
    dc = (int(up[:8].sum()) + int(left[:8].sum()) + 8) >> 4
    assert (p == dc).all()
    # ul diagonal: first row from up-left then up samples
    p = rk.ipred(3, up, left, ul, 8, 8)
    assert p[0, 0] == ul and p[0, 1] == up[0] and p[1, 0] == left[0]
    # ur: average of up/left at i+j+1
    p = rk.ipred(4, up, left, ul, 8, 8)
    assert p[0, 0] == (up[1] + left[1]) >> 1


def test_deblock_strength_zero_is_identity():
    A = np.array([100, 200], dtype=np.int64)
    B, C, D = A + 1, A + 2, A + 3
    out = rk.deblock_line_luma(A, B, C, D, 0, 10)
    # st=0 never invoked by callers; function itself still filters, so just
    # check the st lookup path
    assert rk.df_strength(0, 0, 10) == 0
    assert rk.df_strength(51, 0, 10) == 12 << 2
