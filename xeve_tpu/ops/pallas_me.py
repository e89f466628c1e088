"""Pallas TPU kernel: dense full-search SAD motion estimation.

One program per 16-pel block row.  The current row strip arrives blocked in
VMEM; the overlapping reference search strip is DMA'd from HBM into VMEM
scratch.  The window sweep is a fori_loop over dy (dynamic sublane slice)
with a static unrolled loop over dx (lane slices must be static on TPU);
per-block SAD reduction is a matmul with a constant 0/1 block-summing
matrix (MXU).  The numpy twin (enc/analysis_inter_np.integer_me) is the
exact oracle; enc/me_jax.py is the pure-XLA fallback.

Why the PRODUCTION fused analyzer uses the XLA path instead (measured on
TPU v5 lite, 1080p, R=16, 2026-08-21): the XLA scan ME runs in 0.5 ms
device-resident inside the fused per-frame graph, while this standalone
kernel's host-numpy API costs 1192 ms/call through the remote-TPU tunnel
(transfer-bound: ~25 MB of planes per call).  XLA already keeps the SAD
sweep on the MXU; the Pallas kernel would only pay off if embedded in the
fused graph AND the gather-heavy window sweep beat XLA's fusion, which
the measurement says it does not.  Kept as a tested kernel-authoring
reference (exact vs the numpy oracle) reachable via me_engine="pallas".
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 16


def _me_kernel(cur_ref, ref_hbm, out_ref, ref_vmem, sem, *, R, W, nbx):
    i = pl.program_id(0)
    rows = ((2 * R + 7) // 8) * 8 + BLK + 8
    dma = pltpu.make_async_copy(
        ref_hbm.at[pl.ds(i * BLK, rows), :], ref_vmem, sem)
    dma.start()
    dma.wait()

    cur = cur_ref[:, :].astype(jnp.float32)
    # constant block-sum matrix (W, nbx): column j sums samples of block j
    cols = jax.lax.broadcasted_iota(jnp.int32, (W, nbx), 0) // BLK
    tgt = jax.lax.broadcasted_iota(jnp.int32, (W, nbx), 1)
    bsum = (cols == tgt).astype(jnp.float32)

    def body(q, carry):
        best_sad, best_dx, best_dy = carry
        # sublane dynamic slices must be 8-aligned: iterate dy in strides of
        # 8 with the 8 sub-offsets unrolled as static slices
        base = pl.multiple_of(q * 8, 8)
        strip8 = ref_vmem[pl.ds(base, BLK + 8), :]   # (BLK+8, W + 2R)
        for r in range(8):
            dy = q * 8 + r
            valid = dy <= 2 * R
            rows = strip8[r:r + BLK, :]
            for j in range(2 * R + 1):               # static lane slices
                ref = rows[:, j:j + W]
                d = jnp.abs(cur - ref.astype(jnp.float32))
                colsum = d.sum(axis=0, keepdims=True)    # (1, W)
                sad = jnp.dot(colsum, bsum,
                              preferred_element_type=jnp.float32)  # (1, nbx)
                sad = sad + (abs(j - R) + jnp.abs(dy - R)).astype(jnp.float32)
                sad = jnp.where(valid, sad, 2e30)
                upd = sad < best_sad
                best_sad = jnp.where(upd, sad, best_sad)
                best_dx = jnp.where(upd, jnp.full_like(best_dx, j - R), best_dx)
                best_dy = jnp.where(upd, (dy - R).astype(jnp.float32), best_dy)
        return best_sad, best_dx, best_dy

    init = (jnp.full((1, nbx), 1e30, jnp.float32),
            jnp.zeros((1, nbx), jnp.float32),
            jnp.zeros((1, nbx), jnp.float32))
    n8 = (2 * R + 1 + 7) // 8
    best_sad, best_dx, best_dy = jax.lax.fori_loop(0, n8, body, init)
    out_ref[0, 0, :] = best_sad[0]
    out_ref[0, 1, :] = best_dx[0]
    out_ref[0, 2, :] = best_dy[0]


@functools.partial(jax.jit, static_argnames=("R",))
def _me_pallas_jit(cur, ref_strip, R: int):
    H, W = cur.shape
    nby, nbx = H // BLK, W // BLK
    Wr = ref_strip.shape[1]
    out = pl.pallas_call(
        functools.partial(_me_kernel, R=R, W=W, nbx=nbx),
        grid=(nby,),
        in_specs=[
            pl.BlockSpec((BLK, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 3, nbx), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nby, 3, nbx), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((((2 * R + 7) // 8) * 8 + BLK + 8, Wr), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(cur, ref_strip)
    sad = out[:, 0, :]
    mv = jnp.stack([out[:, 1, :].astype(jnp.int32),
                    out[:, 2, :].astype(jnp.int32)], axis=-1)
    return mv, sad


def integer_me_pallas(cur_y: np.ndarray, ref_y_pad: np.ndarray, pad: int,
                      search_range: int = 16):
    """Pallas full-search ME; same contract as analysis_inter_np.integer_me."""
    h, w = cur_y.shape
    nby, nbx = h // BLK, w // BLK
    hc, wc = nby * BLK, nbx * BLK
    R = search_range
    cur = jnp.asarray(cur_y[:hc, :wc], dtype=jnp.float32)
    refp = np.asarray(ref_y_pad, dtype=np.float32)
    strip = refp[pad - R:pad - R + hc + 2 * R, pad - R:pad - R + wc + 2 * R]
    # lane dimension of HBM->VMEM DMAs must be 128-aligned; rows padded so
    # the last program's (aligned) strip load stays in bounds
    wr = strip.shape[1]
    wr_pad = ((wr + 127) // 128) * 128
    extra_rows = ((2 * R + 7) // 8) * 8 + BLK + 8 - (BLK + 2 * R)
    strip = np.pad(strip, ((0, extra_rows), (0, wr_pad - wr)))
    mv, sad = _me_pallas_jit(cur, jnp.asarray(strip), R)
    return np.asarray(mv, dtype=np.int32), np.asarray(sad, dtype=np.int64)
