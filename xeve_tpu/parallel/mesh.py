"""Multi-chip scale-out for the TPU EVC encoder.

All-intra (and GOP-level) encoding is embarrassingly parallel across frames:
the natural first sharding axis is frame-parallel ("gop" axis), with
tile-parallel within a frame as the second axis once tiles land (legal per
the bitstream: per-tile CABAC reset, SURVEY.md §2.4).

This module provides the meshed analysis step: a batch of frames is sharded
across devices on the "gop" axis; each device runs the full per-frame
analysis; per-level decision tensors are returned sharded and a global
rate-proxy scalar is psum'd across the mesh (the hook that rate control
uses to coordinate a shared bit budget across chips).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..enc.analysis_jax import _level_cost_impl, level_params


def make_mesh(n_devices: int | None = None, axis: str = "gop") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def meshed_subgop_analysis(mesh: Mesh, bd: int = 10, search_range: int = 16,
                           min_log2: int = 2, max_log2: int = 6):
    """Frame-parallel sharding of the PRODUCT fused analyzer
    (enc/device_analyzer._fused_impl) over the gop axis: the B-frames of a
    RA sub-GOP are analyzed one-per-device, each against its own L0/L1
    original references.  Per-frame math is the identical single-chip
    graph, so N-chip analysis == 1-chip analysis bit-for-bit and the final
    bitstream is mesh-size invariant (asserted in
    tests/test_multichip.py).

    Returns a jitted fn(y,u,v, r0y,r0u,r0v, r1y,r1u,r1v, prms, prm3) over
    batches whose leading dim is sharded on the mesh; output: packed
    per-frame int16 decision vectors, sharded the same way."""
    from ..enc.device_analyzer import _fused_impl, PAD
    axis = mesh.axis_names[0]
    fn1 = functools.partial(_fused_impl, bd=bd, R=int(search_range), pad=PAD,
                            min_log2=min_log2, max_log2=max_log2,
                            refine=True)

    def one(y, u, v, r0y, r0u, r0v, r1y, r1u, r1v, prms, prm3):
        return fn1(y, u, v, (r0y, r0u, r0v), None, (r1y, r1u, r1v), None,
                   prms, prm3)

    def per_device(*args):
        return jax.vmap(one)(*args)

    # scan carries inside the fused graph start from literals, which the
    # varying-manual-axes check misclassifies; the graph has no cross-
    # device communication, so the check is safely disabled
    try:
        sm = shard_map(per_device, mesh=mesh,
                       in_specs=(P(axis),) * 11, out_specs=P(axis),
                       check_vma=False)
    except TypeError:
        sm = shard_map(per_device, mesh=mesh,
                       in_specs=(P(axis),) * 11, out_specs=P(axis),
                       check_rep=False)
    return jax.jit(sm)


def meshed_analysis_step(mesh: Mesh, w: int, h: int, qp: int, qp_y: int,
                         qp_u: int, qp_v: int, bd: int = 10,
                         min_log2: int = 2, max_log2: int = 6):
    """Builds a pjit-ed function: (B, h, w) luma + chroma batches sharded on
    the gop axis -> per-level (mode, cost) sharded the same way + a psum'd
    global cost scalar."""
    axis = mesh.axis_names[0]
    prms = {lg: jnp.asarray(level_params(qp, qp_y, qp_u, qp_v, bd, lg))
            for lg in range(min_log2, max_log2 + 1)}

    def per_device(y, u, v):
        # y: (local_B, h, w)
        outs = []
        total = jnp.zeros((), jnp.float32)
        for lg in range(min_log2, max_log2 + 1):
            m, c = jax.vmap(functools.partial(
                _level_cost_impl, bd=bd, lg=lg),
                in_axes=(0, 0, 0, None))(y, u, v, prms[lg])
            outs.append(m)
            outs.append(c)
            if lg == max_log2:
                total = total + c.sum()
        # global rate/cost proxy across the whole mesh (ICI collective)
        total = jax.lax.psum(total, axis)
        return tuple(outs) + (total,)

    fn = shard_map(per_device, mesh=mesh,
                   in_specs=(P(axis), P(axis), P(axis)),
                   out_specs=tuple([P(axis)] * (2 * (max_log2 - min_log2 + 1))) + (P(),))
    return jax.jit(fn)
