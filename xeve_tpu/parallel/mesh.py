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
