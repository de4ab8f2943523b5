"""Fused whole-step Pallas kernel.

The hot path of the framework is the per-column model step: ~20 elementwise
passes over ``(Nz, cells)`` arrays, HBM-bandwidth bound. This module traces
the **entire step function** (tendencies + explicit update + closures) into a
single `pallas_call`: each grid program loads a block of columns into VMEM,
runs the full physics in registers/VMEM, and writes the block back — one HBM
round trip for the whole step instead of one per fused XLA kernel.

The kernel body is not hand-written physics: it re-traces the same pure
``timestepper.step`` used by the XLA path (via `jax.closure_convert`, which
also hoists grid-coordinate constants into kernel inputs), so the two paths
cannot diverge. Fusability requirements, all met by the shipped physics: no
dynamic gathers (water table uses the masked-min form), z-scans with
``unroll``/``reverse=`` instead of array flips, static shapes.

Limitations: static input sources only (time-varying forcing belongs outside
the fused rollout), and laterally-independent physics (always true for this
model family).
"""
from __future__ import annotations

import dataclasses as _dc
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..grids.column import ColumnGrid

__all__ = ["make_fused_step"]


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def make_fused_step(model, timestepper, ctx, input_sources=(), *,
                    block_cells: int = 2048, dt: float, interpret: bool = False):
    """Build ``fused(state) -> state`` executing one full step as one Pallas
    kernel over cell blocks. ``dt`` is static (baked into the trace)."""
    grid = model.grid
    cells = grid.cells
    block = min(block_cells, _round_up(cells, 128))
    n_blocks = -(-cells // block)
    padded = n_blocks * block

    for src in input_sources:
        if hasattr(src, "times"):
            raise ValueError("fused step supports only static input sources")

    # the kernel operates on one block of columns: give the physics a grid
    # whose cells axis is the block width, with coordinate arrays supplied as
    # traced kernel inputs (Pallas requires constants as explicit inputs)
    block_grid = ColumnGrid(cells=block, vertical=grid.vertical, nf=grid.nf)

    def step_fn(state, zc, zf, dz, dzf):
        g = block_grid.with_traced_coords(zc, zf, dz, dzf)
        m = _dc.replace(model, grid=g)
        return timestepper.step(m, state, ctx, input_sources, dt)

    coord_arrays = (grid.z_centers, grid.z_faces, grid.dz, grid.dz_faces)

    def _to2d(leaf):
        leaf = jnp.asarray(leaf)
        if leaf.ndim == 0:
            return leaf[None, None]
        if leaf.ndim == 1:
            return leaf[None, :]
        return leaf

    def _pad(leaf):
        if leaf.shape[-1] == padded or leaf.shape == (1, 1):
            return leaf
        return jnp.pad(leaf, ((0, 0), (0, padded - leaf.shape[-1])), mode="edge")

    def fused(state):
        from .vertical_ops import force_concat_shifts

        leaves, treedef = jax.tree_util.tree_flatten(state)
        ndims = [jnp.ndim(l) for l in leaves]

        # sample block state (abstract) for closure conversion
        def block_like(leaf):
            if jnp.ndim(leaf) == 0:
                return jax.ShapeDtypeStruct((), leaf.dtype)
            if jnp.ndim(leaf) == 1:
                return jax.ShapeDtypeStruct((block,), leaf.dtype)
            return jax.ShapeDtypeStruct((leaf.shape[0], block), leaf.dtype)

        sample = jax.tree_util.tree_unflatten(
            treedef, [block_like(l) for l in leaves])
        coord_samples = [jax.ShapeDtypeStruct(c.shape, c.dtype)
                         for c in coord_arrays]
        # Mosaic cannot lower negative `lax.pad` (trimming) — trace the
        # physics with the bit-identical concat shift lowering instead.
        with force_concat_shifts():
            converted, extra_consts = jax.closure_convert(step_fn, sample,
                                                          *coord_samples)
        consts = list(coord_arrays) + list(extra_consts)
        consts2d = [_to2d(c) for c in consts]

        arrays = [_pad(_to2d(l)) for l in leaves]
        n_state = len(arrays)

        def spec_for(a, cell_blocked):
            if cell_blocked and a.shape != (1, 1):
                return pl.BlockSpec((a.shape[0], block),
                                    lambda i, _r=a.shape[0]: (0, i))
            return pl.BlockSpec(a.shape, lambda i: (0, 0))

        cell_blocked_in = [ndims[k] >= 1 for k in range(n_state)]
        in_specs = ([spec_for(a, cb) for a, cb in zip(arrays, cell_blocked_in)]
                    + [spec_for(c, False) for c in consts2d])
        out_specs = [spec_for(a, cb) for a, cb in zip(arrays, cell_blocked_in)]
        out_shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrays]

        def kernel(*refs):
            ins = refs[:n_state]
            const_refs = refs[n_state:n_state + len(consts2d)]
            outs = refs[n_state + len(consts2d):]
            block_leaves = []
            for k in range(n_state):
                val = ins[k][...]
                if ndims[k] == 0:
                    val = jnp.reshape(val, ())
                elif ndims[k] == 1:
                    val = jnp.squeeze(val, axis=0)
                block_leaves.append(val)
            const_vals = []
            for cr, c in zip(const_refs, consts):
                v = cr[...]
                if jnp.ndim(c) == 0:
                    v = jnp.reshape(v, ())
                elif jnp.ndim(c) == 1:
                    v = jnp.squeeze(v, axis=0)
                const_vals.append(v)
            st = jax.tree_util.tree_unflatten(treedef, block_leaves)
            out_st = converted(st, *const_vals)
            out_leaves = jax.tree_util.tree_leaves(out_st)
            for k in range(n_state):
                val = out_leaves[k]
                outs[k][...] = jnp.reshape(val, outs[k].shape)

        out_arrays = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
        )(*arrays, *consts2d)

        new_leaves = []
        for k in range(n_state):
            arr = out_arrays[k]
            if ndims[k] == 0:
                new_leaves.append(arr[0, 0])
            elif ndims[k] == 1:
                new_leaves.append(arr[0, :cells])
            else:
                new_leaves.append(arr[:, :cells])
        return jax.tree_util.tree_unflatten(treedef, new_leaves)

    return fused
