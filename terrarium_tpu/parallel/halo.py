"""Lateral (cell-axis) halo exchange — the north-star extension point.

The reference explicitly defers lateral coupling ("2D/3D flow",
`README.md:123`); every shipped process is laterally independent. This
module provides the TPU-native machinery a lateral operator needs
(SURVEY §2.11: "any future lateral coupling becomes a halo exchange over
ICI"), plus a reference lateral-diffusion operator wired through the
generic forcing hooks:

* :func:`neighbor_shift` — value of the left/right neighbor column along
  the packed cells axis, edge-replicated (zero-flux ends). Outside
  `shard_map` it is a plain pad-shift: under jit with cells-sharded
  operands XLA's SPMD partitioner inserts the boundary
  `collective-permute` automatically (verified in tests). Inside
  `shard_map` pass ``axis_name``: the single edge column is exchanged
  explicitly with `lax.ppermute` and everything else stays local — the
  halo traffic is one column per shard boundary per step, riding ICI.
* :func:`lateral_diffusion_forcing` — `d(var)/dt += c*(x_{i-1} - 2 x_i +
  x_{i+1})/dx^2`, attachable to ANY prognostic via
  ``initialize(..., forcings={var: fn})`` with no model changes.

NOTE the packed cell axis of a `ColumnRingGrid` interleaves latitude
rings, so index-neighbors are only physical neighbors within a ring; a
production lateral operator would build its adjacency from the ring
topology. This module deliberately ships the COMMS pattern (and uses
index adjacency, which is exact for `ColumnGrid` transects).

Lateral coupling is an XLA-path feature: the fused Pallas kernel
processes disjoint cell blocks, so a cross-cell shift inside it would
read stale block edges. Keep ``fused_inner_steps=None`` for laterally
coupled runs (the XLA lean scan remains collective-free EXCEPT the one
boundary permute this operator asks for).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["neighbor_shift", "lateral_diffusion_forcing"]


def neighbor_shift(x, shift: int, axis_name: Optional[str] = None):
    """Neighbor values along the trailing (cells) axis: ``out[..., i] =
    x[..., i - shift]`` with edge replication at the global ends
    (``shift`` is +1 for the left neighbor, -1 for the right).

    With ``axis_name`` (inside `jax.shard_map`), the edge column crossing
    the shard boundary is fetched with `lax.ppermute`; the global ends
    still replicate their own edge (zero-flux)."""
    if shift not in (1, -1):
        raise ValueError("neighbor_shift supports shift = +-1")
    if axis_name is None:
        if shift == 1:
            return jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
        return jnp.concatenate([x[..., 1:], x[..., -1:]], axis=-1)

    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    if shift == 1:
        # local right-shift; first local column <- previous shard's last
        halo = jax.lax.ppermute(x[..., -1:], axis_name,
                                [(i, i + 1) for i in range(n - 1)])
        edge = jnp.where(idx == 0, x[..., :1], halo)
        return jnp.concatenate([edge, x[..., :-1]], axis=-1)
    halo = jax.lax.ppermute(x[..., :1], axis_name,
                            [(i + 1, i) for i in range(n - 1)])
    edge = jnp.where(idx == n - 1, x[..., -1:], halo)
    return jnp.concatenate([x[..., 1:], edge], axis=-1)


def lateral_diffusion_forcing(coeff: float, dx: float,
                              variable: str = "internal_energy",
                              axis_name: Optional[str] = None):
    """A forcing ``fn(state, grid)`` adding lateral diffusion of the named
    prognostic along the cell axis: ``c * (x_l - 2x + x_r) / dx**2`` with
    zero-flux global ends. Attach via ``initialize(..., forcings=
    {variable: fn})`` (reference forcing hooks, `src/forcings.jl:13-19`).
    Explicit-diffusion stability requires ``coeff * dt / dx**2 <= 0.5``."""

    def fn(state, grid):
        x = state[variable]
        left = neighbor_shift(x, 1, axis_name)
        right = neighbor_shift(x, -1, axis_name)
        return coeff * (left - 2.0 * x + right) / (dx * dx)

    return fn
