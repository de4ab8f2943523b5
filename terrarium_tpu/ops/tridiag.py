"""Batched tridiagonal (Thomas) solver.

New capability relative to the reference (which has only explicit steppers;
see SURVEY §2.3): per-column implicit solves batched over the packed cell
axis. Arrays are ``(Nz, cells)`` — the solve runs as a `lax.scan` over z with
``(cells,)`` carries, i.e. one vectorised forward sweep + back substitution
per column batch. A fused Pallas version lives in
:mod:`terrarium_tpu.ops.pallas_kernels` for the TPU hot path.

The scan formulation is differentiable (used by the jax.grad test battery).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["tridiag_solve"]


def tridiag_solve(a, b, c, d):
    """Solve ``a[k] x[k-1] + b[k] x[k] + c[k] x[k+1] = d[k]`` per column.

    Args:
        a: sub-diagonal ``(Nz, cells)``; ``a[0]`` is ignored.
        b: diagonal ``(Nz, cells)``.
        c: super-diagonal ``(Nz, cells)``; ``c[-1]`` is ignored.
        d: right-hand side ``(Nz, cells)``.

    Returns:
        x of shape ``(Nz, cells)``.
    """
    # forward elimination: c'_k = c_k / (b_k - a_k c'_{k-1}),
    #                      d'_k = (d_k - a_k d'_{k-1}) / (b_k - a_k c'_{k-1})
    def fwd(carry, xs):
        c_prev, d_prev = carry
        a_k, b_k, c_k, d_k = xs
        denom = b_k - a_k * c_prev
        c_new = c_k / denom
        d_new = (d_k - a_k * d_prev) / denom
        return (c_new, d_new), (c_new, d_new)

    zeros = jnp.zeros_like(b[0])
    a0 = a.at[0].set(0.0)
    (_, _), (c_prime, d_prime) = jax.lax.scan(fwd, (zeros, zeros), (a0, b, c, d),
                                              unroll=2)

    # back substitution: x_k = d'_k - c'_k x_{k+1}
    def bwd(x_next, xs):
        c_k, d_k = xs
        x_k = d_k - c_k * x_next
        return x_k, x_k

    _, x = jax.lax.scan(bwd, zeros, (c_prime, d_prime), unroll=2, reverse=True)
    return x
