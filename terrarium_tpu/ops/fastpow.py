"""Static-exponent power shortcuts.

``x ** p`` with a traced base lowers to ``exp(p * log(x))`` on the TPU VPU —
two transcendentals (~10-20 cycles each) per element. The Van Genuchten /
Mualem / Brooks-Corey chains evaluate 6-10 such pows per element per step,
which dominates the VPU-bound closure cost. Their exponents are STATIC
(trace-time python floats derived from the retention-curve parameters), and
for the common parameter choices (integer / half-integer / third-integer n)
they reduce to multiplies, `sqrt`, and `cbrt` — exact up to float rounding
order.

``fast_pow(x, p)`` applies the shortcut when ``p`` is a small rational with
denominator 1, 2, or 3 and falls back to ``x ** p`` otherwise, so arbitrary
parameters keep working. Toggle ``FAST_POW = False`` to force the pow
lowering everywhere (A/B: experiments/ab_fastpow.py).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["fast_pow"]

FAST_POW = True

_MAX_NUM = 12  # largest numerator expanded into multiplies


def _ipow(x, k: int):
    """x**k for integer k by binary powering (k != 0)."""
    if k < 0:
        return 1.0 / _ipow(x, -k)
    y = None
    base = x
    while k:
        if k & 1:
            y = base if y is None else y * base
        k >>= 1
        if k:
            base = base * base
    return y


def fast_pow(x, p):
    """``x ** p`` for non-negative ``x`` and a STATIC exponent ``p`` (see
    module docstring). Exact zero/one exponents short-circuit."""
    p = float(p)
    if p == 0.0:
        return jnp.ones_like(x)
    if p == 1.0:
        return x
    if FAST_POW:
        # Mosaic has no cbrt lowering — inside Pallas kernel tracing
        # (signalled by force_concat_shifts) only the 1/2-denominator
        # shortcuts apply; third-roots fall back to pow (which Mosaic
        # lowers fine).
        from .vertical_ops import _FORCE_CONCAT

        for denom in (1, 2) if _FORCE_CONCAT else (1, 2, 3):
            num = p * denom
            if abs(num - round(num)) < 1e-12 and abs(round(num)) <= _MAX_NUM:
                num = int(round(num))
                if denom == 1:
                    root = x
                elif denom == 2:
                    root = jnp.sqrt(x)
                else:
                    root = jnp.cbrt(x)
                return _ipow(root, num)
    return x ** p
