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

#: Use the division-free Newton cbrt for third-roots inside Pallas kernel
#: tracing (f32 only). MEASURED SLOWER on the axon chip and kept off: the
#: VPU's hardware exp/log makes the pow fallback ~9% faster end-to-end than
#: the ~15-op serial Newton chain, and Mosaic compile time jumped 5.9 s ->
#: 301 s (experiments/ab_fused_rollout.py, fused lean rollout at block 512 /
#: inner 144: pow-cbrt 450.9 vs Newton 409.9 M cells*steps/s in-process).
NEWTON_CBRT = False

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


def _cbrt_newton_f32(x):
    """Division-free cbrt for non-negative f32 ``x``: inverse-cbrt bit-trick
    seed + 3 Newton steps on ``r -> r(4 - x r^3)/3`` (r = x^(-1/3)), then
    ``cbrt = x r^2``. Max error ~4 ulp over [1e-12, 1e3]; exact at 0.

    Written for Pallas kernels (Mosaic has no cbrt lowering) but MEASURED
    SLOWER than the exp/log pow fallback there — see ``NEWTON_CBRT`` above;
    kept as a flag-gated variant. The seed sits behind `stop_gradient`
    (bitcasts have no JVP rule); AD through the Newton iterations recovers
    the derivative to the same few-ulp accuracy, and at x = 0 it is
    large-but-FINITE (no 0*Inf NaNs under scanned-rollout zero
    cotangents)."""
    import jax

    i = jax.lax.bitcast_convert_type(x, jnp.int32)
    r = jax.lax.bitcast_convert_type(jnp.int32(0x54A21D2A) - i // 3,
                                     jnp.float32)
    r = jax.lax.stop_gradient(r)
    for _ in range(3):
        r = r * (4.0 - x * r * r * r) * (1.0 / 3.0)
    return x * r * r


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
        # (signalled by force_concat_shifts) third-roots fall back to pow
        # (measured FASTER than the Newton form there; see NEWTON_CBRT).
        from .vertical_ops import _FORCE_CONCAT

        for denom in (1, 2, 3):
            num = p * denom
            if abs(num - round(num)) < 1e-12 and abs(round(num)) <= _MAX_NUM:
                num = int(round(num))
                if denom == 1:
                    root = x
                elif denom == 2:
                    root = jnp.sqrt(x)
                elif not _FORCE_CONCAT:
                    root = jnp.cbrt(x)
                elif NEWTON_CBRT and jnp.result_type(x, 1.0) == jnp.float32:
                    root = _cbrt_newton_f32(x)
                else:
                    continue  # Mosaic tracing: keep the pow
                return _ipow(root, num)
    return x ** p
