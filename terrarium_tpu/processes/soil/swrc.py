"""Soil water retention curves (SWRC).

The reference re-exports `VanGenuchten` / `BrooksCorey` from FreezeCurves.jl
(`src/Terrarium.jl:42,72`); since that package is external we implement the
standard formulations here. A SWRC maps matric pressure head ``psi_m`` [m] to
volumetric water(+ice) content ``theta`` in ``[theta_res, theta_sat]`` and
back (used by the saturation<->pressure closure,
`src/processes/soil/hydrology/soil_hydraulic_closures.jl`).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ...ops.fastpow import fast_pow

__all__ = ["VanGenuchten", "BrooksCorey"]


def one_minus_eps(x, floor):
    """``1 - eps`` upper clip for effective saturation that SURVIVES the
    state dtype: downstream guards rely on ``se**p - 1`` (or ``1 - se**p``)
    staying representable above 0, so ``eps`` must be well above the ulp of
    1 in ``x``'s dtype (64 ulp ≈ 7.6e-6 in f32). In f64 the stricter
    ``floor`` wins, leaving the original f64 behavior unchanged. With the
    f32-blind literal (1e-12 / 1e-9), a saturated cell evaluated
    ``sqrt(0)`` whose reverse-mode derivative is Inf — and `lax.scan`
    rollouts propagate explicit zero cotangents through every carry leaf,
    turning 0*Inf into NaN gradients (round-3 fix; the direct, un-scanned
    step DCE'd the path and hid it)."""
    import numpy as np

    eps = np.finfo(jnp.result_type(x, 1.0)).eps
    return 1.0 - max(float(floor), 64.0 * float(eps))


@dataclasses.dataclass(frozen=True)
class VanGenuchten:
    """Van Genuchten (1980) retention curve.

    theta(psi) = theta_res + (theta_sat - theta_res) * (1 + (-alpha*psi)^n)^(-m)
    for psi < 0, theta_sat otherwise, with m = 1 - 1/n.
    """

    alpha: float = 4.0  # inverse air-entry suction [1/m]
    n: float = 2.0  # pore-size distribution index
    theta_res: float = 0.0  # residual water content
    # lower clamp on the inverse [m]: at theta -> theta_res the exact inverse
    # diverges to -inf, which makes Darcy gradients explode in fully-drained
    # cells (the reference's unclamped Julia math produces ~-1e38 there and
    # NaNs); -1e4 m is far beyond any physical suction (wilting ~ -150 m)
    psi_min: float = -1.0e4

    def __call__(self, psi, theta_sat):
        m = 1.0 - 1.0 / self.n
        psi_neg = jnp.minimum(psi, 0.0)
        theta_unsat = self.theta_res + (theta_sat - self.theta_res) * fast_pow(
            1.0 + fast_pow(-self.alpha * psi_neg, self.n), -m)
        return jnp.where(psi < 0.0, theta_unsat, theta_sat)

    def inverse(self, theta, theta_sat):
        """psi_m(theta); returns 0 at/above saturation.

        The saturated branch is computed on a clamped ``se`` strictly below 1
        (double-where pattern): at se == 1 the inner derivative of
        ``(se^(-1/m) - 1)^(1/n)`` is 0^(1/n - 1) = inf, and JAX's masked
        `where` gradient would produce 0 * inf = NaN otherwise."""
        m = 1.0 - 1.0 / self.n
        se = (theta - self.theta_res) / (theta_sat - self.theta_res)
        se_safe = jnp.clip(se, 1e-8, one_minus_eps(theta, 1e-12))
        psi = -(1.0 / self.alpha) * fast_pow(
            fast_pow(se_safe, -1.0 / m) - 1.0, 1.0 / self.n)
        psi = jnp.maximum(psi, self.psi_min)
        return jnp.where(se >= 1.0, 0.0, psi)

    def inverse_deriv(self, theta, theta_sat, clamp=1.0e6):
        """d(psi_m)/d(theta), clamped; 0 at/above saturation (used by the
        implicit stepper's Jacobian linearization)."""
        m = 1.0 - 1.0 / self.n
        dth = theta_sat - self.theta_res
        se = jnp.clip((theta - self.theta_res) / dth, 1e-6,
                      one_minus_eps(theta, 1e-9))
        core = fast_pow(se, -1.0 / m) - 1.0
        dpsi_dse = (1.0 / (self.alpha * self.n * m)) \
            * fast_pow(core, (1.0 - self.n) / self.n) \
            * fast_pow(se, -(1.0 + m) / m)
        d = dpsi_dse / dth
        sat_mask = (theta - self.theta_res) / dth >= 1.0
        return jnp.where(sat_mask, 0.0, jnp.clip(d, 0.0, clamp))


@dataclasses.dataclass(frozen=True)
class BrooksCorey:
    """Brooks & Corey (1964) retention curve.

    theta(psi) = theta_res + (theta_sat - theta_res) * (psi_s / -psi)^lambda
    for psi < -psi_s, theta_sat otherwise. ``psi_s`` is the (positive)
    air-entry suction in meters.
    """

    psi_s: float = 0.01  # air-entry suction [m]
    lam: float = 0.2  # pore-size distribution index
    theta_res: float = 0.0
    psi_min: float = -1.0e4  # see VanGenuchten.psi_min

    def __call__(self, psi, theta_sat):
        psi_safe = jnp.minimum(psi, -self.psi_s)
        theta_unsat = self.theta_res + (theta_sat - self.theta_res) * fast_pow(
            self.psi_s / -psi_safe, self.lam)
        return jnp.where(psi < -self.psi_s, theta_unsat, theta_sat)

    def inverse(self, theta, theta_sat):
        se = (theta - self.theta_res) / (theta_sat - self.theta_res)
        se = jnp.clip(se, 1e-8, 1.0)
        psi = -self.psi_s * fast_pow(se, -1.0 / self.lam)
        psi = jnp.maximum(psi, self.psi_min)
        return jnp.where(se >= 1.0, 0.0, psi)

    def inverse_deriv(self, theta, theta_sat, clamp=1.0e6):
        """d(psi_m)/d(theta), clamped; 0 at/above saturation."""
        dth = theta_sat - self.theta_res
        se_raw = (theta - self.theta_res) / dth
        se = jnp.clip(se_raw, 1e-6, 1.0)
        d = (self.psi_s / self.lam) * fast_pow(se, -1.0 / self.lam - 1.0) / dth
        return jnp.where(se_raw >= 1.0, 0.0, jnp.clip(d, 0.0, clamp))
