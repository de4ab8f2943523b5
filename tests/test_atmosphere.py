"""Atmosphere process tests.

Working replacement for the reference's *orphaned and stale*
`test/atmosphere.jl` (never included by `runtests.jl`; references a removed
`TwoBandSolarRadiation` — SURVEY §4). Covers the August-Roche-Magnus vapor
pressure (frozen/unfrozen branches, `physics_utils.jl:54-73`), VPD and
humidity-deficit accessors (`prescribed_atmosphere.jl:152-180`), windspeed
clamping, aerodynamic resistance for constant and Monin-Obukhov drag, and
the input-variable bundle of `PrescribedAtmosphere`
(`prescribed_atmosphere.jl:45-99`).
"""
import jax.numpy as jnp
import numpy as np
import pytest

import terrarium_tpu as tt
from terrarium_tpu.constants import (PhysicalConstants, compute_vpd,
                                     saturation_vapor_pressure,
                                     vapor_pressure_to_specific_humidity)


def test_magnus_saturation_vapor_pressure():
    # e_sat(0 C) = 611 Pa exactly (both branches agree at 0)
    np.testing.assert_allclose(float(saturation_vapor_pressure(0.0)), 611.0,
                               rtol=1e-6)
    # unfrozen branch at 20 C: 611*exp(17.62*20/263.12) ~ 2333 Pa
    e20 = 611.0 * np.exp(17.62 * 20.0 / (20.0 + 243.12))
    np.testing.assert_allclose(float(saturation_vapor_pressure(20.0)), e20,
                               rtol=1e-6)
    # frozen branch at -20 C uses the ice coefficients
    em20 = 611.0 * np.exp(22.46 * -20.0 / (-20.0 + 272.62))
    np.testing.assert_allclose(float(saturation_vapor_pressure(-20.0)), em20,
                               rtol=1e-6)
    # monotonically increasing in T, finite over a wide (clamped) range
    T = jnp.linspace(-200.0, 200.0, 401)
    e = np.asarray(saturation_vapor_pressure(T))
    assert np.all(np.isfinite(e)) and np.all(e > 0)
    assert np.all(np.diff(e) >= 0)


def test_vpd_and_humidity_deficit():
    c = PhysicalConstants()
    pres, T = 101325.0, 15.0
    e_sat = float(saturation_vapor_pressure(T))
    # saturated air => VPD at the floor (0.1 Pa clamp)
    q_sat = c.eps * e_sat / (pres - (1.0 - c.eps) * e_sat)
    assert float(compute_vpd(c, pres, q_sat, T)) == pytest.approx(0.1, abs=0.2)
    # dry air => VPD ~ e_sat
    assert float(compute_vpd(c, pres, 0.0, T)) == pytest.approx(e_sat, rel=1e-6)
    # q(e(q)) roundtrip
    e = 1000.0
    q = vapor_pressure_to_specific_humidity(e, pres, c.eps)
    assert float(q) == pytest.approx(c.eps * e / pres, rel=1e-12)


def _seb_sim(atmos=None, **inputs):
    grid = tt.ColumnGrid.of(cells=3, spacing=tt.ExponentialSpacing(N=4),
                            nf=np.float64)
    model = tt.SurfaceEnergyModel(grid=grid,
                                  atmosphere=atmos or tt.PrescribedAtmosphere())
    defaults = {"air_temperature": 10.0, "windspeed": 4.0,
                "surface_shortwave_down": 300.0}
    defaults.update(inputs)
    return tt.initialize(model, tt.ForwardEuler(),
                         input_sources=(tt.FieldInputSource(fields=defaults),))


def test_prescribed_atmosphere_inputs_and_defaults():
    sim = _seb_sim()
    atmos = sim.model.atmosphere
    state = sim.state
    # declared input bundle materialized with reference defaults
    np.testing.assert_allclose(np.asarray(atmos.air_temperature(state)), 10.0)
    np.testing.assert_allclose(np.asarray(state.inputs["air_pressure"]),
                               101325.0)  # std pressure default
    np.testing.assert_allclose(np.asarray(state.inputs["CO2"]), 380.0)  # ppm
    np.testing.assert_allclose(np.asarray(atmos.rainfall(state)), 0.0)
    np.testing.assert_allclose(np.asarray(atmos.snowfall(state)), 0.0)


def test_windspeed_clamp():
    sim = _seb_sim(windspeed=0.0)
    atmos = sim.model.atmosphere
    V = np.asarray(atmos.windspeed(sim.state))
    np.testing.assert_allclose(V, atmos.min_windspeed)


def test_constant_aerodynamic_resistance():
    """r_a = 1/(C_h V), C_h = 1.2e-3 (reference `aerodynamics.jl:6-18`)."""
    sim = _seb_sim(windspeed=5.0)
    atmos = sim.model.atmosphere
    c = sim.model.constants
    ra = np.asarray(atmos.aerodynamic_resistance(sim.state, c))
    np.testing.assert_allclose(ra, 1.0 / (1.2e-3 * 5.0), rtol=1e-12)


def test_monin_obukhov_limits():
    """MO drag: neutral stability reproduces the log-law neutral C_h; an
    unstable surface (Ts > Ta) gives larger drag, a stable one smaller."""
    mo = tt.MoninObukhovAerodynamics()
    c = PhysicalConstants()

    def drag(Ts, Ta):
        sim = _seb_sim(tt.PrescribedAtmosphere(aerodynamics=mo),
                       air_temperature=Ta)
        state = sim.state.update(skin_temperature=jnp.full(3, Ts))
        return float(np.asarray(
            mo.drag_coefficient(state, sim.model.atmosphere, c))[0])

    C_neutral = drag(10.0, 10.0)
    k = c.kappa
    expected = k**2 / (np.log(mo.z / mo.z0m) * np.log(mo.z / mo.z0h))
    np.testing.assert_allclose(C_neutral, expected, rtol=1e-6)
    assert drag(15.0, 10.0) > C_neutral  # unstable: enhanced exchange
    assert drag(5.0, 10.0) < C_neutral  # stable: suppressed exchange


def test_rain_snow_partitioning_inputs():
    """RainSnow supplies separate rainfall/snowfall inputs
    (reference `prescribed_atmosphere.jl:45-99`)."""
    sim = _seb_sim(rainfall=2.0e-8, snowfall=1.0e-8)
    atmos = sim.model.atmosphere
    np.testing.assert_allclose(np.asarray(atmos.rainfall(sim.state)), 2.0e-8)
    np.testing.assert_allclose(np.asarray(atmos.snowfall(sim.state)), 1.0e-8)


def test_vpd_over_warmer_surface_increases():
    sim = _seb_sim(air_temperature=10.0)
    atmos = sim.model.atmosphere
    c = sim.model.constants
    vpd_air = np.asarray(atmos.compute_vpd(sim.state, c))
    vpd_warm = np.asarray(atmos.compute_vpd(sim.state, c, Ts=20.0))
    assert np.all(vpd_warm > vpd_air)
    dq = np.asarray(atmos.humidity_vpd(sim.state, c))
    # Delta q = eps * VPD / p
    np.testing.assert_allclose(
        dq, c.eps * vpd_air / np.asarray(sim.state.inputs["air_pressure"]),
        rtol=1e-12)
