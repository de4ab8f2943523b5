"""Surface-energy and atmosphere tests.

Covers the reference's SEB schemes (incl. the stale/orphaned
`test/atmosphere.jl`, fixed and wired in per SURVEY §4) plus the extensions:
Monin-Obukhov drag and the energy-consistent ground-flux form.
"""
import jax.numpy as jnp
import numpy as np

import terrarium_tpu as tt
from terrarium_tpu.constants import saturation_vapor_pressure


def test_saturation_vapor_pressure():
    """Magnus formula branches + robustness clamp."""
    e0 = float(saturation_vapor_pressure(0.0))
    assert np.isclose(e0, 611.0)
    assert float(saturation_vapor_pressure(20.0)) > e0
    assert float(saturation_vapor_pressure(-20.0)) < e0
    # frozen branch is below the liquid branch extended (supersaturation)
    assert np.isfinite(float(saturation_vapor_pressure(-500.0)))  # clamp


def test_atmosphere_accessors():
    grid = tt.ColumnGrid.of(cells=2, spacing=tt.ExponentialSpacing(N=5),
                            nf=np.float64)
    model = tt.SurfaceEnergyModel(grid=grid)
    sim = tt.initialize(model, tt.ForwardEuler())
    atmos = model.atmosphere
    st = sim.state
    np.testing.assert_allclose(atmos.air_temperature(st), 10.0)
    np.testing.assert_allclose(atmos.air_pressure(st), 101325.0)
    np.testing.assert_allclose(atmos.windspeed(st), 0.1)
    # r_a = 1/(C_h * V)
    np.testing.assert_allclose(atmos.aerodynamic_resistance(st),
                               1.0 / (1.2e-3 * 0.1))
    # VPD positive and clamped
    assert np.all(np.asarray(atmos.compute_vpd(st, model.constants)) >= 0.1)


def test_surface_energy_model_diagnosed_fluxes():
    """Standalone SEB model (reference `surface_energy_model.jl`): diagnosed
    radiative fluxes follow alpha*SW and eps*sigma*T^4 + (1-eps)*LW."""
    grid = tt.ColumnGrid.of(cells=2, spacing=tt.ExponentialSpacing(N=5),
                            nf=np.float64)
    model = tt.SurfaceEnergyModel(grid=grid)
    sim = tt.initialize(
        model, tt.ForwardEuler(),
        initializers={"ground_temperature": 12.0, "skin_temperature": 12.0},
        input_sources=(tt.FieldInputSource(fields={
            "surface_shortwave_down": 500.0, "surface_longwave_down": 300.0}),))
    sim.timestep(300.0)
    st = sim.state
    np.testing.assert_allclose(st.surface_shortwave_up, 0.3 * 500.0)
    Ts = np.asarray(st.skin_temperature)
    expected_lw = 0.97 * 5.6704e-8 * (Ts + 273.15) ** 4 + 0.03 * 300.0
    np.testing.assert_allclose(st.surface_longwave_up, expected_lw, rtol=1e-10)
    # residual closes: G = Rnet - Hs - Hl (reference form)
    resid = (np.asarray(st.surface_net_radiation) - np.asarray(st.sensible_heat_flux)
             - np.asarray(st.latent_heat_flux) - np.asarray(st.ground_heat_flux))
    np.testing.assert_allclose(resid, 0.0, atol=1e-9)


def test_monin_obukhov_drag():
    """MO drag exceeds neutral-log drag in unstable conditions and reduces it
    in stable conditions (extension beyond the reference's constant C_h)."""
    grid = tt.ColumnGrid.of(cells=1, spacing=tt.ExponentialSpacing(N=5),
                            nf=np.float64)
    mo = tt.MoninObukhovAerodynamics()
    atmos = tt.PrescribedAtmosphere(aerodynamics=mo)
    model = tt.SurfaceEnergyModel(grid=grid, atmosphere=atmos)
    sim = tt.initialize(model, tt.ForwardEuler(),
                        input_sources=(tt.FieldInputSource(fields={"windspeed": 2.0}),))
    c = model.constants
    kappa = c.kappa
    Ch_neutral = kappa**2 / (np.log(mo.z / mo.z0m) * np.log(mo.z / mo.z0h))

    # unstable: surface much warmer than air
    st_unstable = sim.state.update(skin_temperature=jnp.full(1, 30.0),
                                   air_temperature=jnp.full(1, 10.0))
    Ch_u = float(np.asarray(mo.drag_coefficient(st_unstable, atmos, c)).ravel()[0])
    # stable: surface colder than air
    st_stable = sim.state.update(skin_temperature=jnp.full(1, -10.0),
                                 air_temperature=jnp.full(1, 10.0))
    Ch_s = float(np.asarray(mo.drag_coefficient(st_stable, atmos, c)).ravel()[0])
    assert Ch_u > Ch_neutral > Ch_s
    assert 0 < Ch_s and np.isfinite(Ch_u)


def test_consistent_ground_flux_form_sign():
    """With the energy-consistent form, stronger evaporative cooling reduces
    the energy entering the ground; with the reference form it (wrongly)
    increases it. Both must close their respective residuals."""
    grid = tt.ColumnGrid.of(cells=1, spacing=tt.ExponentialSpacing(N=5),
                            nf=np.float64)

    def ground_flux(form, q_air):
        seb = tt.SurfaceEnergyBalance(ground_flux_form=form)
        model = tt.SurfaceEnergyModel(grid=grid, surface_energy_balance=seb)
        sim = tt.initialize(
            model, tt.ForwardEuler(),
            initializers={"ground_temperature": 15.0, "skin_temperature": 15.0},
            input_sources=(tt.FieldInputSource(fields={
                "surface_shortwave_down": 600.0, "windspeed": 3.0,
                "specific_humidity": q_air}),))
        sim.timestep(300.0)
        return float(sim.state.ground_heat_flux[0])

    # drier air -> more evaporation (larger H_l)
    for form, expect_drier_ground_gains_less in (("consistent", True),
                                                 ("reference", False)):
        G_moist = ground_flux(form, 8.0e-3)
        G_dry = ground_flux(form, 1.0e-4)
        # G positive up: ground gains -G
        gains_less = (-G_dry) < (-G_moist)
        assert gains_less == expect_drier_ground_gains_less, (form, G_moist, G_dry)


def test_stable_coupled_run_with_mo_and_consistent_seb():
    """MO drag + consistent SEB + strong forcing integrates a day stably
    (the configuration that diverges with the reference G form)."""
    grid = tt.ColumnGrid.of(cells=1, spacing=tt.ExponentialSpacing(N=15),
                            nf=np.float32)
    props = tt.ConstantSoilHydraulics(
        swrc=tt.VanGenuchten(alpha=2.0, n=2.0),
        unsat_hydraulic_cond=tt.UnsatKVanGenuchten(), sat_hydraulic_cond=1e-6)
    soil = tt.SoilEnergyWaterCarbon(
        strat=tt.HomogeneousStratigraphy(texture=tt.SoilTexture.preset("loam")),
        hydrology=tt.SoilHydrology(vertical_flow=tt.RichardsEq(),
                                   hydraulic_properties=props))
    model = tt.LandModel(
        grid=grid, soil=soil,
        atmosphere=tt.PrescribedAtmosphere(
            aerodynamics=tt.MoninObukhovAerodynamics()),
        surface_energy_balance=tt.SurfaceEnergyBalance.consistent(),
        surface_hydrology=tt.SurfaceHydrology(
            evapotranspiration=tt.BareGroundEvaporation.consistent_units()))
    sim = tt.initialize(
        model, tt.ForwardEuler(),
        initializers={"temperature": 10.0, "saturation_water_ice": 0.7},
        input_sources=(tt.FieldInputSource(fields={
            "surface_shortwave_down": 500.0, "air_temperature": 15.0,
            "windspeed": 2.0, "rainfall": 5.0e-8}),))
    sim.run(steps=288, dt=300.0)  # one day
    st = sim.state
    assert np.all(np.isfinite(np.asarray(st.temperature)))
    Ts = float(st.skin_temperature[0])
    assert -20.0 < Ts < 60.0, Ts  # physically plausible equilibrium


def test_implicit_skin_temperature_fixed_point_converges():
    """Repeated SEB sweeps converge the implicit skin temperature to the
    half-cell flux balance Ts = Tg - G*dz1/(2 kappa_s) (the reference test
    drives 5 iterations to convergence, `skin_temperature.jl:37-46`)."""
    grid = tt.ColumnGrid.of(cells=2, spacing=tt.ExponentialSpacing(N=5),
                            nf=np.float64)
    model = tt.SurfaceEnergyModel(grid=grid)
    sim = tt.initialize(
        model, tt.ForwardEuler(),
        initializers={"ground_temperature": 10.0, "skin_temperature": 0.0},
        input_sources=(tt.FieldInputSource(fields={
            "surface_shortwave_down": 400.0, "surface_longwave_down": 320.0,
            "air_temperature": 8.0}),))

    seb = sim.model.surface_energy_balance
    atmos = sim.model.atmosphere
    constants = sim.model.constants
    state = sim.state
    deltas = []
    for _ in range(5):
        Ts_prev = np.asarray(state.skin_temperature).copy()
        state = seb.compute_surface_energy_fluxes(state, grid, constants, atmos)
        deltas.append(float(np.max(np.abs(np.asarray(state.skin_temperature)
                                          - Ts_prev))))
    # geometric contraction (ratio ~0.06/sweep) and convergence after 5
    assert deltas[-1] < 1e-4, deltas
    assert deltas[-1] < deltas[0]
    # converged state satisfies the half-cell balance exactly
    dz1 = float(np.asarray(grid.dz)[-1, 0])
    kappa = seb.skin_temperature.kappa_s
    Ts = np.asarray(state.skin_temperature)
    Tg = np.asarray(state.ground_temperature)
    G = np.asarray(state.ground_heat_flux)
    np.testing.assert_allclose(Ts, Tg - G * dz1 / (2.0 * kappa), atol=1e-3)
