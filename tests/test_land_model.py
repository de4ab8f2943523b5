"""Coupled LandModel and surface-energy tests.

Mirrors reference `test/coupled_models/land_model_tests.jl` (BC-coupling
wiring + post-step finiteness) and `test/surface_energy/skin_temperature.jl`
(implicit skin-temperature fixed point).
"""
import jax.numpy as jnp
import numpy as np

import terrarium_tpu as tt
from terrarium_tpu.ops.bcs import Flux, InputRef


def _land_sim(**kw):
    grid = tt.ColumnGrid.of(cells=4, spacing=tt.ExponentialSpacing(N=20),
                            nf=np.float64)
    model = tt.LandModel(grid=grid)
    defaults = dict(initializers={"temperature": 5.0,
                                  "saturation_water_ice": 0.8})
    defaults.update(kw)
    return tt.initialize(model, tt.ForwardEuler(), **defaults)


def test_land_model_bc_wiring():
    """ground_heat_flux is the energy top BC; infiltration appears negated as
    the water top BC (reference `land_model_tests.jl:22-35`)."""
    sim = _land_sim()
    bcs = sim.ctx.bcs
    energy_top = bcs["internal_energy"]["top"]
    assert isinstance(energy_top, Flux) and energy_top.value == "ground_heat_flux"
    water_top = bcs["saturation_water_ice"]["top"]
    assert isinstance(water_top, Flux)
    assert isinstance(water_top.value, InputRef)
    assert water_top.value.name == "infiltration" and water_top.value.scale == -1.0


def test_land_model_step_finite():
    """Full coupled step stays finite (reference `land_model_tests.jl:55-69`)."""
    sim = _land_sim()
    sim.run(steps=48, dt=300.0)
    st = sim.state
    for name in ("temperature", "internal_energy", "saturation_water_ice",
                 "skin_temperature", "ground_heat_flux", "sensible_heat_flux",
                 "latent_heat_flux", "surface_net_radiation", "surface_runoff",
                 "infiltration", "evaporation_ground"):
        assert np.all(np.isfinite(np.asarray(st[name]))), name


def test_land_model_energy_coupling_sign():
    """Strong shortwave forcing warms the ground: G < 0 (positive-up flux into
    the soil) and the top-layer temperature rises."""
    sim = _land_sim(input_sources=(
        tt.FieldInputSource(fields={
            "surface_shortwave_down": 800.0,
            "surface_longwave_down": 350.0,
            "air_temperature": 20.0,
            "windspeed": 2.0,
        }),))
    T_top0 = float(sim.state.temperature[-1, 0])
    sim.run(steps=24, dt=300.0)
    G = np.asarray(sim.state.ground_heat_flux)
    assert np.all(G < 0.0)  # energy flowing into the ground
    assert float(sim.state.temperature[-1, 0]) > T_top0


def test_implicit_skin_temperature_fixed_point():
    """Driving the SEB update repeatedly converges Ts to a fixed point
    (reference `test/surface_energy/skin_temperature.jl:37-46` drives 5
    iterations)."""
    sim = _land_sim()
    seb = sim.model.surface_energy_balance
    state = sim.state
    c, atmos = sim.model.constants, sim.model.atmosphere
    evtr = sim.model.surface_hydrology.evapotranspiration
    Ts_prev = np.asarray(state.skin_temperature)
    diffs = []
    for _ in range(6):
        state = seb.compute_surface_energy_fluxes(state, sim.model.grid, c,
                                                  atmos, evtr)
        Ts = np.asarray(state.skin_temperature)
        diffs.append(np.max(np.abs(Ts - Ts_prev)))
        Ts_prev = Ts
    assert diffs[-1] < 1e-6, diffs
    # energy balance closes at the fixed point: G = Rnet - Hs - Hl
    G = np.asarray(state.ground_heat_flux)
    resid = np.asarray(state.surface_net_radiation) \
        - np.asarray(state.sensible_heat_flux) \
        - np.asarray(state.latent_heat_flux) - G
    np.testing.assert_allclose(resid, 0.0, atol=1e-9)


def test_land_model_water_coupling():
    """Rainfall infiltrates through the -infiltration top BC: total column
    water after a rainy run exceeds the no-rain control (the top cell itself
    may still drain downward — Richards redistribution)."""

    def run(rain):
        grid = tt.ColumnGrid.of(cells=2, spacing=tt.ExponentialSpacing(N=20),
                                nf=np.float64)
        soil = tt.SoilEnergyWaterCarbon(
            hydrology=tt.SoilHydrology(
                vertical_flow=tt.RichardsEq(),
                hydraulic_properties=tt.ConstantSoilHydraulics(
                    swrc=tt.VanGenuchten(alpha=2.0, n=2.0),
                    unsat_hydraulic_cond=tt.UnsatKVanGenuchten())))
        model = tt.LandModel(grid=grid, soil=soil)
        sim = tt.initialize(
            model, tt.ForwardEuler(),
            initializers={"temperature": 5.0, "saturation_water_ice": 0.5},
            input_sources=(tt.FieldInputSource(fields={"rainfall": rain}),))
        sim.run(steps=12, dt=300.0)
        dz = np.asarray(sim.model.grid.vertical.dz)[:, None]
        total = np.sum(np.asarray(sim.state.saturation_water_ice) * dz, axis=0)
        return sim, total

    sim_wet, total_wet = run(rain=1.0e-6)
    sim_dry, total_dry = run(rain=0.0)
    assert np.all(np.asarray(sim_wet.state.infiltration) > 0)
    assert np.all(total_wet > total_dry)
    assert np.all(np.isfinite(np.asarray(sim_wet.state.saturation_water_ice)))
