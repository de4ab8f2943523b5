"""Snowpack process tests (extension beyond the reference — the reference
has no snow process; see terrarium_tpu/processes/snow.py docstring)."""
import numpy as np

import terrarium_tpu as tt


def _land_sim(air_T, snowfall=2.0e-7, swe0=0.0, rainfall=0.0, **model_kw):
    grid = tt.ColumnGrid.of(cells=2, spacing=tt.ExponentialSpacing(N=10),
                            nf=np.float64)
    soil = tt.SoilEnergyWaterCarbon(
        hydrology=tt.SoilHydrology(
            vertical_flow=tt.RichardsEq(),
            hydraulic_properties=tt.ConstantSoilHydraulics(
                swrc=tt.VanGenuchten(alpha=2.0, n=2.0),
                unsat_hydraulic_cond=tt.UnsatKVanGenuchten())))
    model = tt.LandModel(grid=grid, soil=soil, snow=tt.Snowpack(), **model_kw)
    return tt.initialize(
        model, tt.ForwardEuler(),
        initializers={"temperature": 1.0, "saturation_water_ice": 0.6,
                      "snow_water_equivalent": swe0},
        input_sources=(tt.FieldInputSource(fields={
            "air_temperature": air_T, "snowfall": snowfall,
            "rainfall": rainfall, "surface_shortwave_down": 200.0}),))


def test_snow_accumulates_when_cold():
    sim = _land_sim(air_T=-10.0, snowfall=2.0e-7)
    sim.run(steps=48, dt=300.0)
    swe = np.asarray(sim.state.snow_water_equivalent)
    # no melt below T_melt: SWE = snowfall * t exactly
    np.testing.assert_allclose(swe, 2.0e-7 * 48 * 300.0, rtol=1e-12)
    f = np.asarray(sim.state.snow_cover_fraction)
    assert np.all((0 < f) & (f < 1))


def test_snow_melt_budget_closes():
    """Warm, no precipitation: the pack drains at the degree-day rate, and
    the melt flux partitions EXACTLY into infiltration + runoff every step
    (melt + rain = infiltration + surface_runoff in DirectSurfaceRunoff)."""
    sim = _land_sim(air_T=5.0, snowfall=0.0, swe0=0.02)
    dt, steps = 300.0, 24
    swe0 = np.asarray(sim.state.snow_water_equivalent).copy()

    fluxes = []

    def record(s):
        st = s.state
        fluxes.append({k: np.asarray(st.auxiliary[k]).copy()
                       for k in ("snow_melt", "infiltration",
                                 "surface_runoff", "rainfall_ground")})

    sim.run(steps=steps, dt=dt, callbacks=[record], callback_interval=1)
    st = sim.state
    swe = np.asarray(st.snow_water_equivalent)
    melt_expected = tt.Snowpack().degree_day_factor * 5.0 * dt * steps
    np.testing.assert_allclose(swe0 - swe, melt_expected, rtol=1e-9)
    for f in fluxes:
        np.testing.assert_allclose(f["snow_melt"] + f["rainfall_ground"],
                                   f["infiltration"] + f["surface_runoff"],
                                   rtol=1e-12, atol=1e-18)
        assert np.all(f["snow_melt"] > 0)  # still melting throughout


def test_snow_albedo_feedback_raises_shortwave_up():
    """The conditional-default SnowCoverAlbedo raises SW_up when snow is on
    the ground."""
    sim_bare = _land_sim(air_T=-5.0, snowfall=0.0, swe0=0.0)
    sim_snow = _land_sim(air_T=-5.0, snowfall=0.0, swe0=0.5)
    assert isinstance(sim_snow.model.surface_energy_balance.albedo,
                      tt.SnowCoverAlbedo)
    sim_bare.timestep(300.0)
    sim_snow.timestep(300.0)
    up_bare = float(np.asarray(sim_bare.state.surface_shortwave_up)[0])
    up_snow = float(np.asarray(sim_snow.state.surface_shortwave_up)[0])
    assert up_snow > up_bare
    # deep snow: albedo approaches albedo_snow
    f = float(np.asarray(sim_snow.state.snow_cover_fraction)[0])
    assert f > 0.97
    assert up_snow > 0.75 * 200.0


def test_snow_custom_albedo_not_overridden():
    """A user-supplied (non-default) albedo is left alone."""
    seb = tt.SurfaceEnergyBalance(albedo=tt.PrescribedAlbedo())
    sim = _land_sim(air_T=0.0, surface_energy_balance=seb)
    assert isinstance(sim.model.surface_energy_balance.albedo,
                      tt.PrescribedAlbedo)
