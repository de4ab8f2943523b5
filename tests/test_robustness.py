"""Extreme-forcing robustness matrix.

The reference NaNs under several realistic extremes (acknowledged rough
edges, README "deviations"); the consistent-mode configuration must
integrate every corner of the forcing envelope finitely. One jitted rollout
is compiled once and reused for all corners (same shapes).
"""
import itertools

import numpy as np
import pytest

import terrarium_tpu as tt


@pytest.fixture(scope="module")
def consistent_sim():
    grid = tt.ColumnGrid.of(cells=1, spacing=tt.ExponentialSpacing(N=12),
                            nf=np.float32)
    props = tt.ConstantSoilHydraulics(
        swrc=tt.VanGenuchten(alpha=2.0, n=2.0),
        unsat_hydraulic_cond=tt.UnsatKVanGenuchten())
    soil = tt.SoilEnergyWaterCarbon(
        strat=tt.HomogeneousStratigraphy(texture=tt.SoilTexture.preset("loam")),
        hydrology=tt.SoilHydrology(vertical_flow=tt.RichardsEq(),
                                   hydraulic_properties=props))
    model = tt.LandModel(
        grid=grid, soil=soil, snow=tt.Snowpack(),
        atmosphere=tt.PrescribedAtmosphere(
            aerodynamics=tt.MoninObukhovAerodynamics()),
        surface_energy_balance=tt.SurfaceEnergyBalance.consistent(),
        surface_hydrology=tt.SurfaceHydrology(
            canopy_interception=tt.NoCanopyInterception(),
            evapotranspiration=tt.BareGroundEvaporation.consistent_units(),
            surface_runoff=tt.DirectSurfaceRunoff.consistent()))
    return tt.initialize(
        model, tt.ForwardEuler(),
        initializers={"temperature": 2.0, "saturation_water_ice": 0.5},
        input_sources=(tt.FieldInputSource(fields={
            "air_temperature": 10.0, "surface_shortwave_down": 300.0,
            "windspeed": 2.0, "rainfall": 0.0, "snowfall": 0.0}),))


CORNERS = list(itertools.product(
    (-40.0, 45.0),      # air temperature [degC]
    (0.0, 1000.0),      # shortwave down [W/m^2]
    (0.1, 25.0),        # windspeed [m/s]
    (0.0, 3e-6),        # rainfall [m/s] (~260 mm/day downpour)
))


@pytest.mark.parametrize("Ta,sw,wind,rain", CORNERS)
def test_extreme_forcing_stays_finite(consistent_sim, Ta, sw, wind, rain):
    sim = consistent_sim
    sim.input_sources = (tt.FieldInputSource(fields={
        "air_temperature": Ta, "surface_shortwave_down": sw,
        "windspeed": wind, "rainfall": rain,
        "snowfall": 2e-7 if Ta < 0 else 0.0}),)
    sim.reinitialize()
    sim.run(steps=144, dt=600.0)  # one simulated day
    st = sim.state
    for name in ("temperature", "saturation_water_ice", "skin_temperature",
                 "ground_heat_flux", "surface_runoff", "infiltration",
                 "snow_water_equivalent", "surface_excess_water"):
        v = np.asarray(st[name])
        assert np.all(np.isfinite(v)), (name, Ta, sw, wind, rain, v)
    sat = np.asarray(st.saturation_water_ice)
    assert np.all((0.0 <= sat) & (sat <= 1.0))
    assert float(np.asarray(st.snow_water_equivalent).min()) >= 0.0
    Ts = float(np.asarray(st.skin_temperature)[0])
    assert -90.0 < Ts < 90.0, (Ts, Ta, sw, wind, rain)
