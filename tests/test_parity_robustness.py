"""Parity-mode (reference-default) robustness pins (VERDICT r2 item 10).

`tests/test_robustness.py` proves the bare consistent-mode configuration
survives the extreme-forcing matrix. These tests pin HOW the parity-default
coupled configuration diverges — making the README "deviations" story
test-backed — and extend the consistent-mode survival guarantee to the
fully coupled vegetation configuration.

Mechanism pinned below: the reference applies the ET specific-humidity flux
[kg/kg m/s] directly as a water flux [m/s] (missing rho_a/rho_w ~ 1.3e-3;
`PALADYNCanopyEvapotranspiration.water_flux_scale`). Under ordinary daytime
forcing this drains the top soil layer to sat ~ 0 within the first few
600 s steps, the matric head saturates its -1e4 m clamp, the layer enters a
growing 2-dt dry/refill oscillation against the Richards top flux, and the
coupled run goes NaN within a few simulated hours. Correcting the ET units
ALONE is not sufficient: the remaining parity pieces (unclamped Medlyn
conductance going negative, canopy-water feedback, reference-form ground
heat flux) still blow up on the same timescale. The full `consistent`
composition (tested last) integrates the same forcing finitely.
"""
import numpy as np
import pytest

import terrarium_tpu as tt

MODERATE = {"air_temperature": 10.0, "surface_shortwave_down": 300.0,
            "surface_longwave_down": 320.0, "windspeed": 2.0,
            "rainfall": 1e-7}


def _loam_richards_soil():
    return tt.SoilEnergyWaterCarbon(
        strat=tt.HomogeneousStratigraphy(texture=tt.SoilTexture.preset("loam")),
        hydrology=tt.SoilHydrology(vertical_flow=tt.RichardsEq()))


def _coupled(evtr=None):
    grid = tt.ColumnGrid.of(cells=1, spacing=tt.ExponentialSpacing(N=12),
                            nf=np.float32)
    kw = {}
    if evtr is not None:
        kw["surface_hydrology"] = tt.SurfaceHydrology(evapotranspiration=evtr)
    model = tt.LandModel(grid=grid, soil=_loam_richards_soil(),
                         vegetation=tt.VegetationCarbon(), **kw)
    return tt.initialize(
        model, tt.ForwardEuler(),
        initializers={"temperature": 2.0, "saturation_water_ice": 0.5,
                      "carbon_vegetation": 2.0,
                      "vegetation_area_fraction": 0.5},
        input_sources=(tt.FieldInputSource(fields=dict(MODERATE)),))


def test_parity_et_units_drain_and_diverge():
    """Pin the parity divergence under MODERATE daytime forcing: (a) the
    unit-mismatched ET flux empties the top soil layer within the first two
    simulated hours (it oscillates dry/refilled at 2-dt period, so track
    the minimum); (b) the run is nonfinite within one simulated day. If
    parity mode ever stops diverging this way, the README deviations
    section must be rewritten — this test is the tripwire."""
    sim = _coupled()
    min_sat_top = np.inf
    for _ in range(12):
        sim.timestep(600.0, finalize=False)
        top = float(np.asarray(sim.state.saturation_water_ice)[-1, 0])
        min_sat_top = min(min_sat_top, top)
    assert min_sat_top < 0.1, min_sat_top  # drained (initial value 0.5)

    sim.run(steps=132, dt=600.0)  # to one simulated day total
    assert not np.all(np.isfinite(np.asarray(sim.state.saturation_water_ice)))
    assert not np.isfinite(float(np.asarray(sim.state.skin_temperature)[0]))


def test_parity_consistent_et_alone_still_diverges():
    """Correcting only the ET water-flux units does NOT rescue the parity
    configuration: the remaining reference defects (Medlyn conductance
    unclamped to negative values, canopy-water feedback, reference-form G)
    still blow it up within a simulated day. Pinned so the deviations
    docs cannot overclaim what `consistent_units()` fixes."""
    sim = _coupled(evtr=tt.PALADYNCanopyEvapotranspiration.consistent_units())
    sim.run(steps=144, dt=600.0)
    assert not np.isfinite(float(np.asarray(sim.state.skin_temperature)[0]))


@pytest.mark.parametrize("Ta,sw", [(-40.0, 0.0), (45.0, 1000.0)])
def test_bare_parity_land_model_extremes_finite(Ta, sw):
    """Parity-mode divergence is specific to the ET/vegetation coupling:
    the bare default LandModel (no vegetation, immobile soil water — the
    reference's default composition) survives the extreme corners finitely
    even in full parity mode."""
    grid = tt.ColumnGrid.of(cells=1, spacing=tt.ExponentialSpacing(N=12),
                            nf=np.float32)
    model = tt.LandModel(grid=grid)
    sim = tt.initialize(
        model, tt.ForwardEuler(),
        initializers={"temperature": 2.0, "saturation_water_ice": 0.5},
        input_sources=(tt.FieldInputSource(fields={
            "air_temperature": Ta, "surface_shortwave_down": sw,
            "surface_longwave_down": 320.0, "windspeed": 2.0,
            "rainfall": 0.0}),))
    sim.run(steps=144, dt=600.0)
    for name in ("temperature", "skin_temperature", "ground_heat_flux"):
        assert np.all(np.isfinite(np.asarray(sim.state[name]))), name


def _consistent_vegetated():
    grid = tt.ColumnGrid.of(cells=1, spacing=tt.ExponentialSpacing(N=12),
                            nf=np.float32)
    model = tt.LandModel(
        grid=grid, soil=_loam_richards_soil(),
        vegetation=tt.VegetationCarbon.consistent_units(),
        atmosphere=tt.PrescribedAtmosphere(
            aerodynamics=tt.MoninObukhovAerodynamics()),
        surface_energy_balance=tt.SurfaceEnergyBalance.consistent(),
        surface_hydrology=tt.SurfaceHydrology(
            evapotranspiration=tt.PALADYNCanopyEvapotranspiration
            .consistent_units(ground_resistance=tt.SoilMoistureResistanceFactor()),
            surface_runoff=tt.DirectSurfaceRunoff.consistent()))
    return tt.initialize(
        model, tt.ForwardEuler(),
        initializers={"temperature": 2.0, "saturation_water_ice": 0.5,
                      "carbon_vegetation": 2.0,
                      "vegetation_area_fraction": 0.5},
        input_sources=(tt.FieldInputSource(fields=dict(MODERATE)),))


@pytest.mark.parametrize("Ta,sw,rain", [
    (10.0, 300.0, 1e-7),     # moderate
    (-40.0, 0.0, 3e-6),      # polar night downpour
    (45.0, 1000.0, 3e-6),    # heatwave downpour
    (-40.0, 1000.0, 0.0),    # cold + bright
])
def test_consistent_vegetated_configuration_survives(Ta, sw, rain):
    """The fully consistent composition WITH vegetation (the production
    configuration of examples/land_global.py) integrates the same forcing
    envelope finitely — extending tests/test_robustness.py's bare-ground
    guarantee to the coupled vegetation model."""
    sim = _consistent_vegetated()
    sim.input_sources = (tt.FieldInputSource(fields={
        **MODERATE, "air_temperature": Ta, "surface_shortwave_down": sw,
        "rainfall": rain}),)
    sim.reinitialize()
    sim.run(steps=144, dt=600.0)
    st = sim.state
    for name in ("temperature", "saturation_water_ice", "skin_temperature",
                 "canopy_water", "carbon_vegetation",
                 "vegetation_area_fraction"):
        assert np.all(np.isfinite(np.asarray(st[name]))), name
    sat = np.asarray(st.saturation_water_ice)
    assert np.all((sat >= 0.0) & (sat <= 1.0))
