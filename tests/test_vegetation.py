"""Vegetation (PALADYN) tests.

Mirrors reference `test/vegetation/photosynthesis_tests.jl` (kinetics
monotonicity, PAR/APAR limits, temperature stress) plus integration runs of
the standalone VegetationModel and the vegetated LandModel.
"""
import jax.numpy as jnp
import numpy as np

import terrarium_tpu as tt


def test_kinetic_parameters():
    photo = tt.LUEPhotosynthesis()
    tau, Kc, Ko = [float(x) for x in photo.kinetic_parameters(jnp.float64(20.0))]
    assert tau > 0 and Kc > 0 and Ko > 0
    tau_w, Kc_w, Ko_w = [float(x) for x in photo.kinetic_parameters(jnp.float64(30.0))]
    assert tau_w < tau
    assert Kc_w > Kc
    assert Ko_w > Ko


def test_gamma_star_and_par():
    photo = tt.LUEPhotosynthesis()
    g1 = float(photo.gamma_star(3000.0, 20.9e3))
    g2 = float(photo.gamma_star(2000.0, 20.9e3))
    assert 0 < g1 < g2
    # PAR linear in swdown, 0 at 0
    assert float(photo.PAR(0.0)) == 0.0
    assert np.isclose(float(photo.PAR(100.0)), 2 * float(photo.PAR(50.0)))
    # APAR limits
    assert float(photo.APAR(50.0, 0.0)) == 0.0
    apar_inf = float(photo.APAR(50.0, jnp.inf))
    assert np.isclose(apar_inf, photo.alpha_a * float(photo.PAR(50.0)))


def test_temperature_stress():
    photo = tt.LUEPhotosynthesis()
    ts = photo.temperature_stress
    assert float(ts(jnp.float64(photo.T_CO2_low * 2))) == 0.0
    assert float(ts(jnp.float64(photo.T_CO2_low))) == 0.0
    assert float(ts(jnp.float64(photo.T_CO2_high * 2))) == 0.0
    assert float(ts(jnp.float64(photo.T_CO2_high))) == 0.0
    # near-optimal range: close to 1
    mid = 0.5 * (photo.T_photos_low + photo.T_photos_high)
    assert 0.9 < float(ts(jnp.float64(mid))) <= 1.0


def test_photosynthesis_gating():
    """No photosynthesis without light, warmth, or leaves
    (reference `photosynthesis.jl:262-330`)."""
    photo = tt.LUEPhotosynthesis()
    c = tt.PhysicalConstants()

    def run(T=20.0, sw=300.0, LAI=4.0):
        Rd, An, GPP = photo.compute(c, jnp.float64(T), jnp.float64(sw),
                                    101325.0, 380.0, jnp.float64(LAI), 0.8, 1.0)
        return float(Rd), float(An), float(GPP)

    assert run(sw=0.0) == (0.0, 0.0, 0.0)
    assert run(T=-5.0) == (0.0, 0.0, 0.0)
    assert run(LAI=0.0) == (0.0, 0.0, 0.0)
    Rd, An, GPP = run()
    assert Rd > 0 and An > 0 and GPP == An * 1e-3


def test_vegetation_model_run():
    """Standalone VegetationModel integrates C_veg/nu finitely and carbon
    grows under favorable conditions."""
    grid = tt.ColumnGrid.of(cells=3, spacing=tt.ExponentialSpacing(N=8),
                            nf=np.float64)
    model = tt.VegetationModel(grid=grid)
    sim = tt.initialize(
        model, tt.ForwardEuler(),
        initializers={"carbon_vegetation": 2.0,
                      "vegetation_area_fraction": 0.5},
        input_sources=(tt.FieldInputSource(fields={
            "air_temperature": 22.0, "surface_shortwave_down": 500.0}),))
    C0 = float(sim.state.carbon_vegetation[0])
    sim.run(steps=48, dt=1800.0)
    st = sim.state
    for name in ("carbon_vegetation", "vegetation_area_fraction",
                 "net_assimilation", "gross_primary_production",
                 "net_primary_production", "canopy_water_conductance",
                 "leaf_area_index"):
        assert np.all(np.isfinite(np.asarray(st[name]))), name
    assert float(st.gross_primary_production[0]) > 0
    assert float(st.carbon_vegetation[0]) > C0  # growing
    assert np.all(np.asarray(st.leaf_area_index) > 0)


def test_root_distribution_normalized():
    grid = tt.ColumnGrid.of(cells=2, spacing=tt.ExponentialSpacing(N=12),
                            nf=np.float64)
    rd = tt.StaticExponentialRootDistribution()
    R = rd._make_field(grid, {})
    assert R.shape == (12, 2)
    np.testing.assert_allclose(R.sum(axis=0), 1.0, rtol=1e-12)
    # roots concentrated near the surface (top index = -1)
    assert R[-1, 0] > R[0, 0]


def _vegetated_land_model(vegetation):
    grid = tt.ColumnGrid.of(cells=3, spacing=tt.ExponentialSpacing(N=15),
                            nf=np.float64)
    # Lee-Pielke ground resistance + loam texture: the default pure-sand
    # texture has zero clay, for which the SURFEX field capacity/wilting point
    # are 0 and the PAW / Lee-Pielke formulas divide by zero (the identical
    # formulas NaN in the reference too).
    surf_hyd = tt.SurfaceHydrology(
        evapotranspiration=tt.PALADYNCanopyEvapotranspiration(
            ground_resistance=tt.SoilMoistureResistanceFactor()))
    soil = tt.SoilEnergyWaterCarbon(
        strat=tt.HomogeneousStratigraphy(texture=tt.SoilTexture.preset("loam")),
        hydrology=tt.SoilHydrology(vertical_flow=tt.RichardsEq()))
    model = tt.LandModel(grid=grid, vegetation=vegetation,
                         soil=soil, surface_hydrology=surf_hyd)
    return tt.initialize(
        model, tt.ForwardEuler(),
        initializers={"temperature": 12.0, "saturation_water_ice": 0.6,
                      "carbon_vegetation": 2.0,
                      "vegetation_area_fraction": 0.5},
        input_sources=(tt.FieldInputSource(fields={
            "air_temperature": 18.0, "surface_shortwave_down": 400.0,
            "rainfall": 2.0e-7}),))


def test_vegetated_land_model_single_step():
    """Reference parity: one 60-s step stays finite (the reference's vegetated
    LandModel test takes exactly one step, `land_model_tests.jl:39-69` —
    its raw yearly turnover rates diverge beyond that)."""
    sim = _vegetated_land_model(tt.VegetationCarbon())
    from terrarium_tpu.processes.soil.hydrology import RichardsEq
    assert isinstance(sim.model.soil.hydrology.vertical_flow, RichardsEq)
    sim.timestep(60.0)
    st = sim.state
    for name in ("saturation_water_ice", "internal_energy", "ground_heat_flux",
                 "carbon_vegetation"):
        assert np.all(np.isfinite(np.asarray(st[name]))), name


def test_vegetated_land_model_long_run_consistent_units():
    """Extension: with turnover/respiration rates converted to per-second
    (`VegetationCarbon.consistent_units`), the coupled model integrates a
    full simulated day stably."""
    sim = _vegetated_land_model(tt.VegetationCarbon.consistent_units())
    sim.run(steps=144, dt=600.0)
    st = sim.state
    for name in ("temperature", "saturation_water_ice", "carbon_vegetation",
                 "vegetation_area_fraction", "leaf_area_index",
                 "soil_moisture_limiting_factor", "transpiration",
                 "evaporation_canopy", "evaporation_ground", "canopy_water",
                 "skin_temperature", "ground_heat_flux"):
        assert np.all(np.isfinite(np.asarray(st[name]))), name
    beta = np.asarray(st.soil_moisture_limiting_factor)
    assert np.all((0.0 <= beta) & (beta <= 1.0))
    # vegetation carbon stays in a physical range over the day
    C = np.asarray(st.carbon_vegetation)
    assert np.all((0.0 < C) & (C < 10.0))
