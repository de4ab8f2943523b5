"""Soil hydrology tests.

Mirrors reference `test/soil/soil_hydrology_tests.jl`: hydraulic properties
(constant + SURFEX), unsaturated K limits, saturation-profile adjustment
conservation, and Richards-equation steady state / mass conservation.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import terrarium_tpu as tt
from terrarium_tpu.processes.soil.stratigraphy import SoilTexture, SoilVolume


def test_constant_hydraulics():
    """Reference `soil_hydrology_tests.jl:8-20`."""
    props = tt.ConstantSoilHydraulics(sat_hydraulic_cond=1e-6,
                                      field_capacity_value=0.1,
                                      wilting_point_value=0.02)
    assert props.saturated_hydraulic_conductivity() == 1e-6
    assert props.field_capacity() == 0.1
    assert props.wilting_point() == 0.02


def test_surfex_hydraulics():
    """Reference `soil_hydrology_tests.jl:22-43`."""
    props = tt.SoilHydraulicsSURFEX()
    tex0 = SoilTexture(sand=0.5, clay=0.0, silt=0.5)
    assert float(props.wilting_point(tex0)) == 0.0
    assert float(props.field_capacity(tex0)) == 0.0
    for clay in np.arange(0.1, 1.01, 0.1):
        sand = (1 - clay) * 0.7
        tex = SoilTexture(sand=float(sand), clay=float(clay),
                          silt=float(1 - clay - sand))
        assert 0 < float(props.wilting_point(tex)) < 1
        assert 0 < float(props.field_capacity(tex)) < 1


@pytest.mark.parametrize("unsat", [tt.UnsatKLinear(), tt.UnsatKVanGenuchten()])
def test_unsat_hydraulic_conductivity_limits(unsat):
    """Reference `soil_hydrology_tests.jl:45-91`."""
    swrc = tt.VanGenuchten() if isinstance(unsat, tt.UnsatKVanGenuchten) else tt.BrooksCorey()
    props = tt.ConstantSoilHydraulics(swrc=swrc, unsat_hydraulic_cond=unsat)
    K_sat = props.sat_hydraulic_cond
    # saturated
    assert np.isclose(float(props.hydraulic_conductivity(SoilVolume())), K_sat)
    # unsaturated
    K = float(props.hydraulic_conductivity(SoilVolume(saturation=0.5)))
    assert 0 < K < K_sat
    # dry
    assert float(props.hydraulic_conductivity(SoilVolume(saturation=0.0))) == 0.0
    # frozen (ice impedance or zero liquid)
    K_frozen = float(props.hydraulic_conductivity(SoilVolume(liquid=0.0)))
    assert np.isclose(K_frozen, 0.0, atol=1e-11)


def _richards_model(cells=1, nz=100, dz=0.1):
    grid = tt.ColumnGrid.of(cells=cells, spacing=tt.UniformSpacing(dz=dz, N=nz),
                            nf=np.float64)
    props = tt.ConstantSoilHydraulics(
        swrc=tt.VanGenuchten(alpha=2.0, n=2.0),
        unsat_hydraulic_cond=tt.UnsatKVanGenuchten())
    hydrology = tt.SoilHydrology(vertical_flow=tt.RichardsEq(),
                                 hydraulic_properties=props)
    soil = tt.SoilEnergyWaterCarbon(hydrology=hydrology)
    return tt.SoilModel(grid=grid, soil=soil)


def test_adjust_saturation_profile():
    """Reference `soil_hydrology_tests.jl:93-123`."""
    model = _richards_model()
    grid = model.grid
    hydrology = model.soil.hydrology
    sim = tt.initialize(model, tt.ForwardEuler(),
                        initializers={"temperature": 1.0,
                                      "saturation_water_ice": 1.0})
    dz = np.asarray(grid.vertical.dz)[:, None]
    z = grid.vertical.z_centers[:, None]

    # Case 1: oversaturation near the surface
    sat0 = np.maximum(1.1 + z, 1.0)
    state = sim.state.update(
        saturation_water_ice=jnp.asarray(np.broadcast_to(sat0, (grid.nz, grid.cells))),
        surface_excess_water=jnp.zeros(grid.cells))
    excess_integral = np.sum((sat0 - 1.0) * dz)
    state = hydrology.adjust_saturation_profile(state, grid)
    np.testing.assert_allclose(state.saturation_water_ice, 1.0)
    np.testing.assert_allclose(state.surface_excess_water, excess_integral)

    # Case 2: undersaturation near the surface — mass conserved
    sat0 = np.minimum(-0.1 - z, 1.0)
    state = sim.state.update(
        saturation_water_ice=jnp.asarray(np.broadcast_to(sat0, (grid.nz, grid.cells))),
        surface_excess_water=jnp.zeros(grid.cells))
    total0 = np.sum(sat0 * dz)
    state = hydrology.adjust_saturation_profile(state, grid)
    sat1 = np.asarray(state.saturation_water_ice)
    assert np.all(sat1 >= 0)
    np.testing.assert_allclose(np.sum(sat1 * dz, axis=0), total0, rtol=1e-12)

    # Case 3: completely dry with negative saturation near surface
    sat0 = np.minimum(-0.1 - z, 0.0)
    state = sim.state.update(
        saturation_water_ice=jnp.asarray(np.broadcast_to(sat0, (grid.nz, grid.cells))),
        surface_excess_water=jnp.zeros(grid.cells))
    state = hydrology.adjust_saturation_profile(state, grid)
    np.testing.assert_allclose(state.saturation_water_ice, 0.0, atol=1e-12)


def test_adjust_saturation_closed_form_matches_sequential_sweeps():
    """The parallel cumsum/cummin formulation must reproduce the reference's
    literal sequential up/down sweeps (`soil_hydrology.jl:185-218`)."""
    import jax

    rng = np.random.default_rng(42)
    nz, cells = 23, 17
    sat = jnp.asarray(rng.uniform(-0.4, 1.7, (nz, cells)))
    dz = jnp.asarray(np.exp(rng.uniform(-2.0, 0.5, (nz, 1))))
    dz_col = jnp.broadcast_to(dz, sat.shape)

    def up(carry, xs):
        s, d = xs
        s = s + carry / d
        excess = jnp.maximum(s - 1.0, 0.0)
        return excess * d, s - excess

    carry_top, sat_up = jax.lax.scan(
        up, jnp.zeros((cells,), sat.dtype), (sat, dz_col))

    def down(carry, xs):
        s, d = xs
        s = s - carry / d
        deficit = jnp.maximum(-s, 0.0)
        return deficit * d, s + deficit

    _, sat_seq = jax.lax.scan(
        down, jnp.zeros((cells,), sat.dtype), (sat_up, dz_col), reverse=True)

    model = _richards_model(cells=cells, nz=nz)
    grid = tt.ColumnGrid.of(
        cells=cells, spacing=tt.PrescribedSpacing(np.asarray(dz)[::-1, 0]),
        nf=np.float64)
    np.testing.assert_allclose(np.asarray(grid.dz), np.asarray(dz), rtol=1e-15)
    hydrology = model.soil.hydrology
    sim = tt.initialize(_richards_model(cells=cells, nz=nz), tt.ForwardEuler(),
                        initializers={"temperature": 1.0,
                                      "saturation_water_ice": 1.0})
    state = sim.state.update(saturation_water_ice=sat,
                             surface_excess_water=jnp.zeros(cells))
    # monkey-grid: reuse the sim state but adjust with the dz-matching grid
    out = hydrology.adjust_saturation_profile(state, grid)
    np.testing.assert_allclose(np.asarray(out.saturation_water_ice),
                               np.asarray(sat_seq), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.surface_excess_water),
                               np.asarray(carry_top), rtol=1e-12, atol=1e-12)


def test_richards_saturated_steady_state():
    """Reference `soil_hydrology_tests.jl:125-151`."""
    model = _richards_model()
    sim = tt.initialize(model, tt.ForwardEuler(),
                        initializers={"temperature": 1.0,
                                      "saturation_water_ice": 1.0})
    state = sim.state
    np.testing.assert_allclose(state.water_table, 0.0, atol=1e-12)
    np.testing.assert_allclose(state.pressure_head, 0.0, atol=1e-12)
    K_sat = model.soil.hydrology.hydraulic_properties.sat_hydraulic_cond
    # as in the reference test (`soil_hydrology_tests.jl:141-144`), K is
    # checked after compute_auxiliary! (the energy init sets liquid fraction
    # after the hydrology init)
    state = sim.model.compute_auxiliary(state, sim.ctx)
    assert np.all(np.isfinite(np.asarray(state.hydraulic_conductivity)))
    np.testing.assert_allclose(state.hydraulic_conductivity, K_sat)
    # tendencies all zero
    state = sim.model.compute_tendencies(state, sim.ctx)
    np.testing.assert_allclose(state.tendencies["saturation_water_ice"], 0.0,
                               atol=1e-15)
    sim.timestep(60.0)
    np.testing.assert_allclose(sim.state.saturation_water_ice, 1.0)


def test_richards_mass_conservation():
    """Reference `soil_hydrology_tests.jl:153-189`."""
    model = _richards_model()
    grid = model.grid
    sim = tt.initialize(
        model, tt.ForwardEuler(),
        initializers={"temperature": 1.0,
                      "saturation_water_ice": lambda x, z: np.minimum(1.0, 0.5 - 0.1 * z)})
    state = sim.state
    np.testing.assert_allclose(state.water_table, -5.0, atol=1e-12)
    assert np.all(np.asarray(state.pressure_head) < 0)
    # compute_auxiliary! before K checks, as in the reference test
    # (`soil_hydrology_tests.jl:163-166`)
    state = sim.model.compute_auxiliary(state, sim.ctx)
    assert np.all(np.isfinite(np.asarray(state.hydraulic_conductivity)))
    assert np.all(np.asarray(state.hydraulic_conductivity) > 0)

    dz = np.asarray(grid.vertical.dz)[:, None]
    total0 = np.sum(np.asarray(state.saturation_water_ice) * dz)
    dt = 60.0
    sim.timestep(dt)
    sat = np.asarray(sim.state.saturation_water_ice)
    assert np.all(np.isfinite(sat))
    assert np.all((0 <= sat) & (sat <= 1))
    total1 = np.sum(sat * dz) + float(np.sum(np.asarray(sim.state.surface_excess_water)))
    np.testing.assert_allclose(total1, total0, rtol=1e-10)
    # one simulated hour
    sim.run(steps=59, dt=dt)
    sat = np.asarray(sim.state.saturation_water_ice)
    assert np.all(np.isfinite(sat))
    assert np.all((0 <= sat) & (sat <= 1))
    total2 = np.sum(sat * dz) + float(np.sum(np.asarray(sim.state.surface_excess_water)))
    np.testing.assert_allclose(total2, total0, rtol=1e-10)


def test_vwc_forcing_sink():
    """Reference `soil_hydrology_tests.jl:191-233` (user source/sink forcing)."""
    nz = 10
    grid = tt.ColumnGrid.of(cells=1, spacing=tt.UniformSpacing(dz=0.1, N=nz),
                            nf=np.float64)
    porosity = tt.ConstantSoilPorosity()
    forcing_value = -1.0e-5

    def vwc_forcing(state, grid):
        return jnp.full((grid.nz, grid.cells), forcing_value)

    props = tt.ConstantSoilHydraulics(
        swrc=tt.VanGenuchten(alpha=2.0, n=2.0),
        unsat_hydraulic_cond=tt.UnsatKVanGenuchten())
    hydrology = tt.SoilHydrology(vertical_flow=tt.RichardsEq(),
                                 hydraulic_properties=props,
                                 vwc_forcing=vwc_forcing)
    soil = tt.SoilEnergyWaterCarbon(
        hydrology=hydrology,
        strat=tt.HomogeneousStratigraphy(porosity=porosity))
    model = tt.SoilModel(grid=grid, soil=soil)
    sim = tt.initialize(model, tt.ForwardEuler(),
                        initializers={"temperature": 10.0,
                                      "saturation_water_ice": 1.0})
    dt = 60.0
    sim.timestep(dt)
    # top-layer saturation reduced by forcing*dt/porosity
    expected = 1.0 + forcing_value * dt / porosity.mineral_porosity
    np.testing.assert_allclose(sim.state.saturation_water_ice[-1, 0], expected,
                               rtol=1e-10)


def test_surface_excess_drainage_sign_modes():
    """Parity: the reference's excess-pool tendency is += min(S/tau, S) —
    the pool grows by its own drainage (`soil_hydrology.jl:274-283`).
    DirectSurfaceRunoff.consistent() applies the removal sign so the pool
    decays into infiltration + runoff."""
    import terrarium_tpu as tt

    def run(runoff):
        grid = tt.ColumnGrid.of(cells=1, spacing=tt.ExponentialSpacing(N=8),
                                nf=np.float64)
        soil = tt.SoilEnergyWaterCarbon(hydrology=tt.SoilHydrology(
            vertical_flow=tt.RichardsEq()))
        model = tt.LandModel(
            grid=grid, soil=soil,
            surface_hydrology=tt.SurfaceHydrology(
                canopy_interception=tt.NoCanopyInterception(),
                evapotranspiration=tt.BareGroundEvaporation(),
                surface_runoff=runoff))
        sim = tt.initialize(
            model, tt.ForwardEuler(),
            # fully saturated: ET would NaN the Lee-Pielke beta on pure sand,
            # so keep it simple — saturation 1 seeds the excess pool via the
            # profile adjustment when any inflow arrives
            initializers={"temperature": 5.0, "saturation_water_ice": 1.0},
            input_sources=(tt.FieldInputSource(fields={"rainfall": 1e-6}),))
        # seed the pool directly
        sim.state = sim.state.update(surface_excess_water=np.array([0.01]))
        S0 = float(sim.state.surface_excess_water[0])
        sim.run(steps=12, dt=300.0)
        return S0, float(sim.state.surface_excess_water[0])

    S0, S_parity = run(tt.DirectSurfaceRunoff())
    _, S_consistent = run(tt.DirectSurfaceRunoff.consistent())
    assert S_parity > S0          # reference quirk: pool self-amplifies
    assert S_consistent < S0      # corrected: pool drains
    assert S_consistent > 0.0
