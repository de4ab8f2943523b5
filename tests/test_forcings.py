"""Generic per-variable forcing hooks (reference `src/forcings.jl:13-19`).

The reference dispatches a user forcing against any target process; here
``initialize(..., forcings={"name": fn})`` attaches a source/sink to any
prognostic variable (XY or XYZ), applied with ``+=`` semantics inside
``update_state`` every step/stage.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import terrarium_tpu as tt


def _solid_heat_model(cells=3, nz=16, k=2.0, c=1.0e6):
    """Porosity-0 solid medium isolating linear conduction
    (reference `soil_energy_tests.jl:100-116`)."""
    grid = tt.ColumnGrid.of(cells=cells, spacing=tt.UniformSpacing(dz=0.25, N=nz),
                            nf=np.float64)
    strat = tt.HomogeneousStratigraphy(
        porosity=tt.ConstantSoilPorosity(mineral_porosity=0.0))
    thermal = tt.SoilThermalProperties(
        conductivities=tt.SoilThermalConductivities(mineral=k),
        heat_capacities=tt.SoilHeatCapacities(mineral=c))
    soil = tt.SoilEnergyWaterCarbon(
        strat=strat, energy=tt.SoilEnergyBalance(thermal_properties=thermal))
    return tt.SoilModel(grid=grid, soil=soil), c


def test_heat_source_uniform_analytic():
    """Uniform volumetric heating Q with insulated (default zero-flux) BCs:
    dU/dt = Q exactly, so T(t) = T0 + Q*t/C to machine precision (the
    conduction term vanishes on a uniform profile)."""
    model, c = _solid_heat_model()
    Q = 25.0  # W/m^3

    sim = tt.initialize(
        model, tt.ForwardEuler(dt=600.0),
        initializers={"temperature": 5.0, "saturation_water_ice": 0.0},
        forcings={"internal_energy": lambda state, grid: Q})
    n = 48
    sim.run(steps=n)
    T_expect = 5.0 + Q * n * 600.0 / c
    np.testing.assert_allclose(np.asarray(sim.state.temperature), T_expect,
                               rtol=1e-12)


def test_heat_source_stacks_with_conduction():
    """Forcing adds to (does not replace) process tendencies: with a
    non-uniform profile, stepping with forcing equals stepping without
    forcing plus Q*dt/C added to every layer (single explicit step)."""
    model, c = _solid_heat_model()
    Q = 100.0
    init = {"temperature": lambda x, z: 2.0 + z, "saturation_water_ice": 0.0}

    sim_f = tt.initialize(model, tt.ForwardEuler(dt=300.0), initializers=init,
                          forcings={"internal_energy": lambda s, g: Q})
    sim_0 = tt.initialize(model, tt.ForwardEuler(dt=300.0), initializers=init)
    sim_f.timestep()
    sim_0.timestep()
    dU = np.asarray(sim_f.state.internal_energy) - np.asarray(
        sim_0.state.internal_energy)
    np.testing.assert_allclose(dU, Q * 300.0, rtol=1e-12)


def test_xy_forcing_on_surface_pool():
    """XY prognostics take forcings too: a constant source on the
    surface-excess pool grows it by rate*dt per step (Richards config,
    saturated column so drainage/infiltration stay zero)."""
    grid = tt.ColumnGrid.of(cells=4, spacing=tt.ExponentialSpacing(N=10),
                            nf=np.float64)
    soil = tt.SoilEnergyWaterCarbon(hydrology=tt.SoilHydrology(
        vertical_flow=tt.RichardsEq()))
    model = tt.SoilModel(grid=grid, soil=soil)
    rate = 1e-6  # m/s
    sim = tt.initialize(
        model, tt.ForwardEuler(dt=60.0),
        initializers={"temperature": 1.0, "saturation_water_ice": 1.0},
        forcings={"surface_excess_water": lambda s, g: rate})
    sim.run(steps=10)
    np.testing.assert_allclose(np.asarray(sim.state.surface_excess_water),
                               rate * 60.0 * 10, rtol=1e-12)


def test_vwc_forcing_equivalence():
    """`SoilHydrology.vwc_forcing` (the reference's use-site,
    `soil_hydrology.jl:245-257`, VWC units rescaled by porosity) equals the
    generic mechanism targeting `saturation_water_ice` with the porosity
    rescale applied by the user."""
    def build(vwc_forcing=None, forcings=None):
        grid = tt.ColumnGrid.of(cells=4, spacing=tt.ExponentialSpacing(N=10),
                                nf=np.float64)
        hyd = tt.SoilHydrology(vertical_flow=tt.RichardsEq(),
                               vwc_forcing=vwc_forcing)
        soil = tt.SoilEnergyWaterCarbon(hydrology=hyd)
        model = tt.SoilModel(grid=grid, soil=soil)
        return tt.initialize(
            model, tt.ForwardEuler(dt=60.0),
            initializers={"temperature": 1.0,
                          "saturation_water_ice": lambda x, z: 0.6 + 0 * z},
            forcings=forcings)

    q = 1e-8  # volumetric water content source [1/s]

    sim_a = build(vwc_forcing=lambda state, grid: q)
    # generic route: same source divided by the (constant default) porosity
    por = 0.49  # ConstantSoilPorosity default mineral porosity
    sim_b = build(forcings={"saturation_water_ice": lambda s, g: q / por})
    sim_a.run(steps=20)
    sim_b.run(steps=20)
    np.testing.assert_allclose(np.asarray(sim_a.state.saturation_water_ice),
                               np.asarray(sim_b.state.saturation_water_ice),
                               rtol=1e-12, atol=1e-15)


def test_forcing_unknown_target_raises():
    model, _ = _solid_heat_model()
    with pytest.raises(KeyError, match="not a prognostic"):
        tt.initialize(model, tt.ForwardEuler(),
                      initializers={"temperature": 0.0,
                                    "saturation_water_ice": 0.0},
                      forcings={"temperature": lambda s, g: 0.0})


def test_forcing_heun_stages():
    """Forcings re-evaluate per Heun stage: a time-dependent source on an
    otherwise inert prognostic reproduces Heun's trapezoidal quadrature
    u_{n+1} = u_n + dt/2*(f(t_n) + f(t_n+dt))."""
    model, c = _solid_heat_model()
    w = 2 * np.pi / 3600.0

    def source(state, grid):
        return 50.0 * jnp.sin(w * state.clock.time)

    dt, n = 300.0, 5  # a partial period so the expected sum is O(1)
    sim = tt.initialize(model, tt.Heun(dt=dt),
                        initializers={"temperature": 0.0,
                                      "saturation_water_ice": 0.0},
                        forcings={"internal_energy": source})
    sim.run(steps=n)
    t = np.arange(n) * dt
    expect = np.sum(0.5 * dt * 50.0 * (np.sin(w * t) + np.sin(w * (t + dt))))
    np.testing.assert_allclose(np.asarray(sim.state.internal_energy), expect,
                               rtol=1e-10)
