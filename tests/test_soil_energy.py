"""Soil energy tests.

Mirrors reference `test/soil/soil_energy_tests.jl`: thermal-property
endmembers, initialization signs, closure behavior, and the two analytic
heat-conduction convergence tests (periodic upper BC and erfc step response).
"""
import jax.numpy as jnp
import numpy as np
from scipy.special import erfc

import terrarium_tpu as tt
from terrarium_tpu.processes.soil.stratigraphy import SoilVolume
from terrarium_tpu.processes.soil.thermal import SoilThermalProperties


def test_thermal_conductivity_endmembers():
    """Reference `soil_energy_tests.jl:9-26`."""
    props = SoilThermalProperties()
    k = props.conductivities

    def bulk_k(**kw):
        return float(props.thermal_conductivity(SoilVolume(**kw)))

    assert np.isclose(bulk_k(porosity=1.0, saturation=1.0, liquid=1.0), k.water)
    assert np.isclose(bulk_k(porosity=1.0, saturation=1.0, liquid=0.0), k.ice)
    assert np.isclose(bulk_k(porosity=1.0, saturation=0.0, liquid=0.0), k.air)
    assert np.isclose(bulk_k(porosity=0.0, saturation=0.0), k.mineral)
    assert np.isclose(bulk_k(porosity=0.0, saturation=0.0, organic=1.0), k.organic)


def _soil_sim(**kw):
    grid = tt.ColumnGrid.of(cells=1, spacing=tt.ExponentialSpacing(N=10), nf=np.float64)
    model = tt.SoilModel(grid=grid)
    return tt.initialize(model, tt.ForwardEuler(), **kw)


def test_energy_initialize_signs():
    """Reference `soil_energy_tests.jl:28-49`."""
    sim = _soil_sim(initializers={"temperature": 0.0, "saturation_water_ice": 1.0})
    np.testing.assert_allclose(sim.state.liquid_water_fraction, 1.0)
    np.testing.assert_allclose(sim.state.internal_energy, 0.0)

    sim = _soil_sim(initializers={"temperature": 1.0, "saturation_water_ice": 1.0})
    np.testing.assert_allclose(sim.state.liquid_water_fraction, 1.0)
    assert np.all(np.asarray(sim.state.internal_energy) > 0)

    sim = _soil_sim(initializers={"temperature": -1.0, "saturation_water_ice": 1.0})
    np.testing.assert_allclose(sim.state.liquid_water_fraction, 0.0)
    assert np.all(np.asarray(sim.state.internal_energy) < 0)


def test_energy_tendencies_finite():
    """Reference `soil_energy_tests.jl:51-61`."""
    sim = _soil_sim(initializers={
        "temperature": lambda x, z: 0.0 - 0.01 * z,
        "saturation_water_ice": 1.0,
    })
    model, ctx = sim.model, sim.ctx
    state = model.compute_tendencies(sim.state, ctx)
    assert np.all(np.isfinite(np.asarray(state.tendencies["internal_energy"])))


def test_energy_closure_positive():
    """Reference `soil_energy_tests.jl:63-73`."""
    sim = _soil_sim(initializers={"saturation_water_ice": 1.0})
    state = sim.state.update(internal_energy=jnp.full_like(sim.state.internal_energy, 1.0e6))
    state = sim.model.closure(state, sim.ctx)
    assert np.all(np.asarray(state.temperature) > 0)
    np.testing.assert_allclose(state.liquid_water_fraction, 1.0)


# ---------------------------------------------------------------------------
# Analytic convergence tests (reference `soil_energy_tests.jl:75-190`)
# ---------------------------------------------------------------------------
def _solid_medium_model(spacing, k=2.0, c=1.0e6):
    """Porosity-0 "solid medium" configuration isolating linear conduction
    (reference `soil_energy_tests.jl:100-116`)."""
    grid = tt.ColumnGrid.of(cells=1, spacing=spacing, nf=np.float64)
    strat = tt.HomogeneousStratigraphy(
        porosity=tt.ConstantSoilPorosity(mineral_porosity=0.0))
    thermal_properties = tt.SoilThermalProperties(
        conductivities=tt.SoilThermalConductivities(mineral=k),
        heat_capacities=tt.SoilHeatCapacities(mineral=c),
    )
    soil = tt.SoilEnergyWaterCarbon(
        strat=strat,
        energy=tt.SoilEnergyBalance(thermal_properties=thermal_properties),
        biogeochem=tt.ConstantSoilCarbonDensity(rho_soc=0.0),
    )
    return tt.SoilModel(grid=grid, soil=soil)


def test_heat_diffusion_periodic_upper_bc():
    """1D heat equation vs analytic periodic-BC solution; max relative error
    < 0.1 over 2 periods (reference `soil_energy_tests.jl:89-140`)."""
    T0, A, P = 2.0, 1.0, 24 * 3600.0
    k, c = 2.0, 1.0e6
    alpha = k / c
    w = np.sqrt(np.pi / (alpha * P))

    def T_sol(zdepth, t):
        return T0 + A * np.exp(-zdepth * w) * np.sin(2 * np.pi * t / P - zdepth * w)

    model = _solid_medium_model(tt.ExponentialSpacing(dz_min=0.05, dz_max=100.0, N=100),
                                k=k, c=c)
    bcs = tt.PrescribedSurfaceTemperature(
        lambda t: T0 + A * jnp.sin(2 * jnp.pi * t / P))
    sim = tt.initialize(
        model, tt.ForwardEuler(),
        initializers={"temperature": lambda x, z: T_sol(-z, 0.0),
                      "saturation_water_ice": 0.0},
        boundary_conditions=bcs)

    dt = 60.0
    steps = int(2 * P / dt)
    z_depth = -model.grid.vertical.z_centers  # positive down
    max_rel_err = 0.0
    chunk = 60  # compare once per simulated hour
    for i in range(steps // chunk):
        sim.run(steps=chunk, dt=dt)
        t = sim.current_time
        target = T_sol(z_depth, t)
        Ts = np.asarray(sim.state.temperature[:, 0])
        max_rel_err = max(max_rel_err, np.max(np.abs((Ts - target) / target)))
    assert max_rel_err < 0.1, max_rel_err


def test_heat_diffusion_step_response():
    """Step change of surface temperature vs erfc solution; final-step error
    < 1e-3 (reference `soil_energy_tests.jl:142-190`)."""
    T0, T1 = 1.0, 2.0
    k, c = 3.8, 2.0e6  # mineral defaults
    alpha = k / c
    model = _solid_medium_model(tt.ExponentialSpacing(dz_min=0.01, dz_max=100.0, N=100),
                                k=k, c=c)
    bcs = tt.PrescribedSurfaceTemperature(T1)
    sim = tt.initialize(model, tt.ForwardEuler(),
                        initializers={"temperature": T0,
                                      "saturation_water_ice": 0.0},
                        boundary_conditions=bcs)
    dt = 10.0
    t_end = 24 * 3600.0
    sim.run(steps=int(t_end / dt), dt=dt)
    z_depth = -model.grid.vertical.z_centers
    target = T0 + (T1 - T0) * erfc(z_depth / (2 * np.sqrt(alpha * t_end)))
    Ts = np.asarray(sim.state.temperature[:, 0])
    rel_err = np.abs((Ts - target) / target)
    assert np.max(rel_err) < 1.0e-3, np.max(rel_err)
