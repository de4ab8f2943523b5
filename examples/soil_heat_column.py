"""Soil heat conduction in a 1D vertical column.

Port of reference `examples/simulations/soil_heat_column.jl`: nonlinear heat
conduction with freeze/thaw in a single exponentially-spaced soil column
(BASELINE config #1). Run: python examples/soil_heat_column.py
"""
import jax

# dev machines: force CPU if no real accelerator is wanted
# jax.config.update("jax_platforms", "cpu")

import numpy as np

import terrarium_tpu as tt

# single column, 10 exponentially spaced layers, float32
grid = tt.ColumnGrid.of(cells=1, spacing=tt.ExponentialSpacing(N=10), nf=np.float32)

# quasi-steady-state temperature (linear in depth), fully saturated water/ice
initializer = tt.SoilInitializer(
    energy=tt.QuasiThermalSteadyState(T0=-1.0),
    hydrology=tt.ConstantSaturation(sat=1.0),
)

model = tt.SoilModel(grid=grid, initializer=initializer)

# constant 1 degC surface temperature; default zero-flux bottom boundary
boundary_conditions = tt.PrescribedSurfaceTemperature(1.0)

sim = tt.initialize(model, tt.ForwardEuler(), boundary_conditions=boundary_conditions)

sim.timestep()  # single step (compiles on first call)
sim.run(period=3 * 86400.0)  # three days

T = np.asarray(sim.state.temperature[:, 0])
liq = np.asarray(sim.state.liquid_water_fraction[:, 0])
z = grid.vertical.z_centers

print("depth [m]   T [degC]   liquid fraction")
for k in reversed(range(grid.nz)):
    print(f"{z[k]:9.2f}  {T[k]:9.3f}  {liq[k]:9.3f}")
