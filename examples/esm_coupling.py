"""Coupling the land model to an atmosphere component (ESM contract).

Port of the reference's SpeedyWeather coupling example
(`examples/simulations/speedy_dry_land.jl`, SURVEY §3.5): the atmosphere
component writes its near-surface state into the land model's *input fields*
each coupling step, the land model substeps at its own dt, and hands its
top-layer (skin/ground) temperature back to the atmosphere. Here a toy
energy-balance atmosphere stands in for SpeedyWeather.
"""
import jax.numpy as jnp
import numpy as np

import terrarium_tpu as tt

# -- land component ---------------------------------------------------------
grid = tt.ColumnGrid.of(cells=128, spacing=tt.ExponentialSpacing(N=15),
                        nf=np.float32)
land = tt.LandModel(grid=grid,
                    surface_energy_balance=tt.SurfaceEnergyBalance.consistent())
sim = tt.initialize(
    land, tt.ForwardEuler(),
    initializers={"temperature": 5.0, "saturation_water_ice": 0.6},
)

# -- toy atmosphere: a slab with per-cell heat capacity ---------------------
T_air = np.full(grid.cells, 10.0, dtype=np.float32)  # degC
C_slab = 1.0e5  # J/m^2/K
dt_atmos = 3600.0  # atmosphere coupling step
dt_land = 300.0  # land substep

for step in range(24):  # one simulated day
    # 1. atmosphere -> land: write forcing into the land input fields
    #    (the exchange contract: set input fields, reference
    #    `speedy_dry_land.jl:45-55`)
    sim.state = sim.state.update(air_temperature=jnp.asarray(T_air))

    # 2. land substeps inside one atmosphere step
    sim.run(period=dt_atmos, dt=dt_land)

    # 3. land -> atmosphere: top-layer temperature feeds the slab's surface
    #    flux (reference `speedy_dry_land.jl:62-66`)
    T_surf = np.asarray(sim.state.ground_temperature)
    H = np.asarray(sim.state.sensible_heat_flux)  # positive up = heats the air
    T_air = T_air + (H * dt_atmos) / C_slab

print(f"after 1 day: air={T_air.mean():.2f} degC, "
      f"land surface={np.asarray(sim.state.ground_temperature).mean():.2f} degC, "
      f"coupled fluxes finite={np.isfinite(H).all()}")
