"""Global soil heat on the masked ERA5-land N72 Gaussian grid.

Port of reference `examples/simulations/soil_heat_global.jl` (BASELINE config
#3): SoilModel over all land cells of the N72 ERA5-land mask with a
latitude-dependent surface-temperature forcing, writing scattered lat-lon
output. Run: python examples/soil_heat_global.py
"""
import jax.numpy as jnp
import numpy as np

import terrarium_tpu as tt

MASK = "/root/reference/inputs/era5-land_land_sea_mask_N72.nc"

mask, lats, lons = tt.load_land_mask(MASK)
ring = tt.full_gaussian_grid(72)
grid = tt.ColumnRingGrid.create(ring, mask, spacing=tt.ExponentialSpacing(N=30),
                                nf=np.float32, pad_multiple=8)
print(grid)

model = tt.SoilModel(grid=grid)

# idealized latitude-dependent surface temperature with a diurnal cycle
lat = jnp.asarray(grid.cell_lats, dtype=np.float32)
T_mean = 25.0 - 0.6 * jnp.abs(lat)


def surface_temperature(t):
    return T_mean + 5.0 * jnp.sin(2 * jnp.pi * t / 86400.0)


sim = tt.initialize(
    model, tt.ForwardEuler(),
    initializers={"temperature": lambda x, z: np.asarray(T_mean)[None, :] + 0.0 * z,
                  "saturation_water_ice": 0.5},
    boundary_conditions=tt.PrescribedSurfaceTemperature(surface_temperature),
)

writer = tt.FieldTimeSeriesWriter("soil_heat_global_out.h5",
                                  ["ground_temperature"],
                                  schedule=tt.TimeInterval(6 * 3600.0),
                                  scatter=True)
sim.run(period=2 * 86400.0, dt=900.0, callbacks=[writer, tt.ProgressLogger()],
        callback_interval=writer.schedule.steps_hint(900.0))

raster = grid.scatter(np.asarray(sim.state.ground_temperature))
print("final ground temperature raster:", raster.shape,
      "land mean=%.2f degC" % np.nanmean(raster))
