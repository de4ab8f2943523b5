"""Global coupled land model on the masked ERA5-land N145 Gaussian grid.

BASELINE config #4: surface energy balance + surface hydrology + PALADYN
vegetation/carbon + soil heat & Richards water over all land cells of the
N145 ERA5-land mask (reference mask `inputs/era5-land_land_sea_mask_N145.nc`;
the reference has no global coupled example script — this extends
`examples/simulations/soil_heat_global.jl` with the full `LandModel`).

Forcing is idealized (latitude-dependent insolation + diurnal cycle) so the
script is self-contained; swap the input sources for `RasterInputSource`s to
drive it with real ERA5 NetCDF files.

Run: python examples/land_global.py [--n 145] [--days 2]
"""
import argparse

import jax.numpy as jnp
import numpy as np

import terrarium_tpu as tt

ap = argparse.ArgumentParser()
ap.add_argument("--n", type=int, default=145, choices=(72, 145))
ap.add_argument("--days", type=float, default=2.0)
ap.add_argument("--dt", type=float, default=600.0)
args = ap.parse_args()

MASK = f"/root/reference/inputs/era5-land_land_sea_mask_N{args.n}.nc"

mask, lats, lons = tt.load_land_mask(MASK)
ring = tt.full_gaussian_grid(args.n)
grid = tt.ColumnRingGrid.create(ring, mask, spacing=tt.ExponentialSpacing(N=20),
                                nf=np.float32, pad_multiple=8)
print(grid)

soil = tt.SoilEnergyWaterCarbon(
    strat=tt.HomogeneousStratigraphy(texture=tt.SoilTexture.preset("loam")),
    hydrology=tt.SoilHydrology(vertical_flow=tt.RichardsEq()),
)

model = tt.LandModel(
    grid=grid,
    vegetation=tt.VegetationCarbon.consistent_units(),
    soil=soil,
    atmosphere=tt.PrescribedAtmosphere(
        aerodynamics=tt.MoninObukhovAerodynamics()),
    surface_energy_balance=tt.SurfaceEnergyBalance.consistent(),
    surface_hydrology=tt.SurfaceHydrology(
        evapotranspiration=tt.PALADYNCanopyEvapotranspiration.consistent_units(
            ground_resistance=tt.SoilMoistureResistanceFactor())),
)

# idealized latitude-dependent climate: insolation, air temperature, rain
lat = np.asarray(grid.cell_lats, dtype=np.float64)
coslat = np.maximum(np.cos(np.deg2rad(lat)), 0.05)
T_mean = 28.0 * coslat - 8.0

hours = np.arange(0.0, (args.days + 1) * 86400.0, 3600.0)
day_frac = hours / 86400.0
# (T, cells) diurnal shortwave modulated by latitude
sw = (900.0 * coslat[None, :]
      * np.maximum(0.0, np.sin(2 * np.pi * (day_frac[:, None] - 0.25))))
ta = T_mean[None, :] + 6.0 * np.sin(2 * np.pi * (day_frac[:, None] - 0.3))

forcing = tt.TimeSeriesInputSource(
    times=hours,
    series={"surface_shortwave_down": sw.astype(np.float32),
            "air_temperature": ta.astype(np.float32)})
static = tt.FieldInputSource(fields={
    "surface_longwave_down": 330.0,
    "rainfall": 4.0e-8,   # ~3.5 mm/day
    "windspeed": 3.0,
})

sim = tt.initialize(
    model, tt.ForwardEuler(),
    initializers={
        "temperature": lambda x, z: T_mean[None, :] + 0.0 * z,
        "saturation_water_ice": 0.6,
        "carbon_vegetation": 2.0,
        "vegetation_area_fraction": 0.5,
    },
    input_sources=(forcing, static),
)

writer = tt.FieldTimeSeriesWriter(
    "land_global_out.h5",
    ["skin_temperature", "gross_primary_production", "leaf_area_index"],
    schedule=tt.TimeInterval(6 * 3600.0), scatter=True)
sim.run(period=args.days * 86400.0, dt=args.dt,
        callbacks=[writer, tt.ProgressLogger()],
        callback_interval=writer.schedule.steps_hint(args.dt))

st = sim.state
gpp = np.asarray(st.gross_primary_production)
print(f"after {args.days:g} days over {grid.n_land} land cells:")
print(f"  skin temperature: mean {float(np.mean(np.asarray(st.skin_temperature))):.2f} degC")
print(f"  GPP: mean {float(np.mean(gpp)):.3e} kgC/m^2/s")
raster = grid.scatter(np.asarray(st.skin_temperature))
print(f"  scattered raster: {raster.shape}, land mean "
      f"{np.nanmean(raster):.2f} degC -> land_global_out.h5")
