"""Global soil heat driven by an ERA5-style NetCDF air-temperature raster.

Port of reference `examples/simulations/soil_heat_global_era5.jl`: load the
N72 ERA5-land mask, build the masked ring grid, and force the soil surface
temperature from a time-varying NetCDF raster through `RasterInputSource`
(mask gather + on-device linear time interpolation).

The reference reads `inputs/external/era5-land/.../era5_land_2m_temperature_
2023_N72.nc`, which is NOT shipped with the repository (zero egress here, so
it cannot be downloaded either). This script synthesizes an equivalent file
— the same dims/metadata layout as an ERA5-land extract (time in hours,
(time, lat, lon) temperature in Kelvin with a seasonal+diurnal cycle) — with
our own `write_netcdf`, then runs the exact flow the reference example runs.

Run: python examples/soil_heat_global_era5.py [--days 4]
"""
import argparse
import os

import numpy as np

import terrarium_tpu as tt

MASK = "/root/reference/inputs/era5-land_land_sea_mask_N72.nc"


def synthesize_era5_temperature(path, ring, days, step_hours=3):
    """Write an ERA5-like 2m-temperature NetCDF: (time, lat, lon), Kelvin,
    time coordinate in hours (the ERA5 convention handled by
    `raster_input_source`)."""
    from terrarium_tpu.io.netcdf import NCVariable, write_netcdf

    hours = np.arange(0.0, days * 24.0 + 1e-9, step_hours)
    lat = np.asarray(ring.lats)  # north to south
    lon = np.asarray(ring.lons)
    t = hours[:, None, None] / 24.0  # days
    latg = lat[None, :, None]
    # warm tropics, cold poles, small diurnal cycle, slow warming trend
    T = (288.15 + 25.0 * np.cos(np.deg2rad(latg)) - 15.0
         + 4.0 * np.sin(2 * np.pi * (t - 0.25))
         + 0.2 * t + 0.0 * lon[None, None, :])
    write_netcdf(path, {
        "t2m": NCVariable("t2m", T.astype(np.float32),
                          ["time", "lat", "lon"], {"units": "K"}),
        "time": NCVariable("time", hours, ["time"],
                           {"units": "hours since 2023-01-01"}),
    }, coords={"lat": lat, "lon": lon})
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--days", type=float, default=4.0)
    ap.add_argument("--dt", type=float, default=1800.0)
    ap.add_argument("--nz", type=int, default=20)
    args = ap.parse_args()

    mask, _, _ = tt.load_land_mask(MASK)
    ring = tt.full_gaussian_grid(72)
    grid = tt.ColumnRingGrid.create(ring, mask,
                                    spacing=tt.ExponentialSpacing(N=args.nz),
                                    nf=np.float32, pad_multiple=8)

    forcing_path = synthesize_era5_temperature("era5_t2m_synthetic_N72.nc",
                                               ring, args.days)
    # packed (T, cells) gather + per-step linear time interpolation, exactly
    # the reference RasterInputSource flow (TerrariumRastersExt.jl:96-121);
    # Kelvin -> Celsius happens in the BC below, like the reference's
    # `Tair .- 273.15`.
    source = tt.RasterInputSource(grid, forcing_path,
                                  variables={"air_temperature_k": "t2m"})

    model = tt.SoilModel(grid=grid)
    sim = tt.initialize(
        model, tt.ForwardEuler(),
        initializers={"temperature": 5.0, "saturation_water_ice": 0.5},
        boundary_conditions=tt.PrescribedSurfaceTemperature(
            lambda t, state: state.inputs["air_temperature_k"] - 273.15),
        input_sources=(source,))

    writer = tt.NetCDFRasterWriter(
        "soil_heat_global_era5_out.nc", ["ground_temperature"],
        schedule=tt.TimeInterval(86400.0), units={"ground_temperature": "degC"})
    sim.run(period=args.days * 86400.0, dt=args.dt,
            callbacks=[writer],
            callback_interval=writer.schedule.steps_hint(args.dt))

    T = np.asarray(sim.state.ground_temperature)[:grid.n_land]
    lats = grid.cell_lats[:grid.n_land]
    tropics = T[np.abs(lats) < 20.0].mean()
    poles = T[np.abs(lats) > 66.0].mean()
    print(f"{grid.n_land} land cells, {sim.iteration} steps: "
          f"tropical mean {tropics:.1f} degC, polar mean {poles:.1f} degC")
    assert np.isfinite(T).all()
    assert tropics > poles  # the forcing gradient reached the soil
    assert os.path.exists("soil_heat_global_era5_out.nc")


if __name__ == "__main__":
    main()
