"""Seasonal snowpack on a coupled land column (extension beyond the
reference — see terrarium_tpu/processes/snow.py).

A cold "winter" with steady snowfall builds the pack (and brightens the
surface through the SnowCoverAlbedo feedback that LandModel installs
automatically); a warm "spring" melts it, and the melt water joins the
rainfall_ground -> infiltration/runoff partition, wetting the soil column.

Run: python examples/land_snow_winter.py [--days-per-season 5]
"""
import argparse

import numpy as np

import terrarium_tpu as tt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--days-per-season", type=float, default=5.0)
    ap.add_argument("--dt", type=float, default=900.0)
    args = ap.parse_args()
    season = args.days_per_season * 86400.0

    grid = tt.ColumnGrid.of(cells=1, spacing=tt.ExponentialSpacing(N=15),
                            nf=np.float32)
    soil = tt.SoilEnergyWaterCarbon(
        strat=tt.HomogeneousStratigraphy(texture=tt.SoilTexture.preset("loam")),
        hydrology=tt.SoilHydrology(
            vertical_flow=tt.RichardsEq(),
            hydraulic_properties=tt.ConstantSoilHydraulics(
                swrc=tt.VanGenuchten(alpha=2.0, n=2.0),
                unsat_hydraulic_cond=tt.UnsatKVanGenuchten())))
    model = tt.LandModel(
        grid=grid, soil=soil, snow=tt.Snowpack(),
        surface_energy_balance=tt.SurfaceEnergyBalance.consistent(),
        surface_hydrology=tt.SurfaceHydrology(
            canopy_interception=tt.NoCanopyInterception(),
            evapotranspiration=tt.BareGroundEvaporation.consistent_units(),
            surface_runoff=tt.DirectSurfaceRunoff.consistent()))
    assert isinstance(model.surface_energy_balance.albedo, tt.SnowCoverAlbedo)

    # winter: -12 degC with snowfall; spring: +8 degC, no precipitation
    times = np.array([0.0, season, season + 1.0, 2 * season])
    forcing = tt.TimeSeriesInputSource(
        times=times,
        series={"air_temperature": np.array([-12.0, -12.0, 8.0, 8.0]),
                "snowfall": np.array([3e-8, 3e-8, 0.0, 0.0])})
    static = tt.FieldInputSource(fields={
        "surface_shortwave_down": 250.0, "surface_longwave_down": 300.0,
        "windspeed": 2.0})

    sim = tt.initialize(
        model, tt.ForwardEuler(),
        initializers={"temperature": -1.0, "saturation_water_ice": 0.5},
        input_sources=(forcing, static))

    sim.run(period=season, dt=args.dt)
    swe_peak = float(sim.state.snow_water_equivalent[0])
    sw_up_snow = float(sim.state.surface_shortwave_up[0])
    sat_mid = float(np.asarray(sim.state.saturation_water_ice).mean())
    print(f"end of winter: SWE={swe_peak * 1e3:.1f} mm, "
          f"SW_up={sw_up_snow:.0f} W/m^2 (albedo feedback), "
          f"mean saturation={sat_mid:.3f}")

    # early spring: the pack is melting and the melt water infiltrates
    # (sample early: at +8 degC the degree-day melt is ~40 mm/day, so the
    # pack is gone within a fraction of a day)
    sim.run(steps=2, dt=args.dt)
    melt_rate = float(sim.state.auxiliary["snow_melt"][0])
    infil = float(sim.state.auxiliary["infiltration"][0])
    print(f"early spring: melt={melt_rate * 86400 * 1e3:.1f} mm/day, "
          f"infiltration={infil * 86400 * 1e3:.1f} mm/day")

    sim.run(period=season - 2 * args.dt, dt=args.dt)
    swe_end = float(sim.state.snow_water_equivalent[0])
    sw_up_bare = float(sim.state.surface_shortwave_up[0])
    print(f"end of spring: SWE={swe_end * 1e3:.1f} mm, "
          f"SW_up={sw_up_bare:.0f} W/m^2")

    assert swe_peak > 0.9 * 3e-8 * season          # the pack built up
    assert swe_end < 0.2 * swe_peak                # and mostly melted
    assert sw_up_snow > sw_up_bare                 # snow brightened the surface
    assert melt_rate > 0 and infil > 0             # melt water entered the soil
    assert np.isfinite(np.asarray(sim.state.temperature)).all()


if __name__ == "__main__":
    main()
