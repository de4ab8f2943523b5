"""Fully-coupled land column: soil + surface energy balance + surface
hydrology + PALADYN vegetation.

Port of reference `examples/simulations/land_column.jl` (BASELINE config #4
physics, single column). Uses per-second rate units for the vegetation
turnover (see VegetationCarbon.consistent_units) for stable multi-day runs.
"""
import jax.numpy as jnp
import numpy as np

import terrarium_tpu as tt

grid = tt.ColumnGrid.of(cells=1, spacing=tt.ExponentialSpacing(N=20), nf=np.float32)

soil = tt.SoilEnergyWaterCarbon(
    strat=tt.HomogeneousStratigraphy(texture=tt.SoilTexture.preset("loam")),
    hydrology=tt.SoilHydrology(vertical_flow=tt.RichardsEq()),
)
model = tt.LandModel(
    grid=grid,
    vegetation=tt.VegetationCarbon.consistent_units(),
    soil=soil,
    # Monin-Obukhov stability-iterated drag (extension beyond the reference's
    # constant bulk C_h = 1.2e-3, which at low wind is so resistive that the
    # surface equilibrates far too hot)
    atmosphere=tt.PrescribedAtmosphere(
        aerodynamics=tt.MoninObukhovAerodynamics()),
    # energy-conserving ground-flux residual (the reference's form has a
    # wrong-signed turbulent feedback; see SurfaceEnergyBalance docstring)
    surface_energy_balance=tt.SurfaceEnergyBalance.consistent(),
    surface_hydrology=tt.SurfaceHydrology(
        evapotranspiration=tt.PALADYNCanopyEvapotranspiration.consistent_units(
            ground_resistance=tt.SoilMoistureResistanceFactor())),
)

# diurnal shortwave cycle + steady rain (~4 mm/day)
times = np.arange(0.0, 6 * 86400.0, 3600.0)
sw = 700.0 * np.maximum(0.0, np.sin(2 * np.pi * (times / 86400.0 - 0.25)))
forcing = tt.TimeSeriesInputSource(
    times=times,
    series={"surface_shortwave_down": sw,
            "air_temperature": 15.0 + 6.0 * np.sin(2 * np.pi * (times / 86400.0 - 0.3))})
static = tt.FieldInputSource(fields={
    "surface_longwave_down": 320.0,
    "rainfall": 5.0e-8,
    "windspeed": 2.0,
})

sim = tt.initialize(
    model, tt.ForwardEuler(),
    initializers={"temperature": 10.0, "saturation_water_ice": 0.7,
                  "carbon_vegetation": 2.0, "vegetation_area_fraction": 0.6},
    input_sources=(forcing, static),
)

sim.run(period=5 * 86400.0, dt=600.0)
st = sim.state
print(f"after 5 days: Ts={float(st.skin_temperature[0]):.2f} degC  "
      f"LAI={float(st.leaf_area_index[0]):.2f}  "
      f"C_veg={float(st.carbon_vegetation[0]):.3f} kg/m^2  "
      f"GPP={float(st.gross_primary_production[0]):.3e} kg/m^2/s  "
      f"sat_top={float(st.saturation_water_ice[-1, 0]):.3f}")
