"""Extending the framework: a degree-day snow-melt model on a global grid.

Port of the reference tutorial `examples/extending/simple_snow_ddm.jl`:
define a new XY-only process + model (prognostic snow storage, input air
temperature and snowfall), clip negative storage in the `timestep` hook
(reference `simple_snow_ddm.jl:128-131`), and run it globally over the
ERA5-land N72 mask with a Heun stepper and time-series output.

The reference drives the model with RingGrids climatology assets (no egress
here), so the forcing is a synthetic January-like climatology: cold poles,
snowfall concentrated at high latitudes. Dynamics (Kavetski & Kuczera 2007,
reference `simple_snow_ddm.jl:17-31`):

    dS/dt = P - M,   M = k * max(T - T_melt, 0)

Run: python examples/extending_snow_ddm.py [--days 10]
"""
import argparse
import dataclasses

import jax.numpy as jnp
import numpy as np

import terrarium_tpu as tt
from terrarium_tpu.processes.base import Context
from terrarium_tpu.variables import Variables, variables_of


@dataclasses.dataclass(frozen=True)
class DegreeDaySnow:
    """Degree-day snow melt (reference `simple_snow_ddm.jl:50-61`)."""

    k: float = 0.005 / 86400.0    # degree-day factor [m/(K s)]
    T_melt: float = 0.0           # melting point of snow on the ground [degC]

    def variables(self):
        return (
            tt.input("air_temperature", tt.XY(), default=0.0, units="degC"),
            tt.input("snow_fall", tt.XY(), default=0.0, units="m/s"),
            tt.prognostic("snow_storage", tt.XY(), units="m",
                          desc="Snow water equivalent in m"),
        )

    def compute_tendencies(self, state, grid, ctx):
        # reference kernel function `compute_snow_flux_tendency`
        # (`simple_snow_ddm.jl:114-122`) — here one vectorised expression
        # over all cells (the JAX analogue of the per-point kernel).
        T = state.air_temperature
        P = state.snow_fall
        melt = self.k * jnp.maximum(T - self.T_melt, 0.0)
        return state.add_tendencies(snow_storage=P - melt)


@dataclasses.dataclass(frozen=True)
class SnowModel:
    """Model wrapper (reference `simple_snow_ddm.jl:63-74`)."""

    grid: object
    snow_melt: DegreeDaySnow = DegreeDaySnow()
    initializer: object = tt.DefaultInitializer()

    def variables(self):
        return variables_of(self.snow_melt)

    def collated_variables(self):
        return Variables.of(self)

    def make_context(self, bcs=None):
        return Context(bcs=bcs)

    def initialize(self, state, ctx):
        return self.initializer.initialize(state, self)

    def compute_auxiliary(self, state, ctx):
        return state  # no auxiliaries (reference `simple_snow_ddm.jl:107-108`)

    def compute_tendencies(self, state, ctx):
        return self.snow_melt.compute_tendencies(state, self.grid, ctx)

    def closure(self, state, ctx):
        return state

    def invclosure(self, state, ctx):
        return state

    def timestep(self, state, ctx, dt):
        # post-step clipping hook: snow storage is non-negative
        # (reference `Terrarium.timestep!`, `simple_snow_ddm.jl:128-131`)
        return state.update(
            snow_storage=jnp.maximum(state.snow_storage, 0.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--days", type=float, default=10.0)
    ap.add_argument("--dt", type=float, default=3600.0)
    args = ap.parse_args()

    mask, lats, lons = tt.load_land_mask(
        "/root/reference/inputs/era5-land_land_sea_mask_N72.nc")
    ring = tt.full_gaussian_grid(72)
    # z is irrelevant for an XY-only model: one token layer
    grid = tt.ColumnRingGrid.create(ring, mask,
                                    spacing=tt.UniformSpacing(dz=1.0, N=1),
                                    nf=np.float32, pad_multiple=8)

    # synthetic January climatology: warm tropics, snowfall poleward of ~45N/S
    lat = np.asarray(grid.cell_lats, dtype=np.float64)
    T_jan = (28.0 * np.cos(np.deg2rad(lat)) - 10.0
             - 12.0 * np.clip(np.deg2rad(lat), 0, None))  # NH winter
    snowfall = 2.0e-8 * np.clip((np.abs(lat) - 40.0) / 25.0, 0.0, 1.0)

    model = SnowModel(grid=grid)
    sim = tt.initialize(
        model, tt.Heun(dt=args.dt),
        initializers={"snow_storage": 0.5},  # deep snow everywhere
        input_sources=(tt.FieldInputSource(fields={
            "air_temperature": T_jan.astype(np.float32),
            "snow_fall": snowfall.astype(np.float32)}),),
    )

    writer = tt.FieldTimeSeriesWriter(
        "snow_ddm_out.h5", ["snow_storage"],
        schedule=tt.TimeInterval(86400.0), scatter=True)
    sim.run(period=args.days * 86400.0, dt=args.dt,
            callbacks=[writer], callback_interval=writer.schedule.steps_hint(args.dt))

    S = np.asarray(sim.state.snow_storage)[:grid.n_land]
    warm = (T_jan > 15.0)[:grid.n_land]   # cell_lats includes sharding padding
    cold = (T_jan < -5.0)[:grid.n_land]
    print(f"snow storage after {args.days:g} days over {grid.n_land} cells:")
    print(f"  warm cells (T>15C): mean {S[warm].mean():.4f} m (melting away)")
    print(f"  cold cells (T<-5C): mean {S[cold].mean():.4f} m (accumulating)")
    assert np.all(S >= 0.0), "clipping hook keeps storage non-negative"
    assert S[warm].mean() < 0.5 - 0.8 * args.days * 86400.0 * DegreeDaySnow().k * 15.0 \
        or S[warm].mean() < S[cold].mean(), "warm cells must lose snow"


if __name__ == "__main__":
    main()
