"""Differentiating through a soil simulation.

Port of reference `examples/autodiff/differentiating_terrarium.jl` with
jax.grad + jax.checkpoint replacing Enzyme + Checkpointing.jl: the gradient
of the final mean soil temperature with respect to the mineral thermal
conductivity, through a checkpointed rollout.

Default: a single column, 1 day at dt=300 s. With ``--global-grid 72|145``
the same sensitivity is computed over every land cell of the masked
ERA5-land Gaussian grid (BASELINE config #5: differentiable global run).

Run: python examples/autodiff_sensitivity.py [--global-grid 145] [--steps N]
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np

import terrarium_tpu as tt
from terrarium_tpu.timesteppers.autodiff import make_rollout_fn

ap = argparse.ArgumentParser()
ap.add_argument("--global-grid", type=int, default=0, choices=(0, 72, 145),
                help="0 = single column; 72/145 = masked ERA5-land grid")
ap.add_argument("--steps", type=int, default=288)
ap.add_argument("--dt", type=float, default=300.0)
args = ap.parse_args()


def build_grid(nf):
    if args.global_grid:
        mask_path = ("/root/reference/inputs/"
                     f"era5-land_land_sea_mask_N{args.global_grid}.nc")
        mask, _, _ = tt.load_land_mask(mask_path)
        ring = tt.full_gaussian_grid(args.global_grid)
        return tt.ColumnRingGrid.create(ring, mask,
                                        spacing=tt.ExponentialSpacing(N=20),
                                        nf=nf, pad_multiple=8)
    return tt.ColumnGrid.of(cells=1, spacing=tt.ExponentialSpacing(N=20), nf=nf)


def mean_final_temperature(k_mineral):
    nf = np.float64 if not args.global_grid else np.float32
    grid = build_grid(nf)
    tp = tt.SoilThermalProperties(
        conductivities=tt.SoilThermalConductivities(mineral=k_mineral))
    soil = tt.SoilEnergyWaterCarbon(energy=tt.SoilEnergyBalance(thermal_properties=tp))
    model = tt.SoilModel(grid=grid, soil=soil)
    sim = tt.initialize(model, tt.ForwardEuler(),
                        initializers={"temperature": -1.0,
                                      "saturation_water_ice": 0.8},
                        boundary_conditions=tt.PrescribedSurfaceTemperature(4.0))
    roll = make_rollout_fn(sim.model, sim.timestepper, sim.ctx, (),
                           steps=args.steps, remat=True)
    out = roll(sim.state, args.dt)
    return jnp.mean(out.temperature)


if not args.global_grid:
    jax.config.update("jax_enable_x64", True)

x0 = jnp.asarray(3.8, dtype=np.float64 if not args.global_grid else np.float32)
value, grad = jax.jit(jax.value_and_grad(mean_final_temperature))(x0)
where = (f"N{args.global_grid} global grid" if args.global_grid
         else "single column")
print(f"[{where}] mean T after {args.steps} steps = {float(value):.4f} degC")
print(f"d<T>/d(k_mineral)  = {float(grad):.6f} degC per W/m/K")
