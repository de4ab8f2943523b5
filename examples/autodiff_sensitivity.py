"""Differentiating through a soil simulation.

Port of reference `examples/autodiff/differentiating_terrarium.jl` with
jax.grad + jax.checkpoint replacing Enzyme + Checkpointing.jl: the gradient
of the final mean soil temperature with respect to the mineral thermal
conductivity, through a checkpointed 1-day rollout.
"""
import jax
import jax.numpy as jnp
import numpy as np

import terrarium_tpu as tt
from terrarium_tpu.timesteppers.autodiff import make_rollout_fn


def mean_final_temperature(k_mineral):
    grid = tt.ColumnGrid.of(cells=1, spacing=tt.ExponentialSpacing(N=20),
                            nf=np.float64)
    tp = tt.SoilThermalProperties(
        conductivities=tt.SoilThermalConductivities(mineral=k_mineral))
    soil = tt.SoilEnergyWaterCarbon(energy=tt.SoilEnergyBalance(thermal_properties=tp))
    model = tt.SoilModel(grid=grid, soil=soil)
    sim = tt.initialize(model, tt.ForwardEuler(),
                        initializers={"temperature": -1.0,
                                      "saturation_water_ice": 0.8},
                        boundary_conditions=tt.PrescribedSurfaceTemperature(4.0))
    roll = make_rollout_fn(sim.model, sim.timestepper, sim.ctx, (),
                           steps=288, remat=True)  # 1 day at dt=300s, remat
    out = roll(sim.state, 300.0)
    return jnp.mean(out.temperature)


jax.config.update("jax_enable_x64", True)
value, grad = jax.value_and_grad(mean_final_temperature)(jnp.float64(3.8))
print(f"mean T after 1 day = {float(value):.4f} degC")
print(f"d<T>/d(k_mineral)  = {float(grad):.6f} degC per W/m/K")
