"""(inner, block) sweep of the fused-bwd gradient at FULL config-6 size.

At 56,952 cells the fixed overheads amortize far better than the 24.5k
attribution runs (82.1 vs 52.3 M): sweep the schedule at the real size to
see whether the 90 M round target is reachable.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    import terrarium_tpu as tt
    from terrarium_tpu.timesteppers.fused_grad import make_fused_grad_rollout

    import h5py

    with h5py.File("/root/reference/inputs/era5-land_land_sea_mask_N145.nc",
                   "r") as f:
        n_land = int((np.asarray(f["lsm"][0]) > 0.5).sum())
    cells, steps = -(-n_land // 8) * 8, 288
    grid = tt.ColumnGrid.of(cells=cells, spacing=tt.ExponentialSpacing(N=20),
                            nf=np.float32)

    def model_fn(log_ksat):
        props = tt.ConstantSoilHydraulics(
            sat_hydraulic_cond=jnp.exp(log_ksat),
            swrc=tt.VanGenuchten(alpha=2.0, n=2.0),
            unsat_hydraulic_cond=tt.UnsatKVanGenuchten())
        soil = tt.SoilEnergyWaterCarbon(hydrology=tt.SoilHydrology(
            vertical_flow=tt.RichardsEq(), hydraulic_properties=props))
        return tt.SoilModel(grid=grid, soil=soil)

    x0 = float(np.log(1e-5))
    sim = tt.initialize(
        model_fn(x0), tt.ForwardEuler(),
        initializers={
            "temperature": -1.0,
            "saturation_water_ice": lambda x, z: np.minimum(
                1.0, 0.6 - 0.04 * z)},
        boundary_conditions=tt.PrescribedSurfaceTemperature(4.0))

    def objective(out):
        return (jnp.mean(out.temperature)
                + jnp.mean(out.saturation_water_ice))

    for inner, block in ((48, 512), (96, 256), (48, 640), (96, 384),
                         (144, 256)):
        try:
            roll = make_fused_grad_rollout(
                model_fn, sim.timestepper, sim.ctx, (), steps=steps,
                dt=300.0, inner_steps=inner, block_cells=block,
                bwd="pallas", unroll_outer=True)
            vg = jax.jit(jax.value_and_grad(
                lambda x: objective(roll(sim.state, x))))
            v, g = vg(x0)
            float(v), float(g)
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                v, g = vg(x0)
                float(v), float(g)
                times.append(time.perf_counter() - t0)
            med = float(np.median(times))
            print(json.dumps({"inner": inner, "block": block,
                              "median_s": round(med, 4),
                              "M": round(cells * steps / med / 1e6, 1),
                              "grad": round(float(g), 6)}), flush=True)
        except Exception as e:
            print(json.dumps({"inner": inner, "block": block,
                              "error": f"{type(e).__name__}: {e}"[:160]}),
                  flush=True)


if __name__ == "__main__":
    main()
