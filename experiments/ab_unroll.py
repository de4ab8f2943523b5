"""In-process A/B: rollout scan unroll factor on the N145 bench config.

Blocks are 1440 steps so the ~35 ms tunnel dispatch+sync cost is <2% of the
block (60-step blocks are sync-dominated and mask real differences).

Per CLAUDE.md, bench variance across processes is ±20-30%, so all variants
run back-to-back in ONE process on the real chip. Prints one JSON line per
variant.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_sim():
    import jax
    import terrarium_tpu as tt

    import h5py

    with h5py.File("/root/reference/inputs/era5-land_land_sea_mask_N145.nc", "r") as f:
        cells = int((np.asarray(f["lsm"][0]) > 0.5).sum())

    grid = tt.ColumnGrid.of(cells=cells, spacing=tt.ExponentialSpacing(N=30),
                            nf=np.float32)
    hydrology = tt.SoilHydrology(
        vertical_flow=tt.RichardsEq(),
        hydraulic_properties=tt.ConstantSoilHydraulics(
            swrc=tt.VanGenuchten(alpha=2.0, n=2.0),
            unsat_hydraulic_cond=tt.UnsatKVanGenuchten()))
    soil = tt.SoilEnergyWaterCarbon(hydrology=hydrology)
    model = tt.SoilModel(grid=grid, soil=soil)
    sim = tt.initialize(
        model, tt.ForwardEuler(dt=60.0),
        initializers={
            "temperature": lambda x, z: 1.0 + 0.0 * z,
            "saturation_water_ice": lambda x, z: np.minimum(1.0, 0.5 - 0.05 * z),
        },
        boundary_conditions=tt.PrescribedSurfaceTemperature(
            lambda t: 5.0 * jax.numpy.sin(2 * jax.numpy.pi * t / 86400.0)),
    )
    return sim, cells


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    sim, cells = build_sim()
    steps = 1440
    dt = 60.0

    def sync(state):
        return float(np.asarray(jax.numpy.sum(state.prognostic["internal_energy"])))

    state0 = sim.state
    for unroll in (1, 2, 4):
        sim.scan_unroll = unroll
        roll = sim._rollout_fn(steps)
        t0 = time.perf_counter()
        s = roll(state0, dt)
        sync(s)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            s = roll(s, dt)
            sync(s)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        print(json.dumps({
            "unroll": unroll,
            "median_s_per_block": round(med, 4),
            "cells_steps_per_s": round(cells * steps / med / 1e6, 2),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
