"""Grid-size throughput sweep (reference benchmark protocol; VERDICT r4
item 7).

Reproduces `test/benchmarks/gpu/soil_heat_hydrology_global.jl:39-58` on the
chip: SoilModel heat + RichardsEq, Nz=30 ExponentialSpacing, Float32,
dt=60 s, annual-cycle surface temperature BC, FullGaussianGrid sizes
nlat_half in {2^1..2^9} (npoints = 8*nlat_half^2, up to ~2.1M cells, the
reference's "~2M grid points" sweep). Per size: one simulated hour
(60 steps) per timing block, median of reps, for BOTH production paths
(XLA lean scan and fused Pallas rollout), measured back-to-back in one
process (cross-process chip variance is ±20-30%, CLAUDE.md). At three
sizes the fused cell-block is re-swept {256,512,1024} (CLAUDE.md:
"block-size sensitive, re-sweep when shapes change").

Emits SWEEP_r04.json (one entry per size) — the committed
throughput-vs-cells curve with the launch-bound -> bandwidth-bound
crossover, feeding integrator.default_fused_block.

Run: python experiments/run_sweep.py [--max-exp 9] [--reps 3]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 60  # one simulated hour at dt=60
DT = 60.0
BLOCK_SWEEP_AT = {16, 128, 512}
BLOCKS = (256, 512, 1024)


def build_sim(tt, nlat_half, block):
    import jax.numpy as jnp

    ring = tt.full_gaussian_grid(nlat_half)
    mask = np.ones(ring.shape, bool)  # reference sweep is unmasked
    grid = tt.ColumnRingGrid.create(ring, mask,
                                    spacing=tt.ExponentialSpacing(N=30),
                                    nf=np.float32, pad_multiple=8)
    hydrology = tt.SoilHydrology(
        vertical_flow=tt.RichardsEq(),
        hydraulic_properties=tt.ConstantSoilHydraulics(
            swrc=tt.VanGenuchten(alpha=2.0, n=2.0),
            unsat_hydraulic_cond=tt.UnsatKVanGenuchten()))
    soil = tt.SoilEnergyWaterCarbon(hydrology=hydrology)
    model = tt.SoilModel(grid=grid, soil=soil, initializer=tt.SoilInitializer())
    bc = tt.PrescribedSurfaceTemperature(
        lambda t: 30.0 * jnp.sin(2.0 * jnp.pi * t / (365.0 * 24.0 * 3600.0)))
    sim = tt.initialize(model, tt.ForwardEuler(dt=DT), boundary_conditions=bc)
    sim.fused_block_cells = block
    return sim


def time_path(sim, jax, fused, reps, block=None):
    sim.fused_inner_steps = STEPS if fused else None
    if block is not None:
        sim.fused_block_cells = block
    try:
        roll = sim._rollout_fn(STEPS)
        state = sim.state
        t0 = time.perf_counter()
        state = roll(state, DT)
        jax.block_until_ready(jax.tree.leaves(state)[0])
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            state = roll(state, DT)
            jax.block_until_ready(jax.tree.leaves(state)[0])
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        return {"median_s": round(med, 4), "compile_s": round(compile_s, 1),
                "mcells_steps_per_s": round(
                    sim.model.grid.cells * STEPS / med / 1e6, 1),
                "sypd": round((STEPS * DT / (365 * 86400.0))
                              / (med / 86400.0), 1)}
    except Exception as e:
        return {"error": f"{type(e).__name__}: {e}"[:200]}


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    import terrarium_tpu as tt

    max_exp = int(sys.argv[sys.argv.index("--max-exp") + 1]) \
        if "--max-exp" in sys.argv else 9
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) \
        if "--reps" in sys.argv else 3

    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    entries = []
    for e in range(1, max_exp + 1):
        nlat_half = 2 ** e
        with jax.default_device(cpu):
            sim = build_sim(tt, nlat_half, block=512)
        sim.state = jax.device_put(sim.state, dev)
        row = {"nlat_half": nlat_half, "cells": sim.model.grid.cells,
               "xla": time_path(sim, jax, fused=False, reps=reps),
               "fused_b512": time_path(sim, jax, fused=True, reps=reps,
                                       block=512)}
        if nlat_half in BLOCK_SWEEP_AT:
            for b in BLOCKS:
                if b == 512:
                    continue
                row[f"fused_b{b}"] = time_path(sim, jax, fused=True,
                                               reps=reps, block=b)
        entries.append(row)
        print(json.dumps(row), flush=True)
        del sim

    out = {"protocol": "soil_heat_hydrology_global.jl:39-58, 1 sim-hour "
                       "blocks, dt=60, Nz=30, f32, unmasked FullGaussian",
           "steps_per_block": STEPS, "reps": reps, "entries": entries}
    with open("/root/repo/SWEEP_r04.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote SWEEP_r04.json")


if __name__ == "__main__":
    main()
