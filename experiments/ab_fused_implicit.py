"""On-chip A/B: fused Pallas rollout of the IMPLICIT stepper (VERDICT r4
item 4 — BASELINE config #2 was 4.8x below the explicit headline, its PCR
solve launch-bound at 12.7% SoL).

The implicit step (linearized assemble + PCR tridiagonal solves) is
pad-shift/row-mask pure, so it traces into the fused VMEM-resident kernel
unchanged (interpret equivalence locked in tests/test_fused_step.py). This
measures XLA vs fused on the N145-scale config with an inner/block sweep,
in one process.

Run: python experiments/ab_fused_implicit.py [--cells N]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DT = 900.0


def build_sim(tt, cells):
    grid = tt.ColumnGrid.of(cells=cells, spacing=tt.ExponentialSpacing(N=30),
                            nf=np.float32)
    props = tt.ConstantSoilHydraulics(
        swrc=tt.VanGenuchten(alpha=2.0, n=2.0),
        unsat_hydraulic_cond=tt.UnsatKVanGenuchten())
    soil = tt.SoilEnergyWaterCarbon(
        hydrology=tt.SoilHydrology(vertical_flow=tt.RichardsEq(),
                                   hydraulic_properties=props))
    model = tt.SoilModel(grid=grid, soil=soil)
    return tt.initialize(
        model, tt.ImplicitEuler(dt=DT),
        initializers={
            "temperature": lambda x, z: 1.0 + 0.0 * z,
            "saturation_water_ice": lambda x, z: np.minimum(1.0,
                                                            0.6 - 0.04 * z)},
        boundary_conditions=tt.PrescribedSurfaceTemperature(
            lambda t: -5.0 + 0.0 * t))


def measure(sim, jax, n, reps=4):
    roll = sim._rollout_fn(n)
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
    return {"median_s": round(med, 3), "compile_s": round(compile_s, 1),
            "mcells_steps_per_s": round(
                sim.model.grid.cells * n / med / 1e6, 1)}


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    import terrarium_tpu as tt

    cells = int(sys.argv[sys.argv.index("--cells") + 1]) \
        if "--cells" in sys.argv else 24576
    n = 576

    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    with jax.default_device(cpu):
        sim = build_sim(tt, cells)
    sim.state = jax.device_put(sim.state, dev)

    rows = {}
    sim.fused_inner_steps = None
    rows["xla"] = measure(sim, jax, n)
    print(json.dumps({"variant": "xla", **rows["xla"]}), flush=True)

    for inner, block in ((48, 512), (96, 512), (48, 256), (48, 1024)):
        sim.fused_inner_steps = inner
        sim.fused_block_cells = block
        key = f"fused_i{inner}_b{block}"
        try:
            rows[key] = measure(sim, jax, n)
        except Exception as e:
            rows[key] = {"error": f"{type(e).__name__}: {e}"[:200]}
        print(json.dumps({"variant": key, **rows[key]}), flush=True)

    best = max((v.get("mcells_steps_per_s", 0.0), k) for k, v in rows.items())
    print(json.dumps({"best": best[1], "mcells_steps_per_s": best[0],
                      "vs_xla": round(best[0] / max(
                          rows["xla"]["mcells_steps_per_s"], 1e-9), 3)}))


if __name__ == "__main__":
    main()
