"""On-chip A/B of backward-pass remat schedules (VERDICT r4 item 6).

Measures, in ONE process (chip variance across processes is ±20-30%,
CLAUDE.md), the N145-scale heat+Richards gradient workload of
bench_configs.config6: value_and_grad of a mixed T/sat objective wrt
log K_sat through a 288-step rollout, under every remat schedule in
timesteppers/autodiff.py — plus forward-only baselines to split fwd vs bwd
time. Prints one JSON line per variant; paste the table into
docs/performance.md.

Run: python experiments/ab_backward.py [--cells N] [--steps N]
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
    from terrarium_tpu.timesteppers.autodiff import make_rollout_fn

    cells = int(sys.argv[sys.argv.index("--cells") + 1]) \
        if "--cells" in sys.argv else 24576
    steps = int(sys.argv[sys.argv.index("--steps") + 1]) \
        if "--steps" in sys.argv else 288

    cpu = jax.devices("cpu")[0]

    def make_loss(kw, fwd_only=False):
        def loss(log_ksat):
            grid = tt.ColumnGrid.of(cells=cells,
                                    spacing=tt.ExponentialSpacing(N=30),
                                    nf=np.float32)
            props = tt.ConstantSoilHydraulics(
                sat_hydraulic_cond=jnp.exp(log_ksat),
                swrc=tt.VanGenuchten(alpha=2.0, n=2.0),
                unsat_hydraulic_cond=tt.UnsatKVanGenuchten())
            soil = tt.SoilEnergyWaterCarbon(hydrology=tt.SoilHydrology(
                vertical_flow=tt.RichardsEq(), hydraulic_properties=props))
            model = tt.SoilModel(grid=grid, soil=soil)
            sim = tt.initialize(
                model, tt.ForwardEuler(),
                initializers={
                    "temperature": -1.0,
                    "saturation_water_ice": lambda x, z: np.minimum(
                        1.0, 0.6 - 0.04 * z)},
                boundary_conditions=tt.PrescribedSurfaceTemperature(4.0))
            roll = make_rollout_fn(sim.model, sim.timestepper, sim.ctx, (),
                                   steps=steps, **kw)
            out = roll(sim.state, 300.0)
            return (jnp.mean(out.temperature)
                    + jnp.mean(out.saturation_water_ice))
        return loss

    sqrt_seg = 1
    while (sqrt_seg * 2) ** 2 <= steps:
        sqrt_seg *= 2
    variants = {
        "fwd_plain": (dict(), "fwd"),
        "fwd_lean": (dict(lean=True), "fwd"),
        "grad_none": (dict(), "grad"),
        "grad_per_step": (dict(remat=True), "grad"),
        f"grad_seg{sqrt_seg}": (dict(segment=sqrt_seg), "grad"),
        "grad_lean": (dict(lean=True), "grad"),
        "grad_lean_remat": (dict(lean=True, remat=True), "grad"),
    }
    x0 = float(np.log(1e-5))
    results = {}
    for name, (kw, mode) in variants.items():
        try:
            loss = make_loss(kw)
            fn = jax.jit(loss) if mode == "fwd" else \
                jax.jit(jax.value_and_grad(loss))
            def sync(o):
                # value materialization, not block_until_ready: the remote
                # backend's ready-wait returns immediately for scalar
                # results (measured 0.0 s medians), so transfer the value
                return (float(o[0]) + float(o[1])) if mode == "grad" \
                    else float(o)

            t0 = time.perf_counter()
            out = fn(x0)
            sync(out)
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(x0)
                sync(out)
                times.append(time.perf_counter() - t0)
            med = float(np.median(times))
            g = float(out[1]) if mode == "grad" else None
            row = {"variant": name, "median_s": round(med, 3),
                   "compile_s": round(compile_s, 1),
                   "mcells_steps_per_s": round(cells * steps / med / 1e6, 1)}
            if g is not None:
                row["grad"] = round(g, 6)
            results[name] = row
        except Exception as e:
            row = {"variant": name, "error": f"{type(e).__name__}: {e}"[:200]}
            results[name] = row
        print(json.dumps(row), flush=True)

    if "grad_none" in results and "median_s" in results.get("fwd_plain", {}):
        for k, v in results.items():
            if k.startswith("grad") and "median_s" in v:
                fwd = results["fwd_lean" if "lean" in k else "fwd_plain"]
                v["bwd_s_est"] = round(v["median_s"] - fwd["median_s"], 3)
        print(json.dumps({k: v for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()
