"""On-chip A/B of the fused-forward custom_vjp gradient rollout (r5 item 1).

Measures, in ONE process (cross-process chip variance is ±20-30%, CLAUDE.md),
the bench_configs.config6 workload — value_and_grad of a mixed T/sat
objective wrt log K_sat through a 288-step N145 heat+Richards rollout — for:

* the round-4 production path (XLA lean scan + per-step remat),
* the fused custom_vjp path (`timesteppers/fused_grad`) at several
  (inner_steps, bwd_chunk) schedules,
* forward-only runs of both forward implementations, to attribute
  fwd-vs-bwd time.

Prints one JSON line per variant; gradients must agree across variants.

Run: python experiments/ab_fused_grad.py [--cells N] [--steps N]
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
    from terrarium_tpu.timesteppers.fused_grad import make_fused_grad_rollout

    cells = int(sys.argv[sys.argv.index("--cells") + 1]) \
        if "--cells" in sys.argv else 24576
    steps = int(sys.argv[sys.argv.index("--steps") + 1]) \
        if "--steps" in sys.argv else 288

    grid = tt.ColumnGrid.of(cells=cells, spacing=tt.ExponentialSpacing(N=30),
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

    def make_sim():
        return tt.initialize(
            model_fn(x0), tt.ForwardEuler(),
            initializers={
                "temperature": -1.0,
                "saturation_water_ice": lambda x, z: np.minimum(
                    1.0, 0.6 - 0.04 * z)},
            boundary_conditions=tt.PrescribedSurfaceTemperature(4.0))

    sim = make_sim()

    def objective(out):
        return (jnp.mean(out.temperature)
                + jnp.mean(out.saturation_water_ice))

    def xla_loss(log_ksat):
        m = model_fn(log_ksat)
        roll = make_rollout_fn(m, sim.timestepper, sim.ctx, (),
                               steps=steps, remat=True, lean=True)
        return objective(roll(sim.state, 300.0))

    def xla_fwd_loss(log_ksat):
        m = model_fn(log_ksat)
        roll = make_rollout_fn(m, sim.timestepper, sim.ctx, (),
                               steps=steps, lean=True)
        return objective(roll(sim.state, 300.0))

    def fused_loss(inner, block, chunk=None, remat=False, bwd="xla"):
        roll = make_fused_grad_rollout(
            model_fn, sim.timestepper, sim.ctx, (), steps=steps, dt=300.0,
            inner_steps=inner, block_cells=block, bwd_chunk=chunk,
            bwd_remat=remat, bwd=bwd)

        def loss(log_ksat):
            return objective(roll(sim.state, log_ksat))
        return loss

    def fused_fwd_loss(inner, block):
        # forward-only on the production fused rollout (with closure)
        from terrarium_tpu.ops.fused_step import make_fused_lean_rollout
        fr = make_fused_lean_rollout(sim.model, sim.timestepper, sim.ctx, (),
                                     dt=300.0, inner_steps=inner,
                                     block_cells=block)

        def loss(_):
            return objective(fr(sim.state, steps))
        return loss

    variants = [
        ("grad_xla_lean_remat", xla_loss, "grad"),
        ("grad_pallasbwd_i48_b256", fused_loss(48, 256, bwd="pallas"),
         "grad"),
        ("grad_pallasbwd_i48_b512", fused_loss(48, 512, bwd="pallas"),
         "grad"),
        ("grad_pallasbwd_i24_b512", fused_loss(24, 512, bwd="pallas"),
         "grad"),
        ("grad_pallasbwd_i96_b256", fused_loss(96, 256, bwd="pallas"),
         "grad"),
    ]
    if "--full" in sys.argv:
        variants += [
            ("fwd_xla_lean", xla_fwd_loss, "fwd"),
            ("grad_fused_i144_b512_c48", fused_loss(144, 512, chunk=48),
             "grad"),
            ("grad_fused_i48_b512", fused_loss(48, 512), "grad"),
            ("grad_fused_i144_b512_remat", fused_loss(144, 512, remat=True),
             "grad"),
        ]

    for name, loss, mode in variants:
        try:
            fn = jax.jit(loss) if mode == "fwd" else \
                jax.jit(jax.value_and_grad(loss))

            def sync(o):
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
            row = {"variant": name, "median_s": round(med, 3),
                   "compile_s": round(compile_s, 1),
                   "mcells_steps_per_s": round(cells * steps / med / 1e6, 1)}
            if mode == "grad":
                row["grad"] = round(float(out[1]), 6)
        except Exception as e:
            row = {"variant": name, "error": f"{type(e).__name__}: {e}"[:200]}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
