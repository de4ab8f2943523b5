"""Attribution of the fused-gradient wall time (r5 item 1 follow-up).

The pallas-bwd gradient config measured ~0.14 s regardless of
(inner, block) — something constant dominates. Split it:

* ``null``      — empty jit call + scalar sync (tunnel dispatch+sync floor)
* ``fwd_seg``   — forward-only scan of the fused segment primal
                  (the custom_vjp fwd pass without any backward)
* ``bwd_kernel``— ONE segment-vjp Pallas kernel call, isolated
* ``grad``      — full value_and_grad (reference point)

Run: python experiments/ab_grad_attrib.py [--inner N] [--block N]
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
    from terrarium_tpu.ops.fused_step import make_fused_lean_rollout
    from terrarium_tpu.ops.fused_vjp import make_segment_vjp
    from terrarium_tpu.timesteppers.fused_grad import make_fused_grad_rollout

    cells, steps = 24576, 288
    inner = int(sys.argv[sys.argv.index("--inner") + 1]) \
        if "--inner" in sys.argv else 48
    block = int(sys.argv[sys.argv.index("--block") + 1]) \
        if "--block" in sys.argv else 512

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

    def timed(fn, *args, reps=5, sync=lambda o: float(np.asarray(o))):
        out = fn(*args)
        sync(out)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            sync(out)
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    rows = {}

    # null: dispatch + scalar-sync floor
    null = jax.jit(lambda x: x + 1.0)
    rows["null"] = timed(null, jnp.float32(0.0))

    # forward-only: scan of fused segment primals (no closure per segment,
    # one at the end) — identical to the custom_vjp primal sweep
    fused = make_fused_lean_rollout(
        sim.model, sim.timestepper, sim.ctx, (), dt=300.0,
        inner_steps=inner, block_cells=block, apply_closure=False)

    @jax.jit
    def fwd_only(state):
        def body(st, _):
            return fused(st, inner), None

        out, _ = jax.lax.scan(body, state, None, length=steps // inner)
        out = sim.model.closure(out, sim.ctx)
        return objective(out)

    rows["fwd_seg"] = timed(fwd_only, sim.state)

    # one isolated bwd kernel call
    seg_vjp = make_segment_vjp(model_fn, sim.timestepper, sim.ctx, (),
                               dt=300.0, inner_steps=inner,
                               block_cells=block)
    ones_ct = jax.tree.map(
        lambda l: (jnp.ones_like(l)
                   if jnp.issubdtype(l.dtype, jnp.floating)
                   else np.zeros(np.shape(l), jax.dtypes.float0)),
        sim.state)

    @jax.jit
    def one_bwd(state, x):
        ct0, ctp = seg_vjp(state, x, ones_ct)
        return jnp.sum(ct0.prognostic["internal_energy"]) + ctp

    rows["bwd_kernel_x1"] = timed(one_bwd, sim.state, x0)

    @jax.jit
    def six_bwd(state, x):
        acc = 0.0
        ct = ones_ct
        for _ in range(steps // inner):
            ct, ctp = seg_vjp(state, x, ct)
            acc = acc + ctp
        return jnp.sum(ct.prognostic["internal_energy"]) + acc

    rows[f"bwd_kernel_x{steps // inner}"] = timed(six_bwd, sim.state, x0)

    # in-kernel attribution: checkpoint-fwd loop only / plain reverse step
    # (no transpose) / full vjp — isolates where the bwd kernel time goes
    from terrarium_tpu.ops import fused_vjp as fv

    for mode in ("none", "plain"):
        fv.BWD_MODE = mode
        seg_vjp_m = make_segment_vjp(model_fn, sim.timestepper, sim.ctx, (),
                                     dt=300.0, inner_steps=inner,
                                     block_cells=block)

        @jax.jit
        def one_bwd_m(state, x):
            ct0, ctp = seg_vjp_m(state, x, ones_ct)
            return jnp.sum(ct0.prognostic["internal_energy"]) + ctp

        try:
            rows[f"bwd_kernel_{mode}_x1"] = timed(one_bwd_m, sim.state, x0)
        except Exception as e:
            print(json.dumps({"variant": f"bwd_kernel_{mode}_x1",
                              "error": repr(e)[:160]}), flush=True)
        finally:
            fv.BWD_MODE = "vjp"

    # full grad (scan outer vs unrolled outer)
    for name, uo in (("grad_total", False), ("grad_total_unrolled", True)):
        roll = make_fused_grad_rollout(model_fn, sim.timestepper, sim.ctx, (),
                                       steps=steps, dt=300.0,
                                       inner_steps=inner, block_cells=block,
                                       bwd="pallas", unroll_outer=uo)
        vg = jax.jit(jax.value_and_grad(
            lambda x: objective(roll(sim.state, x))))
        rows[name] = timed(vg, x0, sync=lambda o: float(o[0]) + float(o[1]))

    for k, v in rows.items():
        print(json.dumps({"variant": k, "median_s": round(v, 4),
                          "minus_null_ms": round((v - rows["null"]) * 1e3, 1)}),
              flush=True)
    best = min(rows.get("grad_total", 9e9), rows.get("grad_total_unrolled", 9e9))
    print(json.dumps({"inner": inner, "block": block,
                      "grad_M": round(cells * steps / best / 1e6, 1)}))


if __name__ == "__main__":
    main()
