"""In-kernel implicit-stepper attribution + Thomas-vs-PCR A/B (r5 item 2).

Round 4's fused implicit config plateaued at ~175-177M cells*steps/s
("plateaued on the PCR solve" — unproven). This measures, in ONE process on
the chip, the BASELINE #2 workload (N145-sized heat+Richards batch,
ImplicitEuler, dt=900, 1920 steps) through the fused kernel at i48_b384:

* ``pcr``        — the r4 production solver (doubling passes, log2(Nz)=5
                   rounds of ~10 VPU ops each on (Nz, block) tiles)
* ``thomas_full``— fully-unrolled in-kernel Thomas scan (2 sweeps x Nz
                   rows of ~5 ops on (cells,) rows — 2x fewer flops than
                   PCR but sequential over z; the XLA-level PCR win was
                   launch-driven, so in VMEM the tradeoff could invert)
* ``diag``       — attribution: diagonal-only "solve" (wrong results) —
                   everything EXCEPT the tridiagonal solve (assembly,
                   update_state, closure, explicit fallback vars)
* ``pcr_stacked``— stack_solves=True (heat+Richards as ONE solve; the
                   XLA-level -5.6% was a concat-copy cost; in-VMEM concat
                   is cheap)
* ``pcr_i96``    — inner=96 probe (compile-budget risk; r4 stopped at 48)
* ``xla_pcr``    — the XLA lean-scan path for context

Prints one JSON line per variant -> paste into docs/performance.md;
feeds the KERNELS_r05 attribution.
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

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    import terrarium_tpu as tt
    from terrarium_tpu.ops import tridiag
    from terrarium_tpu.ops.fused_step import make_fused_lean_rollout

    cells = int(sys.argv[sys.argv.index("--cells") + 1]) \
        if "--cells" in sys.argv else 24576
    steps, dt = 1920, 900.0
    grid = tt.ColumnGrid.of(cells=cells, spacing=tt.ExponentialSpacing(N=30),
                            nf=np.float32)

    def make_sim(solver, stack=False, picard=1):
        hydrology = tt.SoilHydrology(
            vertical_flow=tt.RichardsEq(),
            hydraulic_properties=tt.ConstantSoilHydraulics(
                swrc=tt.VanGenuchten(alpha=2.0, n=2.0),
                unsat_hydraulic_cond=tt.UnsatKVanGenuchten()))
        model = tt.SoilModel(grid=grid,
                             soil=tt.SoilEnergyWaterCarbon(hydrology=hydrology))
        return tt.initialize(
            model, tt.ImplicitEuler(dt=dt, solver=solver, stack_solves=stack,
                                    picard_iters=picard),
            initializers={
                "temperature": lambda x, z: 1.0 + 0.0 * z,
                "saturation_water_ice": lambda x, z: np.minimum(
                    1.0, 0.5 - 0.05 * z)},
            boundary_conditions=tt.PrescribedSurfaceTemperature(
                lambda t: 5.0 * jax.numpy.sin(2 * jax.numpy.pi * t / 86400.0)))

    def timed_fused(sim, inner, block, reps=3):
        fused = make_fused_lean_rollout(sim.model, sim.timestepper, sim.ctx,
                                        sim.input_sources, dt=dt,
                                        inner_steps=inner, block_cells=block)
        roll = jax.jit(lambda s: fused(s, steps))
        st = roll(sim.state)
        float(np.asarray(st.prognostic["internal_energy"][:1, :1]))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            st = roll(st)
            float(np.asarray(st.prognostic["internal_energy"][:1, :1]))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    only = sys.argv[sys.argv.index("--only") + 1].split(",") \
        if "--only" in sys.argv else None
    variants = [
        ("pcr_i48_b384", dict(solver="pcr"), dict(inner=48, block=384)),
        ("thomas_full_i48_b384", dict(solver="thomas"),
         dict(inner=48, block=384)),
        ("diag_i48_b384", dict(solver="diag_attribution_only"),
         dict(inner=48, block=384)),
        ("pcr_stacked_i48_b384", dict(solver="pcr", stack=True),
         dict(inner=48, block=384)),
        ("pcr_i96_b384", dict(solver="pcr"), dict(inner=96, block=384)),
        ("thomas_full_i96_b384", dict(solver="thomas"),
         dict(inner=96, block=384)),
        ("thomas_full_i48_b512", dict(solver="thomas"),
         dict(inner=48, block=512)),
        ("thomas_full_i96_b256", dict(solver="thomas"),
         dict(inner=96, block=256)),
        ("thomas_full_i144_b384", dict(solver="thomas"),
         dict(inner=144, block=384)),
        ("thomas_pair_rows_i48_b512", dict(solver="thomas", stack="rows"),
         dict(inner=48, block=512)),
        ("thomas_pair_rows_i48_b384", dict(solver="thomas", stack="rows"),
         dict(inner=48, block=384)),
        ("thomas_pair_rows_i96_b512", dict(solver="thomas", stack="rows"),
         dict(inner=96, block=512)),
    ]
    for name, skw, fkw in variants:
        if only and name not in only:
            continue
        try:
            if "thomas" in name:
                tridiag.THOMAS_UNROLL = "full"
            sim = make_sim(**skw)
            med = timed_fused(sim, **fkw)
            row = {"variant": name, "median_s": round(med, 3),
                   "mcells_steps_per_s": round(cells * steps / med / 1e6, 1)}
        except Exception as e:
            import traceback

            tb = traceback.format_exc()
            frames = [l for l in tb.splitlines() if "raise NotImplementedError" in l
                      or "lowering.py" in l or "NotImplementedError" in l]
            row = {"variant": name, "error": f"{type(e).__name__}: {e}"[:160],
                   "trace_tail": " | ".join(frames[-3:])[:400]}
        finally:
            tridiag.THOMAS_UNROLL = 2
        print(json.dumps(row), flush=True)

    if only:
        return
    # XLA lean path for context
    sim = make_sim("pcr")
    roll = sim._rollout_fn(steps)
    st = roll(sim.state, dt)
    float(np.asarray(st.prognostic["internal_energy"][:1, :1]))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        st = roll(st, dt)
        float(np.asarray(st.prognostic["internal_energy"][:1, :1]))
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    print(json.dumps({"variant": "xla_pcr", "median_s": round(med, 3),
                      "mcells_steps_per_s": round(cells * steps / med / 1e6,
                                                  1)}), flush=True)


if __name__ == "__main__":
    main()
