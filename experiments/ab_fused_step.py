"""Fused whole-step Pallas kernel vs the XLA step, on the real chip.

Round-2 recorded the fused step as "compiles only in interpret mode" —
experiments/mosaic_bisect.py now shows Mosaic compiles stencil/cummin kernels
fine on this backend, so this re-attempts the real thing under a subprocess
timeout: build the N145 bench config, compile `make_fused_step`, check
numerics vs the XLA step, and time both back-to-back in one process.

Usage: python experiments/ab_fused_step.py [child]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TIMEOUT_S = 900


def child():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from experiments.ab_unroll import build_sim
    from terrarium_tpu.ops.fused_step import make_fused_step

    sim, cells = build_sim()
    dt = 60.0
    fused = make_fused_step(sim.model, sim.timestepper, sim.ctx,
                            sim.input_sources, dt=dt, block_cells=2048)

    t0 = time.perf_counter()
    fused_jit = jax.jit(fused)
    s_fused = fused_jit(sim.state)
    out = float(np.asarray(jax.numpy.sum(s_fused.prognostic["internal_energy"])))
    compile_s = time.perf_counter() - t0
    print(json.dumps({"phase": "fused_compile", "status": "ok",
                      "seconds": round(compile_s, 1)}), flush=True)

    # numerics vs XLA step
    s_xla = sim.step_fn(sim.state, dt)
    for name in ("internal_energy", "saturation_water_ice"):
        a = np.asarray(s_fused.prognostic[name])
        b = np.asarray(s_xla.prognostic[name])
        err = float(np.max(np.abs(a - b) / (np.abs(b) + 1e-6)))
        print(json.dumps({"check": name, "max_rel_err": err}), flush=True)

    # timing: scan of fused steps vs the regular rollout, back-to-back
    steps = 1440

    @jax.jit
    def loop_fused(state):
        def body(s, _):
            return fused(s), None
        s, _ = jax.lax.scan(body, state, None, length=steps)
        return s

    roll = sim._rollout_fn(steps)

    def sync(state):
        return float(np.asarray(jax.numpy.sum(
            state.prognostic["internal_energy"])))

    results = {}
    for name, fn in (("xla", lambda s: roll(s, dt)), ("fused", loop_fused),
                     ("xla2", lambda s: roll(s, dt))):
        s = fn(sim.state)
        sync(s)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            s = fn(s)
            sync(s)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        results[name] = med
        print(json.dumps({"variant": name,
                          "median_s_per_block": round(med, 4),
                          "cells_steps_per_s_M": round(cells * steps / med / 1e6, 2)}),
              flush=True)


def main():
    if len(sys.argv) > 1:
        child()
        return
    try:
        p = subprocess.run([sys.executable, __file__, "child"],
                           capture_output=True, text=True, timeout=TIMEOUT_S)
    except subprocess.TimeoutExpired as e:
        print(json.dumps({"status": "hang", "seconds": TIMEOUT_S,
                          "partial": (e.stdout or b"").decode()[-500:]
                          if isinstance(e.stdout, bytes) else str(e.stdout)[-500:]}))
        return
    out = (p.stdout or "").strip()
    print(out)
    if p.returncode != 0:
        err = (p.stderr or "").strip().splitlines()
        print(json.dumps({"status": "error", "tail": err[-6:]}))


if __name__ == "__main__":
    main()
