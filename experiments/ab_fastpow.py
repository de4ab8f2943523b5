"""In-process A/B: static-exponent pow shortcuts on the N145 bench.

`ops/fastpow.py` replaces the VG/Mualem `x ** p` chains (exp/log on the
VPU) with multiply/sqrt/cbrt forms when the static exponent is a small
rational — the bench config (VanGenuchten n=2) hits the shortcuts
everywhere. Variants run back-to-back in ONE process on the real chip.
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

    from experiments.ab_unroll import build_sim
    from terrarium_tpu.ops import fastpow

    sim, cells = build_sim()
    steps, dt = 1440, 60.0

    def sync(state):
        return float(np.asarray(jax.numpy.sum(
            state.prognostic["internal_energy"])))

    state0 = sim.state
    for flag in (False, True, False):
        fastpow.FAST_POW = flag
        sim._rollout_fns.clear()
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
            "fast_pow": flag,
            "median_s_per_block": round(med, 4),
            "cells_steps_per_s_M": round(cells * steps / med / 1e6, 2),
            "compile_s": round(compile_s, 1),
        }), flush=True)
    fastpow.FAST_POW = True


if __name__ == "__main__":
    main()
