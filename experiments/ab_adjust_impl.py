"""In-process A/B: saturation-adjustment closure lowering on the N145 bench.

Variants of `SoilHydrology.adjust_saturation_profile` (hydrology.ADJUST_IMPL):
  twopass    — round-2 form: 2 MXU cumsum dots + 2 doubling cummins
  telescoped — down-sweep cumsum eliminated algebraically: 1 dot + 2 cummins
  fused      — forward prefix pair (sum+min) in one doubling pass: 0 dots

All variants are mathematically identical (float rounding differs). Per
CLAUDE.md, cross-process variance is ±20-30%, so all variants run
back-to-back in ONE process on the real chip, 1440-step blocks.
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
    from terrarium_tpu.processes.soil import hydrology as H

    sim, cells = build_sim()
    steps, dt = 1440, 60.0

    def sync(state):
        return float(np.asarray(jax.numpy.sum(
            state.prognostic["internal_energy"])))

    state0 = sim.state
    for impl in ("twopass", "telescoped", "fused", "twopass"):
        H.ADJUST_IMPL = impl
        sim._rollout_fns.clear()  # force a re-trace under the new lowering
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
            "adjust_impl": impl,
            "median_s_per_block": round(med, 4),
            "cells_steps_per_s_M": round(cells * steps / med / 1e6, 2),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
