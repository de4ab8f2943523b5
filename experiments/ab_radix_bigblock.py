"""In-process A/B: cummin radix at production-size rollout blocks.

The original ab_radix.py timed 60-step blocks, where the ~30-40 ms
dispatch+sync tunnel overhead swamps per-step differences (60 steps of
compute ~ 8 ms). This variant times 2880-step blocks (2 simulated days,
~0.4 s compute) so per-fusion launch-overhead differences are visible.
All radices are bit-identical (min is associative/commutative).
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
    from terrarium_tpu.ops import vertical_ops

    steps, dt = 2880, 60.0
    vertical_ops.CUMMIN_IMPL = "pad"

    def sync(state):
        return float(np.asarray(jax.numpy.sum(state.prognostic["internal_energy"])))

    outs = {}
    for radix in (2, 4, 6, 8, 2, 4, 6, 8):
        vertical_ops.CUMMIN_RADIX = radix
        sim, cells = build_sim()
        roll = sim._rollout_fn(steps)
        t0 = time.perf_counter()
        s = roll(sim.state, dt)
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
            "radix": radix, "median_s_per_2880steps": round(med, 4),
            "Mcells_steps_per_s": round(cells * steps / med / 1e6, 2),
            "compile_s": round(compile_s, 1)}), flush=True)
        if radix not in outs:
            sim2, _ = build_sim()
            s2 = sim2._rollout_fn(60)(sim2.state, dt)
            outs[radix] = np.asarray(s2.prognostic["saturation_water_ice"])

    for radix in (4, 6, 8):
        same = np.array_equal(outs[2], outs[radix])
        print(f"radix {radix} bit-identical to radix 2: {same}", flush=True)
        assert same


if __name__ == "__main__":
    main()
