"""In-process A/B: stacked vs per-variable implicit solves (N145, PCR).

`ImplicitEuler(stack_solves=True)` concatenates the heat and Richards
tridiagonal systems along the cell axis and runs ONE PCR solve per step
instead of two — halving the solver's launch count. Run on the real chip.
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
    from experiments.ab_unroll import build_sim

    steps, dt = 960, 900.0

    def sync(state):
        return float(np.asarray(jax.numpy.sum(
            state.prognostic["internal_energy"])))

    variants = {}
    for stack in (True, False):
        sim, cells = build_sim()
        sim.timestepper = tt.ImplicitEuler(solver="pcr", stack_solves=stack)
        roll = sim._rollout_fn(steps)
        t0 = time.perf_counter()
        s = roll(sim.state, dt)
        chk = sync(s)
        print(f"stack={stack}: compile {time.perf_counter()-t0:.1f}s "
              f"checksum {chk:.6e}", flush=True)
        variants[stack] = (roll, s, cells)

    times = {k: [] for k in variants}
    for rep in range(6):
        for stack, (roll, s, cells) in variants.items():
            t0 = time.perf_counter()
            s = roll(s, dt)
            sync(s)
            el = time.perf_counter() - t0
            variants[stack] = (roll, s, cells)
            if rep > 0:
                times[stack].append(el)

    for stack, ts in times.items():
        med = float(np.median(ts))
        cells = variants[stack][2]
        print(json.dumps({"stack_solves": stack,
                          "median_s_per_block": round(med, 4),
                          "Mcells_steps_per_s": round(cells * steps / med / 1e6, 2)}))


if __name__ == "__main__":
    main()
