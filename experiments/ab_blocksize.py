"""In-process A/B: steps per rollout dispatch (per-dispatch overhead).

The bench times blocks of `steps` with one host sync per block; if the
remote-dispatch/tunnel overhead per call is significant, larger blocks
show higher per-step throughput.
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

    dt = 60.0

    def sync(state):
        return float(np.asarray(jax.numpy.sum(state.prognostic["internal_energy"])))

    for steps in (60, 240, 720):
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
            "steps_per_block": steps,
            "us_per_step": round(med / steps * 1e6, 1),
            "Mcells_steps_per_s": round(cells * steps / med / 1e6, 2),
            "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
