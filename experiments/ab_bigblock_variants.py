"""In-process A/B of kernel variants at large dispatch blocks (2880 steps),
where per-dispatch overhead (~30-40 ms through the tunnel) no longer masks
per-step differences. Variants via argv, e.g.:

    python experiments/ab_bigblock_variants.py pad:2:1 hs:2:1 dot:2:1
    python experiments/ab_bigblock_variants.py pad:2:1 pad:4:1 pad:8:1 pad:2:4 pad:2:8

Each spec is CUMMIN_IMPL:CUMMIN_RADIX:scan_unroll.
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
    specs = sys.argv[1:] or ["pad:2:1", "hs:2:1"]
    specs = specs + specs[::-1]  # interleave to cancel drift

    def sync(state):
        return float(np.asarray(jax.numpy.sum(state.prognostic["internal_energy"])))

    for spec in specs:
        impl, radix, unroll = spec.split(":")
        vertical_ops.CUMMIN_IMPL = impl
        vertical_ops.CUMMIN_RADIX = int(radix)
        sim, cells = build_sim()
        sim.scan_unroll = int(unroll)
        roll = sim._rollout_fn(steps)
        t0 = time.perf_counter()
        s = roll(sim.state, dt)
        sync(s)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            s = roll(s, dt)
            sync(s)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        print(json.dumps({
            "spec": spec, "us_per_step": round(med / steps * 1e6, 1),
            "Mcells_steps_per_s": round(cells * steps / med / 1e6, 2),
            "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
