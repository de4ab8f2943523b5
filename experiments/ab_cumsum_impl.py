"""In-process A/B: cumsum_z lowering ``dot`` (MXU triangular matmul) vs
``pad`` (radix-4 Hillis-Steele add stages) on the N145 bench rollout.

The closure phase dominates the step (~2/3 of the time,
experiments/ab_attribution.py) and the two per-step cumsums are its only
MXU ops — dots cannot fuse with elementwise neighbors, pad stages can.
Results differ in float summation order only (both exact prefix sums).
"""
from __future__ import annotations

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

    steps, dt = 1440, 60.0
    variants = {}
    for impl in ("dot", "pad"):
        vertical_ops.CUMSUM_IMPL = impl
        sim, cells = build_sim()
        roll = sim._rollout_fn(steps)
        t0 = time.perf_counter()
        s = roll(sim.state, dt)
        chk = float(np.asarray(jax.numpy.sum(s.prognostic["internal_energy"])))
        print(f"{impl}: compile {time.perf_counter()-t0:.1f}s checksum {chk:.6e}",
              flush=True)
        variants[impl] = (roll, s, cells)

    times = {k: [] for k in variants}
    for rep in range(6):
        for impl, (roll, s, cells) in variants.items():
            t0 = time.perf_counter()
            s = roll(s, dt)
            float(np.asarray(jax.numpy.sum(s.prognostic["internal_energy"])))
            el = time.perf_counter() - t0
            variants[impl] = (roll, s, cells)
            if rep > 0:
                times[impl].append(el)

    for impl, ts in times.items():
        med = float(np.median(ts))
        cells = variants[impl][2]
        print(f"{impl}: median {med:.4f}s/block -> "
              f"{cells * steps / med / 1e6:.2f} Mcells*steps/s")


if __name__ == "__main__":
    main()
