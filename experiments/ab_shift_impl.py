"""A/B: z-shift lowering ``pad`` vs ``concat`` on the N145 bench rollout.

Both variants are bit-identical numerically (tests/test_goldens.py); this
measures which lowering is faster at production block sizes. Run on the real
chip; comparisons are within ONE process (alternating blocks) because
process-to-process variance through the tunnel is ±20-30%.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from experiments.ab_unroll import build_sim  # single bench-sim definition


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from terrarium_tpu.ops import vertical_ops

    steps = 1440
    dt = 60.0
    variants = {}
    for impl in ("pad", "concat"):
        vertical_ops.SHIFT_IMPL = impl
        sim, _cells = build_sim()
        roll = sim._rollout_fn(steps)
        t0 = time.perf_counter()
        state = roll(sim.state, dt)
        s = float(np.asarray(jax.numpy.sum(state.prognostic["internal_energy"])))
        print(f"{impl}: compile {time.perf_counter()-t0:.1f}s checksum {s:.6e}",
              flush=True)
        variants[impl] = (roll, state)

    times = {k: [] for k in variants}
    for rep in range(6):
        for impl, (roll, state) in variants.items():
            t0 = time.perf_counter()
            state = roll(state, dt)
            float(np.asarray(jax.numpy.sum(state.prognostic["internal_energy"])))
            el = time.perf_counter() - t0
            variants[impl] = (roll, state)
            if rep > 0:  # first alternating pass warms caches
                times[impl].append(el)
            print(f"  rep{rep} {impl}: {el:.3f}s", flush=True)

    for impl, ts in times.items():
        med = float(np.median(ts))
        print(f"{impl}: median {med:.3f}s/block -> {steps/med:.0f} steps/s")


if __name__ == "__main__":
    main()
