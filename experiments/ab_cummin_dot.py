"""In-process A/B: Hillis-Steele concatenate vs permutation-matmul cummin.

Also asserts bit-identity of the two variants on the bench state after a
60-step block (both exact by construction; verified on the real chip).
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

    steps, dt = 60, 60.0

    def sync(state):
        return float(np.asarray(jax.numpy.sum(state.prognostic["internal_energy"])))

    results = {}
    for impl in ("hs", "pad", "hs", "pad"):  # interleave to cancel drift
        vertical_ops.CUMMIN_IMPL = impl
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
        results.setdefault(impl, []).append(med)
        print(json.dumps({
            "impl": impl, "median_s_per_60steps": round(med, 4),
            "Mcells_steps_per_s": round(cells * steps / med / 1e6, 2),
            "compile_s": round(compile_s, 1)}), flush=True)

    # bit-identity of one 60-step block across implementations
    outs = {}
    for impl in ("hs", "pad"):
        vertical_ops.CUMMIN_IMPL = impl
        sim, _ = build_sim()
        s = sim._rollout_fn(steps)(sim.state, dt)
        outs[impl] = {k: np.asarray(v) for k, v in s.prognostic.items()}
    for k in outs["hs"]:
        same = np.array_equal(outs["hs"][k], outs["pad"][k])
        print(f"bit-identical {k}: {same}", flush=True)
        assert same, k

    best = {k: min(v) for k, v in results.items()}
    print(json.dumps({"best": best,
                      "speedup_pad_vs_hs": round(best["hs"] / best["pad"], 3)}))


if __name__ == "__main__":
    main()
