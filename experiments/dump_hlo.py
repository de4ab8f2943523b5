"""Dump the TPU-compiled HLO of the bench rollout for traffic analysis."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from experiments.ab_unroll import build_sim

    sim, cells = build_sim()
    roll_inner = sim._rollout_fn(60)
    # the underlying jit is exposed on the wrapper (integrator.step_fn)
    from terrarium_tpu.timesteppers.integrator import _split_sources
    jitted = roll_inner._jit
    dyn, _ = _split_sources(sim.input_sources)
    lowered = jitted.lower(sim.state, 60.0, dyn, n=60)
    txt = lowered.compile().as_text()
    out = "/root/repo/experiments/rollout_tpu.hlo"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out}")


if __name__ == "__main__":
    main()
