"""Step-time attribution on the N145 bench config (real chip).

Times each phase of the explicit step as its own on-device scan:
closure (saturation adjustment + water table + SWRC + energy closure),
update_state (aux hydraulics + both tendency stencils), explicit update,
and the full step, at production block sizes. Isolated-phase fusion
boundaries differ from the fused step, so numbers are indicative, not
additive — but they rank where the time goes.
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
    from terrarium_tpu.timesteppers.stepping import explicit_step, update_state

    sim, cells = build_sim()
    model, ts, ctx, sources = (sim.model, sim.timestepper, sim.ctx,
                               sim.input_sources)
    steps, dt = 1440, 60.0

    def phase_closure(state, _):
        return model.closure(state, ctx)

    def phase_update(state, _):
        return update_state(model, state, ctx, sources)

    def phase_explicit(state, d):
        return explicit_step(state, model.grid, ctx.bcs, d)

    def phase_full(state, d):
        return ts.step(model, state, ctx, sources, d)

    def sync(state):
        return float(np.asarray(jax.numpy.sum(
            state.prognostic["internal_energy"])))

    for name, fn in (("full_step", phase_full), ("closure", phase_closure),
                     ("update_state", phase_update),
                     ("explicit_update", phase_explicit)):

        @jax.jit
        def loop(state, d, _fn=fn):
            def body(s, _):
                return _fn(s, d), None
            s, _ = jax.lax.scan(body, state, None, length=steps)
            return s

        s = loop(sim.state, dt)
        sync(s)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            s = loop(s, dt)
            sync(s)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        print(json.dumps({"phase": name,
                          "us_per_iter": round(1e6 * med / steps, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
