"""Fused lean-rollout Pallas kernel vs the XLA lean rollout, on the chip.

Sweeps (block_cells, inner_steps) for `make_fused_lean_rollout`: each kernel
invocation advances `inner_steps` timesteps entirely in VMEM, so HBM traffic
per step drops by ~inner_steps x. Each variant runs in a subprocess with a
hard timeout (Mosaic loop-lowering hangs cannot take down the harness).

Usage: python experiments/ab_fused_rollout.py [child BLOCK INNER]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TIMEOUT_S = 900
STEPS = 1440


def child(block, inner, adjust=None, unroll=1):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from experiments.ab_unroll import build_sim
    from terrarium_tpu.ops.fused_step import make_fused_lean_rollout

    if adjust:
        from terrarium_tpu.processes.soil import hydrology as H

        H.ADJUST_IMPL = adjust
    if os.environ.get("TERRARIUM_FASTPOW") == "0":
        from terrarium_tpu.ops import fastpow

        fastpow.FAST_POW = False

    sim, cells = build_sim()
    dt = 60.0

    def sync(state):
        return float(np.asarray(jax.numpy.sum(
            state.prognostic["internal_energy"])))

    fused = make_fused_lean_rollout(sim.model, sim.timestepper, sim.ctx,
                                    sim.input_sources, dt=dt,
                                    inner_steps=inner, block_cells=block,
                                    unroll=unroll)
    roll_f = jax.jit(lambda s: fused(s, STEPS))
    t0 = time.perf_counter()
    s = roll_f(sim.state)
    sync(s)
    compile_s = time.perf_counter() - t0

    # numeric check vs the XLA lean rollout
    s_ref = sim._rollout_fn(STEPS)(sim.state, dt)
    errs = {}
    for name in ("internal_energy", "saturation_water_ice"):
        a = np.asarray(s.prognostic[name])
        b = np.asarray(s_ref.prognostic[name])
        errs[name] = float(np.max(np.abs(a - b) / (np.abs(b) + 1e-6)))

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        s = roll_f(s)
        sync(s)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))

    # XLA reference timing in the same process
    roll = sim._rollout_fn(STEPS)
    sx = roll(sim.state, dt)
    sync(sx)
    tx = []
    for _ in range(3):
        t0 = time.perf_counter()
        sx = roll(sx, dt)
        sync(sx)
        tx.append(time.perf_counter() - t0)
    medx = float(np.median(tx))

    print(json.dumps({
        "block": block, "inner": inner, "adjust": adjust, "unroll": unroll,
        "fastpow": os.environ.get("TERRARIUM_FASTPOW", "1"), "status": "ok",
        "fused_M": round(cells * STEPS / med / 1e6, 1),
        "xla_M": round(cells * STEPS / medx / 1e6, 1),
        "speedup": round(medx / med, 3),
        "compile_s": round(compile_s, 1),
        "max_rel_err": errs,
    }), flush=True)


def main():
    if len(sys.argv) > 3 and sys.argv[1] == "child":
        child(int(sys.argv[2]), int(sys.argv[3]),
              sys.argv[4] if len(sys.argv) > 4 and sys.argv[4] != "-" else None,
              int(sys.argv[5]) if len(sys.argv) > 5 else 1)
        return

    grid_arg = sys.argv[1] if len(sys.argv) > 1 else "coarse"
    if grid_arg == "fine":
        variants = ((256, 144), (384, 144), (512, 48), (512, 288),
                    (640, 144), (256, 288))
    elif grid_arg == "r3":
        # post-fast_pow re-sweep + in-kernel ADJUST_IMPL A/B (the MXU is
        # idle inside the fused kernel, so the dot-cumsum may win there)
        variants = ((512, 144), (512, 144, "telescoped"), (512, 288),
                    (384, 144), (640, 144), (768, 144),
                    (512, 144, "twopass"))
    else:
        variants = ((1024, 1), (1024, 16), (1024, 144),
                    (2048, 144), (512, 144), (1024, 720))
    for v in variants:
        block, inner = v[0], v[1]
        adjust = v[2] if len(v) > 2 else None
        args = [sys.executable, __file__, "child", str(block), str(inner)]
        if adjust:
            args.append(adjust)
        try:
            p = subprocess.run(args, capture_output=True, text=True,
                               timeout=TIMEOUT_S)
        except subprocess.TimeoutExpired:
            print(json.dumps({"block": block, "inner": inner,
                              "adjust": adjust,
                              "status": "hang", "seconds": TIMEOUT_S}),
                  flush=True)
            continue
        out = [l for l in (p.stdout or "").splitlines() if l.startswith("{")]
        if p.returncode == 0 and out:
            print(out[-1], flush=True)
        else:
            err = (p.stderr or "").strip().splitlines()
            print(json.dumps({"block": block, "inner": inner,
                              "adjust": adjust,
                              "status": "error", "tail": err[-4:]}),
                  flush=True)


if __name__ == "__main__":
    main()
