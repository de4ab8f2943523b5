"""Bisect Mosaic/Pallas compilability on the axon backend.

Round-2 found the whole-step Pallas kernel hangs the backend compiler
(test_fused_step.py header). VERDICT r2 item 4 asks which granularity is the
first to fail: trivial elementwise -> shifted stencil -> cummin stages ->
closure block. Each case runs in a subprocess with a hard timeout so a hang
cannot take down the harness.

Usage: python experiments/mosaic_bisect.py [case]
With no args: runs every case in its own subprocess, prints one JSON line per
case {"case", "status": ok|hang|error, "seconds", "max_abs_err"}.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CASES = ["elementwise", "stencil", "cummin", "closure"]
TIMEOUT_S = 420


def run_case(case: str):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nz, cells, blk = 30, 56951, 512
    ncell = (cells + blk - 1) // blk * blk
    x = jnp.asarray(np.random.default_rng(0).uniform(-0.5, 1.8, (nz, ncell)),
                    jnp.float32)
    dz = jnp.asarray(np.geomspace(5.0, 0.05, nz), jnp.float32)[:, None]

    if case == "elementwise":
        def kernel(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 2.0 + 1.0

        def ref_fn(x):
            return x * 2.0 + 1.0
    elif case == "stencil":
        def kernel(x_ref, o_ref):
            x = x_ref[:]
            up = jnp.concatenate([x[1:], x[-1:]], axis=0)
            dn = jnp.concatenate([x[:1], x[:-1]], axis=0)
            o_ref[:] = up - 2.0 * x + dn

        def ref_fn(x):
            up = jnp.concatenate([x[1:], x[-1:]], axis=0)
            dn = jnp.concatenate([x[:1], x[:-1]], axis=0)
            return up - 2.0 * x + dn
    elif case == "cummin":
        def body(x):
            d = 1
            while d < x.shape[0]:
                pad = jnp.full((d,) + x.shape[1:], jnp.inf, x.dtype)
                x = jnp.minimum(x, jnp.concatenate([pad, x[:-d]], axis=0))
                d *= 2
            return x

        def kernel(x_ref, o_ref):
            o_ref[:] = body(x_ref[:])

        ref_fn = body
    else:  # closure: the telescoped saturation adjustment
        def body(sat, dzc):
            def shift(v, d, fill):
                if d > 0:
                    pad = jnp.full((d,) + v.shape[1:], fill, v.dtype)
                    return jnp.concatenate([pad, v[:-d]], axis=0)
                pad = jnp.full((-d,) + v.shape[1:], fill, v.dtype)
                return jnp.concatenate([v[-d:], pad], axis=0)

            def cummin(v, reverse=False):
                d = 1
                while d < v.shape[0]:
                    v = jnp.minimum(v, shift(v, -d if reverse else d, jnp.inf))
                    d *= 2
                return v

            a = (sat - 1.0) * dzc
            # pair scan for S=cumsum(a), M=cummin(S)
            s = m = a
            d = 1
            while d < sat.shape[0]:
                sL = shift(s, d, 0.0)
                mL = shift(m, d, jnp.inf)
                m = jnp.minimum(mL, sL + m)
                s = sL + s
                d *= 2
            M = jnp.minimum(m, 0.0)
            M_in = shift(M, 1, 0.0)
            sat_up = 1.0 + (M - M_in) / dzc
            Z = jnp.cumsum(dzc[:, :1], axis=0)  # static-ish; traced cumsum
            ZM = Z + M
            S2 = shift(ZM, 1, 0.0) - ZM[-1:]
            c2 = S2 - jnp.minimum(cummin(S2, reverse=True), 0.0)
            c2_in = shift(c2, -1, 0.0)
            return jnp.maximum(sat_up - c2_in / dzc, 0.0)

        def kernel(x_ref, dz_ref, o_ref):
            o_ref[:] = body(x_ref[:], dz_ref[:])

        def ref_fn(x):
            return body(x, jnp.broadcast_to(dz, x.shape))

    grid = (ncell // blk,)
    if case == "closure":
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nz, ncell), jnp.float32),
            grid=grid,
            in_specs=[pl.BlockSpec((nz, blk), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((nz, 1), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((nz, blk), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        )
        args = (x, dz)
    else:
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nz, ncell), jnp.float32),
            grid=grid,
            in_specs=[pl.BlockSpec((nz, blk), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((nz, blk), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        )
        args = (x,)

    t0 = time.perf_counter()
    out = np.asarray(jax.jit(fn)(*args))
    dt = time.perf_counter() - t0
    expect = np.asarray(jax.jit(ref_fn)(x))
    err = float(np.max(np.abs(out - expect)))
    print(json.dumps({"case": case, "status": "ok",
                      "seconds": round(dt, 1), "max_abs_err": err}),
          flush=True)


def main():
    if len(sys.argv) > 1:
        run_case(sys.argv[1])
        return
    for case in CASES:
        t0 = time.perf_counter()
        try:
            p = subprocess.run([sys.executable, __file__, case],
                               capture_output=True, text=True,
                               timeout=TIMEOUT_S)
        except subprocess.TimeoutExpired:
            print(json.dumps({"case": case, "status": "hang",
                              "seconds": TIMEOUT_S}), flush=True)
            continue
        took = round(time.perf_counter() - t0, 1)
        tail = (p.stdout or "").strip().splitlines()
        if p.returncode == 0 and tail and '"ok"' in tail[-1]:
            print(tail[-1], flush=True)
        else:
            err = (p.stderr or "").strip().splitlines()
            print(json.dumps({"case": case, "status": "error",
                              "seconds": took,
                              "tail": err[-3:] if err else tail[-3:]}),
                  flush=True)


if __name__ == "__main__":
    main()
