"""Minimal pure-Pallas repro candidates for the `layout.h:320` Mosaic crash.

Ladder-1 localization (experiments/mosaic_bisect_land_r4.py): the coupled
LandModel kernel crashes IFF the in-loop dataflow
``T (Nz, block) --row extraction--> gt (block,) --XY math--> Ts (block,)``
is live, where both T and Ts are fori_loop carries. Extraction op
(strided-slice+reshape vs one-hot masked sum), coupling BCs, ET, and runoff
were all exonerated. Each variant here is a <=30-line pallas kernel probing
that pattern in isolation; run on the chip to find the smallest crasher.

Usage:
    python experiments/mosaic_min_repro.py            # all variants, subproc
    python experiments/mosaic_min_repro.py VARIANT    # one in-process
"""
from __future__ import annotations

import functools
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NZ, BLOCK, INNER = 8, 256, 4


def _kernel_factory(variant):
    import jax
    import jax.numpy as jnp

    def body_fn(T, s):
        if variant == "row_to_xy":
            # T row -> rank-1 -> transcendental -> carried rank-1
            gt = jnp.reshape(T[-1:], (-1,))
            s = 0.5 * s + jnp.exp(0.01 * gt)
            T = T * 0.999
        elif variant == "row_to_xy_masksum":
            rows = jax.lax.broadcasted_iota(jnp.int32, T.shape, 0)
            gt = jnp.sum(jnp.where(rows == T.shape[0] - 1, T, 0.0), axis=0)
            s = 0.5 * s + jnp.exp(0.01 * gt)
            T = T * 0.999
        elif variant == "row_to_xy_branch":
            # adds the Magnus-style two-branch where on the XY value
            gt = jnp.reshape(T[-1:], (-1,))
            e = jnp.where(gt <= 0.0,
                          611.0 * jnp.exp(22.46 * gt / (gt + 272.62)),
                          611.0 * jnp.exp(17.62 * gt / (gt + 243.12)))
            s = 0.5 * s + 1e-4 * e
            T = T * 0.999
        elif variant == "row_to_xy_stencil":
            # T also updated by a z-stencil (pad-shift), like the heat op
            from terrarium_tpu.ops.vertical_ops import pad_z

            gt = jnp.reshape(T[-1:], (-1,))
            s = 0.5 * s + jnp.exp(0.01 * gt)
            T = T + 0.01 * (pad_z(T[1:], 0, 1) + pad_z(T[:-1], 1, 0)
                            - 2.0 * T)
        elif variant == "xy_only":
            # control: no row extraction, s evolves from itself
            s = 0.5 * s + jnp.exp(0.01 * s)
            T = T * 0.999
        else:
            raise SystemExit(f"unknown variant {variant}")
        return T, s

    return body_fn


def run_variant(variant):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    body_fn = _kernel_factory(variant)

    def kernel(T_ref, s_ref, To_ref, so_ref):
        T0 = T_ref[...]
        s0 = jnp.squeeze(s_ref[...], axis=0)

        def body(_, carry):
            return list(body_fn(carry[0], carry[1]))

        T, s = jax.lax.fori_loop(0, INNER, body, [T0, s0])
        To_ref[...] = T
        so_ref[...] = jnp.reshape(s, so_ref.shape)

    T = jnp.ones((NZ, BLOCK), jnp.float32)
    s = jnp.zeros((1, BLOCK), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((NZ, BLOCK), lambda i: (0, 0)),
                  pl.BlockSpec((1, BLOCK), lambda i: (0, 0))],
        out_specs=[pl.BlockSpec((NZ, BLOCK), lambda i: (0, 0)),
                   pl.BlockSpec((1, BLOCK), lambda i: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((NZ, BLOCK), jnp.float32),
                   jax.ShapeDtypeStruct((1, BLOCK), jnp.float32)],
    )(T, s)
    v = float(np.asarray(out[1]).sum())
    print(f"OK {variant}: finite={np.isfinite(v)}", flush=True)


VARIANTS = ["xy_only", "row_to_xy", "row_to_xy_masksum", "row_to_xy_branch",
            "row_to_xy_stencil"]


def main():
    if len(sys.argv) > 1:
        run_variant(sys.argv[1])
        return
    for v in VARIANTS:
        t0 = time.perf_counter()
        try:
            p = subprocess.run([sys.executable, __file__, v],
                               capture_output=True, text=True, timeout=1200)
        except subprocess.TimeoutExpired:
            print(f"{v:20s} HANG (>1200s)", flush=True)
            continue
        dt = time.perf_counter() - t0
        if p.returncode == 0:
            print(f"{v:20s} OK    ({dt:.0f}s)", flush=True)
        else:
            err = (p.stderr or "") + (p.stdout or "")
            tag = "CRASH(layout)" if "layout.h" in err else \
                f"FAIL rc={p.returncode}"
            tail = err.strip().splitlines()[-1:] if err.strip() else []
            print(f"{v:20s} {tag} ({dt:.0f}s) {(tail or [''])[0][:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
