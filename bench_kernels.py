"""Per-kernel roofline benchmark (BASELINE: "measure vertical-stencil and
tridiagonal kernels at speed-of-light per chip").

Measures achievable HBM bandwidth with a copy kernel, then times the hot
kernels standalone on the real chip and reports each one's effective
bandwidth and fraction of speed-of-light (minimum HBM bytes / achieved
copy bandwidth). Prints one JSON line per kernel.

Run on the TPU (do not force CPU): python bench_kernels.py
"""
from __future__ import annotations

import json
import time

import numpy as np

NZ, CELLS = 30, 56951
ITERS = 300


def timeit(fn, arg, iters=ITERS):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(v):
        def body(s, _):
            return fn(s), None

        s, _ = jax.lax.scan(body, v, None, length=iters)
        return s

    r = many(arg)
    np.asarray(jax.tree.leaves(r)[0][:1, :1] if jax.tree.leaves(r)[0].ndim > 1
               else jax.tree.leaves(r)[0][:1])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = many(arg)
        np.asarray(jnp.sum(jax.tree.leaves(r)[0]))
        times.append((time.perf_counter() - t0) / iters)
    return float(np.median(times))


def report(name, t_s, bytes_moved, bw_peak):
    bw = bytes_moved / t_s
    print(json.dumps({
        "kernel": name, "time_us": round(t_s * 1e6, 1),
        "effective_GBps": round(bw / 1e9, 1),
        "pct_speed_of_light": round(100.0 * bw / bw_peak, 1) if bw_peak else None,
        "min_bytes_MB": round(bytes_moved / 1e6, 2),
    }))
    return bw


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from terrarium_tpu.ops.tridiag import tridiag_solve, tridiag_solve_pcr
    from terrarium_tpu.ops.vertical_ops import (cummin_z, cumsum_z, div_faces,
                                                grad_faces, interp_faces_mid)

    rng = np.random.default_rng(0)
    F = jnp.float32
    big = jnp.asarray(rng.normal(size=(8 * NZ, CELLS)), F)  # ~55 MB
    x = jnp.asarray(rng.normal(size=(NZ, CELLS)), F)
    sat = jnp.asarray(rng.uniform(0.0, 1.2, (NZ, CELLS)), F)
    dzc = jnp.asarray(np.exp(rng.uniform(-2, 0, (NZ, 1))), F)
    dzf = jnp.asarray(np.exp(rng.uniform(-2, 0, (NZ + 1, 1))), F)

    fsz = 4  # f32

    # 1. achievable HBM bandwidth: out-of-place copy-scale (read + write)
    t = timeit(lambda v: v * 1.0000001 + 1e-12, big)
    bw_peak = report("hbm_copy_scale", t, 2 * big.size * fsz, None)
    print(json.dumps({"hbm_peak_GBps": round(bw_peak / 1e9, 1)}))

    # 2. heat-conduction vertical stencil: q = -kappa_f * dT/dz; dU/dt = -div q
    #    minimum traffic: read T, read kappa, write dUdt  (3 arrays)
    kappa = jnp.asarray(rng.uniform(0.5, 3.0, (NZ, CELLS)), F)

    def heat_stencil(T):
        kf = interp_faces_mid(kappa)
        q = -kf * grad_faces(T, dzf)
        return T + 1e-9 * div_faces(q, dzc)  # feedback keeps the loop live

    t = timeit(heat_stencil, x)
    report("heat_vertical_stencil", t, 3 * x.size * fsz, bw_peak)

    # 3. saturation adjustment (closure hot path): read sat, write sat (2)
    def adjust(s):
        dz_col = jnp.broadcast_to(dzc, s.shape)
        zrow = jnp.zeros((1,) + s.shape[1:], s.dtype)
        a = (s - 1.0) * dz_col
        S = cumsum_z(a)
        carry = S - jnp.minimum(cummin_z(S), 0.0)
        c_in = jnp.concatenate([zrow, carry[:-1]], axis=0)
        s_up = jnp.minimum(s + c_in / dz_col, 1.0)
        b2 = -s_up * dz_col
        S2 = cumsum_z(b2, reverse=True)
        c2 = S2 - jnp.minimum(cummin_z(S2, reverse=True), 0.0)
        c2_in = jnp.concatenate([c2[1:], zrow], axis=0)
        return jnp.maximum(s_up - c2_in / dz_col, 0.0) * 0.999 + 1e-4

    t = timeit(adjust, sat)
    report("saturation_adjustment", t, 2 * sat.size * fsz, bw_peak)

    # 4. batched tridiagonal solve: read a,b,c,d write x (5 arrays)
    a = jnp.asarray(rng.uniform(-1, 0, (NZ, CELLS)), F)
    c = jnp.asarray(rng.uniform(-1, 0, (NZ, CELLS)), F)
    b = jnp.asarray(2.5 + rng.uniform(0, 1, (NZ, CELLS)), F)

    for name, solver in (("tridiag_thomas_scan", tridiag_solve),
                         ("tridiag_pcr", tridiag_solve_pcr)):
        t = timeit(lambda d, s=solver: s(a, b, c, d) * 0.999 + 1e-6, x)
        report(name, t, 5 * x.size * fsz, bw_peak)


if __name__ == "__main__":
    main()
