"""Roofline model of the fused Pallas kernel (VERDICT r5 item 3).

Two parts:

* ``--census`` (CPU): trace the production fused-kernel body (the
  closure-converted ``pre_closure_step`` at block scale, exactly as
  `ops/fused_step.make_fused_lean_rollout` builds it) to a jaxpr and count
  primitive ops by class, recursing into scan/cond/pjit subjaxprs with trip
  counts. Reports FLOPs/(cell*step), transcendentals/(cell*step), and
  HBM bytes/(cell*step) from the live-leaf analysis (one read + one write of
  the live leaves per kernel call, amortized over inner_steps).

* ``--micro`` (chip): empirical speed-of-light microbenchmarks in Pallas —
  VPU FMA peak (chained a*x+b over a VMEM-resident block) and transcendental
  throughput (chained exp) — so the census can be priced in *measured*
  per-op costs instead of datasheet guesses. (HBM copy bandwidth ~710 GB/s
  was measured in bench_kernels.py round 2.)

* ``--interpret-headline M`` : combine census + micro numbers with a
  measured headline throughput (M cells*steps/s) into %-of-roofline figures
  and a top-5 cost-center ranking -> KERNELS_r05.json.

Run:  python experiments/roofline_census.py --census          (CPU ok)
      python experiments/roofline_census.py --micro           (chip)
"""
from __future__ import annotations

import dataclasses as _dc
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BLOCK = 512
INNER = 144
NZ = 30

# op-class map: primitive name -> (class, flops per output element)
CHEAP = {"add", "sub", "mul", "neg", "max", "min", "abs", "sign", "floor",
         "ceil", "round", "clamp", "select_n", "and", "or", "not", "xor",
         "shift_left", "shift_right_logical", "shift_right_arithmetic",
         "rem", "is_finite", "nextafter", "copy", "add_any"}
COMPARE = {"eq", "ne", "ge", "gt", "le", "lt"}
MEDIUM = {"div", "sqrt", "rsqrt", "cbrt", "square", "reciprocal"}
TRANS = {"exp", "log", "log1p", "expm1", "pow", "tanh", "sin", "cos",
         "logistic", "atan2", "erf", "exp2", "log2"}
DATA = {"broadcast_in_dim", "reshape", "convert_element_type", "slice",
        "concatenate", "pad", "transpose", "iota", "squeeze", "rev",
        "dynamic_slice", "gather", "stop_gradient", "reduce_precision",
        "bitcast_convert_type"}
REDUCE = {"reduce_sum", "reduce_max", "reduce_min", "reduce_and",
          "reduce_or", "argmax", "argmin", "reduce_prod"}
CALLS = {"pjit", "jit", "closed_call", "custom_jvp_call", "custom_vjp_call",
         "custom_vjp_call_jaxpr", "remat", "checkpoint", "custom_jvp_call_jaxpr"}


def _out_size(eqn):
    return max(int(np.prod(v.aval.shape)) for v in eqn.outvars) \
        if eqn.outvars else 0


def census_jaxpr(jaxpr, mult=1.0, acc=None):
    """Walk a jaxpr, accumulating {class: element-ops} and per-primitive
    counts, weighting nested loop bodies by trip count."""
    if acc is None:
        acc = {"by_class": {}, "by_prim": {}, "dot_flops": 0.0}

    def add(cls, prim, n):
        acc["by_class"][cls] = acc["by_class"].get(cls, 0.0) + n
        acc["by_prim"][prim] = acc["by_prim"].get(prim, 0.0) + n

    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "scan":
            length = eqn.params["length"]
            body = eqn.params["jaxpr"].jaxpr
            census_jaxpr(body, mult * length, acc)
            continue
        if prim == "while":
            # fori_loop: trip count from the loop bounds if constant-folded
            body = eqn.params["body_jaxpr"].jaxpr
            census_jaxpr(body, mult, acc)  # conservative: 1 trip (unknown)
            continue
        if prim == "cond":
            for br in eqn.params["branches"]:
                census_jaxpr(br.jaxpr, mult, acc)
            continue
        if prim in CALLS or "call" in prim:
            sub = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            if sub is not None:
                census_jaxpr(getattr(sub, "jaxpr", sub), mult, acc)
            continue
        n = _out_size(eqn) * mult
        if prim == "dot_general":
            a, b = (eqn.invars[0].aval.shape, eqn.invars[1].aval.shape)
            ((lc, rc), _) = eqn.params["dimension_numbers"]
            k = int(np.prod([a[i] for i in lc]))
            m = int(np.prod(a)) // k
            nn = int(np.prod(b)) // k
            fl = 2.0 * m * nn * k * mult
            acc["dot_flops"] += fl
            add("dot", prim, fl)
        elif prim == "integer_pow":
            # lowered as a short multiply chain
            p = abs(int(eqn.params["y"]))
            add("cheap", prim, n * max(1, p.bit_length()))
        elif prim in CHEAP:
            add("cheap", prim, n)
        elif prim in COMPARE:
            add("compare", prim, n)
        elif prim in MEDIUM:
            add("medium", prim, n)
        elif prim in TRANS:
            add("transcendental", prim, n)
        elif prim in REDUCE:
            add("reduce", prim, n)
        elif prim in DATA:
            add("data_movement", prim, n)
        else:
            add("other:" + prim, prim, n)
    return acc


def build_block_step():
    """The production headline config (bench.py) at fused-kernel block
    scale; returns (converted_fn, sample_args, live_bytes_per_call)."""
    import jax
    import terrarium_tpu as tt
    from terrarium_tpu.grids.column import ColumnGrid
    from terrarium_tpu.ops.vertical_ops import force_concat_shifts

    cells = 24572
    grid = tt.ColumnGrid.of(cells=cells, spacing=tt.ExponentialSpacing(N=NZ),
                            nf=np.float32)
    hydrology = tt.SoilHydrology(
        vertical_flow=tt.RichardsEq(),
        hydraulic_properties=tt.ConstantSoilHydraulics(
            swrc=tt.VanGenuchten(alpha=2.0, n=2.0),
            unsat_hydraulic_cond=tt.UnsatKVanGenuchten()))
    soil = tt.SoilEnergyWaterCarbon(hydrology=hydrology)
    model = tt.SoilModel(grid=grid, soil=soil)
    sim = tt.initialize(
        model, tt.ForwardEuler(dt=60.0),
        initializers={
            "temperature": lambda x, z: 1.0 + 0.0 * z,
            "saturation_water_ice": lambda x, z: np.minimum(1.0, 0.5 - 0.05 * z),
        },
        boundary_conditions=tt.PrescribedSurfaceTemperature(
            lambda t: 5.0 * jax.numpy.sin(2 * jax.numpy.pi * t / 86400.0)),
    )

    block_grid = ColumnGrid(cells=BLOCK, vertical=grid.vertical, nf=grid.nf)

    def step_fn(state, zc, zf, dz, dzf):
        g = block_grid.with_traced_coords(zc, zf, dz, dzf)
        m = _dc.replace(model, grid=g)
        return sim.timestepper.pre_closure_step(m, state, sim.ctx,
                                                sim.input_sources, 60.0)

    leaves, treedef = jax.tree_util.tree_flatten(sim.state)

    def block_like(leaf):
        if np.ndim(leaf) == 0:
            return jax.ShapeDtypeStruct((), leaf.dtype)
        if np.ndim(leaf) == 1:
            return jax.ShapeDtypeStruct((BLOCK,), leaf.dtype)
        return jax.ShapeDtypeStruct((leaf.shape[0], BLOCK), leaf.dtype)

    sample = jax.tree_util.tree_unflatten(treedef,
                                          [block_like(l) for l in leaves])
    coords = (grid.z_centers, grid.z_faces, grid.dz, grid.dz_faces)
    coord_samples = [jax.ShapeDtypeStruct(c.shape, c.dtype) for c in coords]

    with force_concat_shifts():
        closed = jax.make_jaxpr(
            lambda s, *c: step_fn(s, *c))(sample, *coord_samples)

    # live-leaf analysis (same DCE as the fused rollout)
    from jax.interpreters import partial_eval as pe

    def flat_step(lv, *cv):
        st = jax.tree_util.tree_unflatten(treedef, lv)
        return jax.tree_util.tree_leaves(step_fn(st, *cv))

    with force_concat_shifts():
        closed_flat = jax.make_jaxpr(flat_step)(
            [block_like(l) for l in leaves], *coord_samples)
    _, used = pe.dce_jaxpr(closed_flat.jaxpr,
                           [True] * len(closed_flat.jaxpr.outvars))
    live_leaves = [l for l, u in zip(leaves, list(used)[:len(leaves)]) if u]
    live_bytes_block = sum(
        (int(np.prod(np.shape(l))) if np.ndim(l) >= 1 else 1)
        / (np.shape(l)[-1] if np.ndim(l) >= 1 else 1) * BLOCK
        * np.dtype(getattr(l, "dtype", np.float32)).itemsize
        for l in live_leaves)
    names = []
    # map leaves back to names for the report
    flat_names = []
    for g in ("prognostic", "tendencies", "auxiliary", "inputs"):
        flat_names += [f"{g}/{k}" for k in sorted(getattr(sim.state, g))]
    return closed, live_bytes_block, len(live_leaves), flat_names


def run_census():
    from jax.interpreters import partial_eval as pe

    closed, live_bytes_block, n_live, _ = build_block_step()
    # DCE first: count only ops contributing to outputs
    jaxpr, _ = pe.dce_jaxpr(closed.jaxpr,
                            [True] * len(closed.jaxpr.outvars))
    acc = census_jaxpr(jaxpr)
    per = BLOCK  # per step per block; normalize to per cell*step
    out = {
        "config": "n145_heat_richards bench.py headline",
        "block_cells": BLOCK, "inner_steps": INNER, "nz": NZ,
        "by_class_per_cell_step": {k: round(v / per, 2)
                                   for k, v in sorted(acc["by_class"].items())},
        "top_prims_per_cell_step": dict(sorted(
            ((k, round(v / per, 2)) for k, v in acc["by_prim"].items()),
            key=lambda kv: -kv[1])[:20]),
        "dot_flops_per_cell_step": round(acc["dot_flops"] / per, 2),
        "live_leaves": n_live,
        "hbm_bytes_per_cell_step": round(
            2.0 * live_bytes_block / BLOCK / INNER, 4),
    }
    flops = sum(v for k, v in acc["by_class"].items()
                if k in ("cheap", "medium", "compare", "reduce")) / per
    out["vpu_elem_ops_per_cell_step"] = round(
        flops + acc["by_class"].get("transcendental", 0) / per, 2)
    out["flops_per_cell_step_ex_trans"] = round(flops, 2)
    out["transcendentals_per_cell_step"] = round(
        acc["by_class"].get("transcendental", 0) / per, 2)
    out["arithmetic_intensity_flops_per_byte"] = round(
        out["vpu_elem_ops_per_cell_step"] / max(out["hbm_bytes_per_cell_step"],
                                                1e-9), 1)
    print(json.dumps(out, indent=1))
    return out


def run_micro():
    """Chip micro-benchmarks: VPU FMA peak + transcendental/div throughput
    in Pallas. Mosaic fori_loop lowering needs unroll in {1, num_steps}, so
    the op chain is fully unrolled; the per-op rate is derived from the
    DIFFERENCE of two chain lengths, cancelling the constant tunnel/launch
    overhead (~35 ms) and HBM read/write of the block."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    shape = (256, 512)
    nblocks = 128

    def make(kind, R):
        def kernel(x_ref, o_ref):
            x = x_ref[...]

            def body(_, v):
                if kind == "fma":
                    return v * np.float32(1.0000001) + np.float32(1e-7)
                if kind == "exp":
                    return jnp.exp(v * np.float32(1e-3))
                if kind == "div":
                    return np.float32(1.00001) / (v + np.float32(1.5))
                if kind == "pow":
                    return (v + np.float32(1.5)) ** np.float32(0.7071)
                raise ValueError(kind)

            if kind == "fma4":
                # 4 independent chains: throughput-bound (the single chain
                # is latency-bound and understates the VPU peak)
                def body4(_, vs):
                    return tuple(v * np.float32(1.0000001 + 1e-9 * i)
                                 + np.float32(1e-7) for i, v in enumerate(vs))

                vs = jax.lax.fori_loop(0, R, body4, (x, x + 1.0, x + 2.0,
                                                     x + 3.0), unroll=R)
                o_ref[...] = vs[0] + vs[1] + vs[2] + vs[3]
                return
            o_ref[...] = jax.lax.fori_loop(0, R, body, x, unroll=R)

        x = jnp.ones((shape[0], shape[1] * nblocks), jnp.float32)
        f = pl.pallas_call(
            kernel, grid=(nblocks,),
            in_specs=[pl.BlockSpec(shape, lambda i: (0, i))],
            out_specs=pl.BlockSpec(shape, lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))

        # 8 chained kernel passes per dispatch: the per-pair time deltas
        # must dominate the ~25 ms tunnel dispatch+sync jitter
        @jax.jit
        def f8(x0):
            def body(v, _):
                return f(v), None

            out, _ = jax.lax.scan(body, x0, None, length=8)
            return out

        return f8, x

    PASSES = 8

    def timed(kind, R, reps=7):
        f, x = make(kind, R)
        y = f(x)
        float(jnp.sum(y))  # compile+sync
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            y = f(x)
            float(jnp.sum(y))
            times.append(time.perf_counter() - t0)
        return float(np.median(times)), x.size * PASSES

    results = {}
    for kind, flops_per, (r1, r2) in (("fma", 2.0, (64, 512)),
                                      ("fma4", 2.0, (64, 256)),
                                      ("exp", 1.0, (64, 256)),
                                      ("pow", 1.0, (16, 128)),
                                      ("div", 1.0, (64, 512))):
        t1, size = timed(kind, r1)
        t2, _ = timed(kind, r2)
        chains = 4 if kind == "fma4" else 1
        rate = chains * size * (r2 - r1) / max(t2 - t1, 1e-9)
        results[kind] = {
            "t_R%d_s" % r1: round(t1, 4), "t_R%d_s" % r2: round(t2, 4),
            "ops_per_s": rate,
            "gops_per_s": round(rate / 1e9, 1),
            "gflops_per_s": round(flops_per * rate / 1e9, 1),
        }
        print(json.dumps({kind: results[kind]}), flush=True)
    return results


if __name__ == "__main__":
    if "--micro" in sys.argv:
        run_micro()
    else:
        run_census()
