"""Fused segment-VJP Pallas kernel: the WHOLE backward pass in VMEM.

The round-4/5 measurements (experiments/ab_fused_grad.py, ab_backward.py)
showed the gradient workload is dominated by the *backward* sweep: the XLA
transpose of one step is a ~17-fusion launch chain just like the pre-fusion
forward was, and storing per-step residuals in HBM is slower than
recomputing (the model is compute-dense: ~5.6k VPU ops vs 3.5 HBM bytes per
cell*step — experiments/roofline_census.py). So the backward gets the same
treatment as the forward: one Pallas kernel per segment that

1. runs the forward ``pre_closure_step^inner`` over a block of columns,
   storing each step's **lean carry** (live leaves only) to VMEM scratch —
   the per-step "checkpoint" never touches HBM;
2. runs the reverse sweep: for step i = inner-1 .. 0, reads the stored
   carry, re-traces the step under `jax.vjp` (linearize + transpose happen
   at TRACE time — the kernel body contains the transposed physics as plain
   VPU ops), and applies it to the running cotangent;
3. writes the segment-input cotangent per block, and accumulates the
   parameter (hoisted-constant) cotangents across blocks and steps.

Per step the in-kernel work is ~3x one fused forward step (checkpoint
forward + vjp-forward + transpose), with zero HBM traffic inside the
segment. VMEM budget: carries are ``(inner, rows, block)`` f32 scratch
(heat+Richards: 61 rows -> inner=48 x block=256 ~ 3 MB).

Used by `timesteppers/fused_grad.make_fused_grad_rollout(bwd="pallas")` as
the custom_vjp backward of each fused forward segment. Gradient equivalence
vs the XLA vjp is locked in tests/test_fused_grad.py.

Cites: reference AD path `ext/TerrariumCheckpointingExt` (Enzyme +
Checkpointing.jl); this kernel is its TPU-native replacement at the
per-segment level.
"""
from __future__ import annotations

import dataclasses as _dc
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..grids.column import ColumnGrid

__all__ = ["make_segment_vjp"]

#: in-kernel attribution knob (experiments/ab_grad_attrib.py): "vjp" =
#: production; "plain" = reverse sweep runs the plain step instead of its
#: vjp (isolates the transpose cost); "none" = forward checkpoint loop only.
#: Non-default modes produce WRONG cotangents — measurement only.
BWD_MODE = "vjp"


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _to2d(leaf):
    leaf = jnp.asarray(leaf)
    if leaf.ndim == 0:
        return leaf[None, None]
    if leaf.ndim == 1:
        return leaf[None, :]
    return leaf


def make_segment_vjp(model_fn, timestepper, ctx, input_sources=(), *,
                     dt: float, inner_steps: int, block_cells: int = 256,
                     xy_rank2: bool = False,
                     interpret: Optional[bool] = None):
    """Build ``seg_vjp(state0, params, ct_state) -> (ct_state0, ct_params)``
    computing the vjp of one fused segment (``pre_closure_step^inner`` with
    dead leaves zeroed) entirely inside a Pallas kernel.

    ``state0``/``ct_state`` are full State pytrees (cotangents for dead and
    integer leaves are ignored / returned as zeros/float0, matching the XLA
    `lean_chain` vjp).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def seg_vjp(state0, params, ct_state):
        from .vertical_ops import force_concat_shifts
        from jax.interpreters import partial_eval as pe

        model0 = model_fn(params)
        grid = model0.grid
        cells = grid.cells
        block = min(block_cells, _round_up(cells, 128))
        n_blocks = -(-cells // block)
        padded = n_blocks * block
        block_grid = ColumnGrid(cells=block, vertical=grid.vertical,
                                nf=grid.nf)

        def _pad(leaf, fill_edge=True):
            if leaf.shape[-1] == padded or leaf.shape == (1, 1):
                return leaf
            if fill_edge:
                return jnp.pad(leaf, ((0, 0), (0, padded - leaf.shape[-1])),
                               mode="edge")
            return jnp.pad(leaf, ((0, 0), (0, padded - leaf.shape[-1])))

        leaves, treedef = jax.tree_util.tree_flatten(state0)
        ndims = [jnp.ndim(l) for l in leaves]

        def block_like(leaf):
            if jnp.ndim(leaf) == 0:
                return jax.ShapeDtypeStruct((), leaf.dtype)
            if jnp.ndim(leaf) == 1:
                return jax.ShapeDtypeStruct((1, block) if xy_rank2
                                            else (block,), leaf.dtype)
            return jax.ShapeDtypeStruct((leaf.shape[0], block), leaf.dtype)

        samples = [block_like(l) for l in leaves]
        sample = jax.tree_util.tree_unflatten(treedef, samples)
        coord_arrays = (grid.z_centers, grid.z_faces, grid.dz, grid.dz_faces)
        coord_samples = [jax.ShapeDtypeStruct(c.shape, c.dtype)
                         for c in coord_arrays]

        # ONE closure_convert under jax.vjp: `extras` are the hoisted consts
        # as functions of params; `pull` maps their cotangents back to params
        holder = {}

        def extract_consts(p):
            m = model_fn(p)

            def step_fn(state, zc, zf, dz, dzf):
                g = block_grid.with_traced_coords(zc, zf, dz, dzf)
                mm = _dc.replace(m, grid=g)
                return timestepper.pre_closure_step(mm, state, ctx,
                                                    input_sources, dt)

            from .fused_step import closure_convert_all

            with force_concat_shifts():
                conv, extra = closure_convert_all(step_fn, sample,
                                                  *coord_samples)
            holder["fn"] = conv
            return tuple(extra)

        extras, pull_extras = jax.vjp(extract_consts, params)
        converted = holder["fn"]
        extra_samples = [jax.ShapeDtypeStruct(np.shape(e),
                                              jnp.asarray(e).dtype)
                         for e in extras]

        # live-leaf analysis on the converted step (same DCE as the primal
        # fused kernel)
        def flat_conv(lv, *cv):
            st = jax.tree_util.tree_unflatten(treedef, lv)
            return jax.tree_util.tree_leaves(converted(st, *cv))

        closed = jax.make_jaxpr(flat_conv)(samples, *coord_samples,
                                           *extra_samples)
        _, used = pe.dce_jaxpr(closed.jaxpr,
                               [True] * len(closed.jaxpr.outvars))
        used_leaves = list(used)[:len(leaves)]
        live = [i for i, u in enumerate(used_leaves) if u]
        n_live = len(live)
        lfloat = [jnp.issubdtype(leaves[i].dtype, jnp.floating)
                  for i in live]
        ex_float = [jnp.issubdtype(jnp.asarray(e).dtype, jnp.floating)
                    for e in extras]

        # ---- kernel operands -------------------------------------------
        st_arrays = [_pad(_to2d(leaves[i])) for i in live]
        consts = list(coord_arrays) + list(extras)
        consts2d = [_to2d(jnp.asarray(c)) for c in consts]
        n_coord = len(coord_arrays)
        ct_leaves = jax.tree_util.tree_leaves(ct_state)
        # cotangents: zero-pad (padded columns must not contribute)
        ct_arrays = [_pad(_to2d(ct_leaves[i]), fill_edge=False)
                     for k, i in enumerate(live) if lfloat[k]]
        flive = [i for k, i in enumerate(live) if lfloat[k]]

        def spec_blocked(a):
            if a.shape == (1, 1):
                return pl.BlockSpec(a.shape, lambda i: (0, 0))
            return pl.BlockSpec((a.shape[0], block), lambda i: (0, i))

        def spec_full(a):
            return pl.BlockSpec(a.shape, lambda i: (0, 0))

        in_specs = ([spec_blocked(a) for a in st_arrays]
                    + [spec_full(c) for c in consts2d]
                    + [spec_blocked(a) for a in ct_arrays])

        # outputs: ct0 per float live leaf (cell-blocked ones per block,
        # scalars accumulated) + ct per float extra (accumulated)
        out_specs, out_shapes = [], []
        for k, i in enumerate(flive):
            a = _to2d(leaves[i])
            if ndims[i] >= 1:
                shp = (a.shape[0], padded)
                out_specs.append(pl.BlockSpec((a.shape[0], block),
                                              lambda i_: (0, i_)))
            else:
                shp = (1, 1)
                out_specs.append(pl.BlockSpec((1, 1), lambda i_: (0, 0)))
            out_shapes.append(jax.ShapeDtypeStruct(shp, a.dtype))
        for e, isf in zip(extras, ex_float):
            if not isf:
                continue
            e2 = _to2d(jnp.asarray(e))
            out_specs.append(spec_full(e2))
            out_shapes.append(jax.ShapeDtypeStruct(e2.shape, e2.dtype))

        # scratch: per live leaf a per-step carry history
        try:
            from jax.experimental.pallas import tpu as pltpu
            vmem, smem = pltpu.VMEM, pltpu.SMEM
        except Exception:  # pragma: no cover - non-TPU jaxlib
            vmem = smem = pl.MemorySpace.ANY  # type: ignore
        scratch_shapes = []
        for k, i in enumerate(live):
            s = samples[i]
            if len(s.shape) == 0:
                scratch_shapes.append(smem((inner_steps,), s.dtype))
            else:
                rows = s.shape[0] if len(s.shape) == 2 else 1
                scratch_shapes.append(
                    vmem((inner_steps, rows, block), s.dtype))

        def kernel(*refs):
            ins = refs[:n_live]
            const_refs = refs[n_live:n_live + len(consts2d)]
            ct_refs = refs[n_live + len(consts2d):
                           n_live + len(consts2d) + len(ct_arrays)]
            n_out = len(out_shapes)
            outs = refs[n_live + len(consts2d) + len(ct_arrays):
                        n_live + len(consts2d) + len(ct_arrays) + n_out]
            scratch = refs[n_live + len(consts2d) + len(ct_arrays) + n_out:]

            def read(ref, nd, state_leaf=False):
                val = ref[...]
                if nd == 0:
                    return jnp.reshape(val, ())
                if nd == 1 and not (xy_rank2 and state_leaf):
                    return jnp.squeeze(val, axis=0)
                return val

            const_vals = [read(cr, jnp.ndim(c))
                          for cr, c in zip(const_refs, consts)]
            coord_vals = const_vals[:n_coord]
            extra_vals = const_vals[n_coord:]
            fex_vals = [v for v, isf in zip(extra_vals, ex_float) if isf]

            def splice_extras(fex):
                it = iter(fex)
                return [next(it) if isf else v
                        for v, isf in zip(extra_vals, ex_float)]

            def rebuild(carry):
                vals = {i: v for i, v in zip(live, carry)}
                return [vals[i] if i in vals
                        else jnp.zeros(s.shape, s.dtype)
                        for i, s in enumerate(samples)]

            def run_step(carry, fex):
                st = jax.tree_util.tree_unflatten(treedef, rebuild(carry))
                out_st = converted(st, *coord_vals, *splice_extras(fex))
                ol = jax.tree_util.tree_leaves(out_st)
                return [ol[i] for i in live]

            # ---- forward: store per-step carries in VMEM/SMEM ----------
            carry0 = [read(ins[k], ndims[live[k]], state_leaf=True)
                      for k in range(n_live)]

            def store(k, i, v):
                s = samples[live[k]]
                if len(s.shape) == 0:
                    scratch[k][i] = v
                else:
                    rows = s.shape[0] if len(s.shape) == 2 else 1
                    scratch[k][pl.dslice(i, 1)] = jnp.reshape(
                        v, (1, rows, block))

            def load(k, i):
                s = samples[live[k]]
                if len(s.shape) == 0:
                    return scratch[k][i]
                return jnp.reshape(scratch[k][pl.dslice(i, 1)], s.shape)

            def fwd_body(i, carry):
                for k in range(n_live):
                    store(k, i, carry[k])
                return run_step(carry, fex_vals)

            jax.lax.fori_loop(0, inner_steps, fwd_body, carry0)

            # ---- backward: reverse sweep of per-step vjps --------------
            fpos = [k for k in range(n_live) if lfloat[k]]
            ipos = [k for k in range(n_live) if not lfloat[k]]
            ct_f0 = [read(ct_refs[j], ndims[flive[j]], state_leaf=True)
                     for j in range(len(flive))]
            dex0 = [jnp.zeros(np.shape(v), v.dtype) for v in fex_vals]

            def bwd_body(j, st8):
                ct_f, dex = st8
                i = inner_steps - 1 - j
                carry_i = [load(k, i) for k in range(n_live)]
                ints_i = [carry_i[k] for k in ipos]

                def step_floats(floats, fex):
                    it_f, it_i = iter(floats), iter(ints_i)
                    carry = [next(it_f) if lfloat[k] else next(it_i)
                             for k in range(n_live)]
                    out = run_step(carry, fex)
                    return [out[k] for k in fpos]

                if BWD_MODE == "plain":  # attribution: no transpose
                    out = step_floats([carry_i[k] for k in fpos], fex_vals)
                    return ([a + b for a, b in zip(ct_f, out)], dex)
                _, vjp_fn = jax.vjp(step_floats,
                                    [carry_i[k] for k in fpos], fex_vals)
                d_floats, d_fex = vjp_fn(ct_f)
                return (list(d_floats),
                        [a + b for a, b in zip(dex, d_fex)])

            if BWD_MODE == "none":  # attribution: checkpoint loop only
                ct_fin, dex = ct_f0, dex0
            else:
                ct_fin, dex = jax.lax.fori_loop(0, inner_steps, bwd_body,
                                                (ct_f0, dex0))

            # ---- write outputs -----------------------------------------
            first = pl.program_id(0) == 0
            o = 0
            for j, i in enumerate(flive):
                if ndims[i] >= 1:
                    outs[o][...] = jnp.reshape(ct_fin[j], outs[o].shape)
                else:
                    prev = jnp.where(first, jnp.zeros_like(outs[o][...]),
                                     outs[o][...])
                    outs[o][...] = prev + jnp.reshape(ct_fin[j], (1, 1))
                o += 1
            for d in dex:
                prev = jnp.where(first, jnp.zeros_like(outs[o][...]),
                                 outs[o][...])
                outs[o][...] = prev + jnp.reshape(d, outs[o].shape)
                o += 1

        out_arrays = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(*st_arrays, *consts2d, *ct_arrays)

        # ---- assemble cotangent pytrees --------------------------------
        it = iter(out_arrays[:len(flive)])
        ct0_leaves = []
        for i, leaf in enumerate(leaves):
            if i in flive:
                arr = next(it)
                if ndims[i] == 0:
                    ct0_leaves.append(arr[0, 0])
                elif ndims[i] == 1:
                    ct0_leaves.append(arr[0, :cells])
                else:
                    ct0_leaves.append(arr[:, :cells])
            elif jnp.issubdtype(leaf.dtype, jnp.floating):
                ct0_leaves.append(jnp.zeros_like(leaf))
            else:  # integer leaves: float0 cotangent
                ct0_leaves.append(np.zeros(np.shape(leaf),
                                           dtype=jax.dtypes.float0))
        ct_state0 = jax.tree_util.tree_unflatten(treedef, ct0_leaves)

        ct_ex_arrays = list(out_arrays[len(flive):])
        it2 = iter(ct_ex_arrays)
        ct_extras = []
        for e, isf in zip(extras, ex_float):
            if isf:
                arr = next(it2)
                ct_extras.append(jnp.reshape(arr, np.shape(e)))
            else:
                ct_extras.append(np.zeros(np.shape(e),
                                          dtype=jax.dtypes.float0))
        (ct_params,) = pull_extras(tuple(ct_extras))
        return ct_state0, ct_params

    return seg_vjp
