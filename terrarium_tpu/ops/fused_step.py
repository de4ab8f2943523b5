"""Fused whole-step Pallas kernel.

The hot path of the framework is the per-column model step: ~20 elementwise
passes over ``(Nz, cells)`` arrays, HBM-bandwidth bound. This module traces
the **entire step function** (tendencies + explicit update + closures) into a
single `pallas_call`: each grid program loads a block of columns into VMEM,
runs the full physics in registers/VMEM, and writes the block back — one HBM
round trip for the whole step instead of one per fused XLA kernel.

The kernel body is not hand-written physics: it re-traces the same pure
``timestepper.step`` used by the XLA path (via `jax.closure_convert`, which
also hoists grid-coordinate constants into kernel inputs), so the two paths
cannot diverge. Fusability requirements, all met by the shipped physics: no
dynamic gathers (water table uses the masked-min form), z-scans with
``unroll``/``reverse=`` instead of array flips, static shapes.

Limitations: `make_fused_step` supports static input sources only;
`make_fused_lean_rollout` additionally supports uniformly-spaced time-series
sources via in-kernel window interpolation (`_WindowSource`). Both require
laterally-independent physics (always true for this model family).
"""
from __future__ import annotations

import dataclasses as _dc
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..grids.column import ColumnGrid

__all__ = ["closure_convert_all", "make_fused_step", "make_fused_lean_rollout"]


def closure_convert_all(fn, *sample_args):
    """Like `jax.closure_convert`, but hoists ALL jaxpr constants — not just
    traced ones. `jax.closure_convert` partitions constants by
    "maybe-perturbed" and leaves CONCRETE arrays (e.g. a committed
    ``jnp.exp(x)`` scalar stored in a process config) baked into the
    converted function's jaxpr; a Pallas TPU kernel cannot capture
    constants, so tracing such a model into the fused kernel failed with
    "captures constants [f32[]]" (round-5 chip repro). Here every closure
    constant becomes an explicit argument; weak Python literals stay inline
    literals as before.

    Returns ``(converted, consts)`` with the same calling convention as
    `jax.closure_convert`: ``converted(*sample_like_args, *consts)``.
    """
    import jax.tree_util as jtu
    from jax import core as jcore

    flat, in_tree = jtu.tree_flatten(tuple(sample_args))

    def flat_fn(*fa):
        args = jtu.tree_unflatten(in_tree, fa)
        return fn(*args)

    closed, out_shape = jax.make_jaxpr(flat_fn, return_shape=True)(*flat)
    out_tree = jtu.tree_structure(out_shape)
    consts = list(closed.consts)
    n_args = len(sample_args)

    def converted(*args_and_consts):
        args = args_and_consts[:n_args]
        cvals = list(args_and_consts[n_args:])
        if len(cvals) != len(consts):
            raise TypeError(f"converted expects {len(consts)} hoisted "
                            f"consts, got {len(cvals)}")
        fa, tree2 = jtu.tree_flatten(tuple(args))
        if tree2 != in_tree:
            raise TypeError("argument pytree structure changed between "
                            "closure_convert_all and the converted call")
        out_flat = jcore.eval_jaxpr(closed.jaxpr, cvals, *fa)
        return jtu.tree_unflatten(out_tree, out_flat)

    return converted, consts


def _uniform_ts_meta(src):
    """(t0, dt) of a uniformly-spaced time-series source, else None."""
    times = np.asarray(src.times, dtype=np.float64)
    if times.ndim != 1 or times.size < 2:
        return None
    d = np.diff(times)
    if not np.allclose(d, d[0], rtol=1e-6, atol=0.0):
        return None
    return float(times[0]), float(d[0])


class _WindowSource:
    """In-kernel stand-in for a uniform `TimeSeriesInputSource`: linear time
    interpolation from a ``(W, block)`` window of the series, selected with
    one-hot row masks (iota + compare + masked sum over sublanes) — no
    gathers or dynamic slices, so it traces into a Mosaic kernel. Flat
    extrapolation at the window ends matches the XLA-path source
    (`io/input_sources.py:70-78`)."""

    def __init__(self, names, windows, t_win0, dts):
        self.names, self.windows = names, windows
        self.t_win0, self.dts = t_win0, dts

    def update_inputs(self, state):
        updates = {}
        for name, win in zip(self.names, self.windows):
            like = state.inputs[name]
            W = win.shape[0]
            u = (state.clock.time - self.t_win0) / self.dts
            u = jnp.clip(u, 0.0, float(W - 1))
            r = jnp.floor(u)
            w = (u - r).astype(win.dtype)
            rows = jax.lax.broadcasted_iota(jnp.int32, win.shape, 0)
            ri = r.astype(jnp.int32)
            v0 = jnp.sum(jnp.where(rows == ri, win, 0.0), axis=0)
            # at the clamped top row the r+1 mask is empty and w == 0, so
            # the v1 term vanishes exactly (flat extrapolation)
            v1 = jnp.sum(jnp.where(rows == ri + 1, win, 0.0), axis=0)
            val = (1.0 - w) * v0 + w * v1
            updates[name] = jnp.broadcast_to(val.astype(like.dtype),
                                             like.shape)
        return state.update(updates)


#: Declare the cell-block grid dimension PARALLEL (Mosaic may split blocks
#: across TensorCores on megacore parts). MEASURED NEUTRAL on the axon chip
#: — fused/XLA ratio 1.098 vs 1.095 sequential, i.e. this part executes the
#: kernel grid on one core either way — while Mosaic compile time grew
#: 80 s -> 640 s. Default off; flip on for genuine megacore targets.
PARALLEL_GRID = False


def _parallel_grid_params():
    """`compiler_params` for the fused kernels per ``PARALLEL_GRID`` (every
    grid program reads/writes a disjoint cell block, so parallel semantics
    are always legal here)."""
    if not PARALLEL_GRID:
        return {}
    try:
        from jax.experimental.pallas import tpu as pltpu

        return dict(compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.PARALLEL,)))
    except Exception:  # non-TPU jaxlib: interpret path ignores it anyway
        return {}


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def make_fused_step(model, timestepper, ctx, input_sources=(), *,
                    block_cells: int = 2048, dt: float, interpret: bool = False):
    """Build ``fused(state) -> state`` executing one full step as one Pallas
    kernel over cell blocks. ``dt`` is static (baked into the trace)."""
    grid = model.grid
    cells = grid.cells
    block = min(block_cells, _round_up(cells, 128))
    n_blocks = -(-cells // block)
    padded = n_blocks * block

    for src in input_sources:
        if hasattr(src, "times"):
            raise ValueError("fused step supports only static input sources")

    # the kernel operates on one block of columns: give the physics a grid
    # whose cells axis is the block width, with coordinate arrays supplied as
    # traced kernel inputs (Pallas requires constants as explicit inputs)
    block_grid = ColumnGrid(cells=block, vertical=grid.vertical, nf=grid.nf)

    def step_fn(state, zc, zf, dz, dzf):
        g = block_grid.with_traced_coords(zc, zf, dz, dzf)
        m = _dc.replace(model, grid=g)
        return timestepper.step(m, state, ctx, input_sources, dt)

    coord_arrays = (grid.z_centers, grid.z_faces, grid.dz, grid.dz_faces)

    def _to2d(leaf):
        leaf = jnp.asarray(leaf)
        if leaf.ndim == 0:
            return leaf[None, None]
        if leaf.ndim == 1:
            return leaf[None, :]
        return leaf

    def _pad(leaf):
        if leaf.shape[-1] == padded or leaf.shape == (1, 1):
            return leaf
        return jnp.pad(leaf, ((0, 0), (0, padded - leaf.shape[-1])), mode="edge")

    def fused(state):
        from .vertical_ops import force_concat_shifts

        leaves, treedef = jax.tree_util.tree_flatten(state)
        ndims = [jnp.ndim(l) for l in leaves]

        # sample block state (abstract) for closure conversion
        def block_like(leaf):
            if jnp.ndim(leaf) == 0:
                return jax.ShapeDtypeStruct((), leaf.dtype)
            if jnp.ndim(leaf) == 1:
                return jax.ShapeDtypeStruct((block,), leaf.dtype)
            return jax.ShapeDtypeStruct((leaf.shape[0], block), leaf.dtype)

        sample = jax.tree_util.tree_unflatten(
            treedef, [block_like(l) for l in leaves])
        coord_samples = [jax.ShapeDtypeStruct(c.shape, c.dtype)
                         for c in coord_arrays]
        # Mosaic cannot lower negative `lax.pad` (trimming) — trace the
        # physics with the bit-identical concat shift lowering instead.
        with force_concat_shifts():
            converted, extra_consts = closure_convert_all(step_fn, sample,
                                                          *coord_samples)
        consts = list(coord_arrays) + list(extra_consts)
        consts2d = [_to2d(c) for c in consts]

        arrays = [_pad(_to2d(l)) for l in leaves]
        n_state = len(arrays)

        def spec_for(a, cell_blocked):
            if cell_blocked and a.shape != (1, 1):
                return pl.BlockSpec((a.shape[0], block),
                                    lambda i, _r=a.shape[0]: (0, i))
            return pl.BlockSpec(a.shape, lambda i: (0, 0))

        cell_blocked_in = [ndims[k] >= 1 for k in range(n_state)]
        in_specs = ([spec_for(a, cb) for a, cb in zip(arrays, cell_blocked_in)]
                    + [spec_for(c, False) for c in consts2d])
        out_specs = [spec_for(a, cb) for a, cb in zip(arrays, cell_blocked_in)]
        out_shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrays]

        def kernel(*refs):
            ins = refs[:n_state]
            const_refs = refs[n_state:n_state + len(consts2d)]
            outs = refs[n_state + len(consts2d):]
            block_leaves = []
            for k in range(n_state):
                val = ins[k][...]
                if ndims[k] == 0:
                    val = jnp.reshape(val, ())
                elif ndims[k] == 1:
                    val = jnp.squeeze(val, axis=0)
                block_leaves.append(val)
            const_vals = []
            for cr, c in zip(const_refs, consts):
                v = cr[...]
                if jnp.ndim(c) == 0:
                    v = jnp.reshape(v, ())
                elif jnp.ndim(c) == 1:
                    v = jnp.squeeze(v, axis=0)
                const_vals.append(v)
            st = jax.tree_util.tree_unflatten(treedef, block_leaves)
            out_st = converted(st, *const_vals)
            out_leaves = jax.tree_util.tree_leaves(out_st)
            for k in range(n_state):
                val = out_leaves[k]
                outs[k][...] = jnp.reshape(val, outs[k].shape)

        out_arrays = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
            **({} if interpret else _parallel_grid_params()),
        )(*arrays, *consts2d)

        new_leaves = []
        for k in range(n_state):
            arr = out_arrays[k]
            if ndims[k] == 0:
                new_leaves.append(arr[0, 0])
            elif ndims[k] == 1:
                new_leaves.append(arr[0, :cells])
            else:
                new_leaves.append(arr[:, :cells])
        return jax.tree_util.tree_unflatten(treedef, new_leaves)

    return fused


def make_fused_lean_rollout(model, timestepper, ctx, input_sources=(), *,
                            dt: float, inner_steps: int,
                            block_cells: int = 1024,
                            unroll: int = 1,
                            interpret: Optional[bool] = None,
                            xy_rank2: bool = False,
                            apply_closure: bool = True):
    """Build ``rollout(state, n) -> state`` executing ``n`` steps with the
    VMEM-resident fused kernel, carrying only the LIVE state leaves.

    This combines the two rollout optimizations measured separately in
    rounds 1-2:

    * the lean carry of `utils/scan_dce.lean_rollout` — the closure-rotated
      step ``pre_closure_step`` consumes only prognostics (+ clock); dead
      leaves (tendencies, transient auxiliaries) are rebuilt as zeros inside
      the body, and ``closure ∘ pre_closure_step^n == step^n`` exactly on
      the prognostics;
    * the whole-step Pallas fusion of :func:`make_fused_step` — but with
      ``inner_steps`` steps per kernel invocation (`lax.fori_loop` in VMEM),
      so intermediate states never touch HBM at all. Per kernel call the
      HBM traffic is ONE read + ONE write of the live leaves per block,
      amortized over ``inner_steps`` timesteps.

    ``xy_rank2``: keep XY (rank-1) state leaves as ``(1, block)`` rank-2
    values throughout the kernel body (no squeeze on read, rank-2 loop
    carries). The physics is shape-polymorphic for XY leaves
    (`state.State.update` canonicalizes same-size shapes), so results are
    identical; the knob exists as a Mosaic layout-inference dodge for the
    coupled-kernel `layout.h:320` crash (experiments/mosaic_bisect_land_r4)
    where rank-1 XY chains participate in the crashing compound graph.

    ``n`` must be a multiple of ``inner_steps``. The trailing ``closure`` is
    applied by XLA on the rebuilt state; transient auxiliaries are stale
    zeros afterwards (`Simulation.run` refreshes them via
    ``compute_auxiliary``, mirroring the reference's finalize pass,
    `model_integrator.jl:86-87`).
    """
    grid = model.grid
    cells = grid.cells
    block = min(block_cells, _round_up(cells, 128))
    n_blocks = -(-cells // block)
    padded = n_blocks * block
    if interpret is None:
        # Mosaic only exists on TPU; everywhere else (CPU dev/test) the
        # kernel runs through the Pallas interpreter, bit-identically
        interpret = jax.default_backend() != "tpu"

    # time-varying sources: supported when uniformly spaced with XY series —
    # each outer kernel invocation receives a (W, block) window of every
    # series (sliced by XLA) and interpolates in-kernel (`_WindowSource`)
    # `source_slots` preserves the user's source order (update_inputs is
    # last-wins per variable, so the fused path must apply sources in the
    # same order as the XLA path); `ts_sources` is the time-varying subset
    # in that same relative order (matches the win_flat operand order).
    ts_sources, static_sources, source_slots = [], [], []
    for src in input_sources:
        if not hasattr(src, "times"):
            static_sources.append(src)
            source_slots.append(("static", src))
            continue
        meta = _uniform_ts_meta(src)
        if meta is None or any(np.ndim(v) not in (1, 2)
                               for v in src.series.values()):
            raise ValueError(
                "fused rollout supports time-varying sources only with "
                "uniform time spacing and (T,) or (T, cells) series")
        t0s, dts = meta
        names = tuple(sorted(src.series))
        T = int(np.asarray(src.times).shape[0])
        W = min(T, int(np.ceil(inner_steps * dt / dts)) + 2)
        ts = dict(src=src, t0=t0s, dts=dts, names=names, T=T, W=W)
        ts_sources.append(ts)
        source_slots.append(("ts", ts))

    block_grid = ColumnGrid(cells=block, vertical=grid.vertical, nf=grid.nf)

    def step_fn(state, zc, zf, dz, dzf, *win_flat):
        g = block_grid.with_traced_coords(zc, zf, dz, dzf)
        m = _dc.replace(model, grid=g)
        it = iter(win_flat)
        sources = []
        for kind, payload in source_slots:
            if kind == "static":
                sources.append(payload)
            else:
                t_win0 = next(it)
                wins = [next(it) for _ in payload["names"]]
                sources.append(_WindowSource(payload["names"], wins, t_win0,
                                             payload["dts"]))
        return timestepper.pre_closure_step(m, state, ctx, tuple(sources), dt)

    coord_arrays = (grid.z_centers, grid.z_faces, grid.dz, grid.dz_faces)

    def _to2d(leaf):
        leaf = jnp.asarray(leaf)
        if leaf.ndim == 0:
            return leaf[None, None]
        if leaf.ndim == 1:
            return leaf[None, :]
        return leaf

    def _pad(leaf):
        if leaf.shape[-1] == padded or leaf.shape == (1, 1):
            return leaf
        return jnp.pad(leaf, ((0, 0), (0, padded - leaf.shape[-1])), mode="edge")

    def rollout(state, n: int, ts_srcs=None):
        """``ts_srcs``: optional runtime pytree of the time-varying sources
        (same order as at build time) so the (T, cells) series lower as jit
        ARGUMENTS instead of HLO constants (170 MB+ at N145 coupled scale —
        see io/input_sources.py on the remote-compile size limit)."""
        from .vertical_ops import force_concat_shifts

        if n % inner_steps != 0:
            raise ValueError(f"n={n} not a multiple of inner_steps={inner_steps}")
        runtime_ts = ([d["src"] for d in ts_sources] if ts_srcs is None
                      else list(ts_srcs))
        if len(runtime_ts) != len(ts_sources):
            raise ValueError(
                f"ts_srcs has {len(runtime_ts)} sources but the rollout was "
                f"built with {len(ts_sources)} time-varying sources; pass "
                f"exactly one runtime source per build-time source, in the "
                f"same order")
        # runtime sources may override series VALUES and the window's time
        # ORIGIN (a shifted-but-uniform axis with the SAME spacing — the
        # streamed-chunk regime of io/forcing_pipeline.run_fused, where one
        # executable serves every chunk); length and spacing are baked into
        # the kernel at build time and must match
        rt_t0s = []
        for ts, rt in zip(ts_sources, runtime_ts):
            bt_times = np.asarray(ts["src"].times, dtype=np.float64)
            if np.shape(rt.times) != bt_times.shape:
                raise ValueError(
                    "runtime ts_srcs times differ in shape from the "
                    "build-time sources; only series values and the time "
                    "origin may be overridden")
            try:  # traced times (jit args) can only be shape-checked
                rt_times = np.asarray(rt.times, dtype=np.float64)
            except Exception:
                rt_t0s.append(jnp.reshape(
                    jnp.asarray(rt.times)[:1].astype(grid.nf), ()))
                continue
            if not np.allclose(np.diff(rt_times), ts["dts"], rtol=1e-6):
                raise ValueError(
                    "runtime ts_srcs must keep the build-time uniform "
                    "spacing; only series values and the time origin may "
                    "be overridden")
            rt_t0s.append(float(rt_times[0]))

        leaves, treedef = jax.tree_util.tree_flatten(state)
        ndims = [jnp.ndim(l) for l in leaves]

        def block_like(leaf):
            if jnp.ndim(leaf) == 0:
                return jax.ShapeDtypeStruct((), leaf.dtype)
            if jnp.ndim(leaf) == 1:
                # xy_rank2: trace the physics with (1, block) XY leaves
                return jax.ShapeDtypeStruct((1, block) if xy_rank2
                                            else (block,), leaf.dtype)
            return jax.ShapeDtypeStruct((leaf.shape[0], block), leaf.dtype)

        samples = [block_like(l) for l in leaves]
        sample = jax.tree_util.tree_unflatten(treedef, samples)
        coord_samples = [jax.ShapeDtypeStruct(c.shape, c.dtype)
                         for c in coord_arrays]
        # per-invocation forcing-window sample args: for each ts source a
        # scalar window start time followed by one (W, block) array per var
        win_samples, series_padded = [], []
        for ts, rt in zip(ts_sources, runtime_ts):
            win_samples.append(jax.ShapeDtypeStruct((), grid.nf))
            for name in ts["names"]:
                win_samples.append(
                    jax.ShapeDtypeStruct((ts["W"], block), grid.nf))
                arr = jnp.asarray(rt.series[name], grid.nf)
                if arr.ndim == 1:  # (T,) scalar series: broadcast over cells
                    arr = arr[:, None]
                arr = jnp.broadcast_to(arr, (ts["T"], cells))
                series_padded.append(_pad(arr))
        with force_concat_shifts():
            converted, extra_consts = closure_convert_all(step_fn, sample,
                                                          *coord_samples,
                                                          *win_samples)
        consts = list(coord_arrays) + list(extra_consts)
        consts2d = [_to2d(c) for c in consts]

        # live-leaf analysis (as in utils/scan_dce.lean_rollout): carry only
        # what one step of the flattened body consumes
        def flat_step(lv, *cv):
            st = jax.tree_util.tree_unflatten(treedef, lv)
            out = step_fn(st, *cv)
            return jax.tree_util.tree_leaves(out)

        from jax.interpreters import partial_eval as pe

        with force_concat_shifts():
            closed = jax.make_jaxpr(flat_step)(samples, *coord_samples,
                                               *win_samples)
        _, used = pe.dce_jaxpr(closed.jaxpr, [True] * len(closed.jaxpr.outvars))
        used_leaves = list(used)[:len(leaves)]
        live = [i for i, u in enumerate(used_leaves) if u]

        arrays = [_pad(_to2d(leaves[i])) for i in live]
        n_live = len(arrays)

        def spec_for(a, cell_blocked):
            if cell_blocked and a.shape != (1, 1):
                return pl.BlockSpec((a.shape[0], block), lambda i: (0, i))
            return pl.BlockSpec(a.shape, lambda i: (0, 0))

        cell_blocked = [ndims[i] >= 1 for i in live]

        def win_spec(s):
            if s.shape == ():
                return pl.BlockSpec((1, 1), lambda i: (0, 0))
            return pl.BlockSpec((s.shape[0], block), lambda i: (0, i))

        in_specs = ([spec_for(a, cb) for a, cb in zip(arrays, cell_blocked)]
                    + [spec_for(c, False) for c in consts2d]
                    + [win_spec(s) for s in win_samples])
        out_specs = [spec_for(a, cb) for a, cb in zip(arrays, cell_blocked)]
        out_shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrays]
        n_coord = len(coord_arrays)

        def kernel(*refs):
            ins = refs[:n_live]
            const_refs = refs[n_live:n_live + len(consts2d)]
            win_refs = refs[n_live + len(consts2d):
                            n_live + len(consts2d) + len(win_samples)]
            outs = refs[n_live + len(consts2d) + len(win_samples):]

            def read(ref, nd, state_leaf=False):
                val = ref[...]
                if nd == 0:
                    return jnp.reshape(val, ())
                if nd == 1 and not (xy_rank2 and state_leaf):
                    return jnp.squeeze(val, axis=0)
                return val

            const_vals = [read(cr, jnp.ndim(c))
                          for cr, c in zip(const_refs, consts)]
            win_vals = [read(wr, len(s.shape))
                        for wr, s in zip(win_refs, win_samples)]
            carry0 = [read(ins[k], ndims[live[k]], state_leaf=True)
                      for k in range(n_live)]

            def rebuild(carry):
                vals = {i: v for i, v in zip(live, carry)}
                out = []
                for i, s in enumerate(samples):
                    if i in vals:
                        out.append(vals[i])
                    else:
                        out.append(jnp.zeros(s.shape, s.dtype))
                return out

            def body(_, carry):
                st = jax.tree_util.tree_unflatten(treedef, rebuild(carry))
                # closure_convert appends its hoisted consts after the
                # explicit args: (state, coords..., wins..., extras...)
                out_st = converted(st, *const_vals[:n_coord], *win_vals,
                                   *const_vals[n_coord:])
                out_leaves = jax.tree_util.tree_leaves(out_st)
                return [out_leaves[i] for i in live]

            # `unroll` exposes cross-step code motion to Mosaic (and cuts
            # loop overhead); watch the backend's compile-time limit on long
            # in-kernel loop bodies when raising it (inner=720 at unroll 1
            # already exceeded it)
            carry = jax.lax.fori_loop(0, inner_steps, body, carry0,
                                      unroll=unroll)
            for k in range(n_live):
                outs[k][...] = jnp.reshape(carry[k], outs[k].shape)

        fused_block = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
            **({} if interpret else _parallel_grid_params()),
        )

        n_outer = n // inner_steps
        t_init = state.clock.time  # traced initial time for window selection

        def window_ops(j):
            """Forcing-window operands for outer iteration ``j``: per ts
            source a (1,1) window start time + XLA-sliced (W, padded) series
            rows covering [t_base, t_base + inner*dt]."""
            ops = []
            si = iter(series_padded)
            t_base = t_init + (j * inner_steps) * dt
            for ts, t0 in zip(ts_sources, rt_t0s):
                i0f = jnp.floor((t_base - t0) / ts["dts"])
                i0 = jnp.clip(i0f.astype(jnp.int32), 0, ts["T"] - ts["W"])
                t_win0 = (jnp.asarray(t0, grid.nf)
                          + i0.astype(grid.nf) * jnp.asarray(ts["dts"], grid.nf))
                ops.append(jnp.reshape(t_win0, (1, 1)))
                for _ in ts["names"]:
                    ops.append(jax.lax.dynamic_slice_in_dim(
                        next(si), i0, ts["W"], axis=0))
            return ops

        if n_outer > 1:
            def outer_body(arrs, j):
                return list(fused_block(*arrs, *consts2d,
                                        *window_ops(j))), None

            arrays, _ = jax.lax.scan(outer_body, arrays,
                                     jnp.arange(n_outer, dtype=jnp.int32))
        else:
            arrays = list(fused_block(*arrays, *consts2d, *window_ops(0)))

        # rebuild full state: live leaves from the kernel, dead leaves zero
        new_leaves = []
        it = iter(arrays)
        for i, leaf in enumerate(leaves):
            if used_leaves[i]:
                arr = next(it)
                if ndims[i] == 0:
                    new_leaves.append(arr[0, 0])
                elif ndims[i] == 1:
                    new_leaves.append(arr[0, :cells])
                else:
                    new_leaves.append(arr[:, :cells])
            else:
                new_leaves.append(jnp.zeros_like(leaf))
        state = jax.tree_util.tree_unflatten(treedef, new_leaves)
        if not apply_closure:
            # raw ``pre_closure_step^n`` output (dead leaves zero): the
            # segment form used by the fused-gradient rollout
            # (`timesteppers/fused_grad.py`), which chains segments and
            # applies the closure once at the end
            return state
        # closure ∘ pre_closure_step^n == step^n on the prognostics
        return model.closure(state, ctx)

    return rollout
