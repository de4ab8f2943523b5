"""Segment-checkpointed gradients THROUGH the fused Pallas rollout.

BASELINE config #5 (the differentiable N145 run, reference
`examples/autodiff/differentiating_terrarium.jl:41`) previously ran its
forward pass as a pure-XLA remat scan — ~2.5x slower than the fused Pallas
lean rollout that the non-differentiated benchmarks use (`ops/fused_step`).
Pallas kernels with in-kernel `fori_loop`s have no reverse-mode rule, so the
fused kernel could not sit under `jax.grad` directly.

This module closes that gap with a `jax.custom_vjp` segment scheme:

* **forward**: the rollout is a `lax.scan` over ``steps / inner_steps``
  segments; each segment runs the fused Pallas lean kernel
  (``pre_closure_step^inner`` in VMEM, one HBM round-trip per block). The
  scan's transpose machinery stores each segment's *input* state — exactly
  the kernel's natural HBM write points, so segment checkpointing is free.
* **backward**: per segment (in reverse), recompute the segment with the XLA
  lean scan (`utils/scan_dce.lean_chain` — semantically identical to the
  kernel: ``pre_closure_step^inner`` with dead leaves zeroed) under
  `jax.vjp`, storing per-step residuals only within the segment, then run
  the transpose. ``bwd_chunk`` optionally splits the within-segment scan
  into `jax.checkpoint` chunks (memory O(chunk + inner/chunk) per segment)
  when ``inner_steps`` residual-storing is too large to compile/fit.

Differentiated quantities: the initial state AND a ``params`` pytree mapped
to a model by ``model_fn`` (e.g. hydraulic/thermal coefficients). Inside the
custom_vjp primal the params flow into the kernel through
`jax.closure_convert` (traced values become kernel operands), so the primal
VALUES are exact; the cotangents come from the XLA segment vjp, whose primal
is the same function.

Gradient equivalence vs the plain XLA remat rollout is locked at tight rtol
in tests/test_fused_grad.py (CPU interpret mode), plus the existing
finite-difference cross-check in bench_configs config #6.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax

from ..ops.fused_step import make_fused_lean_rollout
from ..utils.scan_dce import lean_chain

__all__ = ["make_fused_grad_rollout"]


def make_fused_grad_rollout(model_fn: Callable, timestepper, ctx,
                            input_sources=(), *, steps: int, dt: float,
                            inner_steps: int, block_cells: int = 512,
                            xy_rank2: bool = False,
                            bwd: str = "xla",
                            bwd_chunk: Optional[int] = None,
                            bwd_remat: bool = False,
                            unroll_outer: bool = False,
                            interpret: Optional[bool] = None) -> Callable:
    """Build ``rollout(state, params) -> state`` differentiable in both
    arguments, with the forward pass on the fused Pallas kernel.

    Args:
        model_fn: ``params -> model``; called inside the traced region, so
            ``params`` leaves may be traced arrays. Must produce a model
            whose step is fusable (static input sources; the uniform
            time-series sources of the fused kernel are NOT yet supported
            here).
        steps: total rollout length; must be a multiple of ``inner_steps``.
        inner_steps: fused-kernel steps per segment (the checkpoint
            interval).
        bwd: ``"xla"`` — per-segment XLA recompute + transpose (see
            ``bwd_chunk``/``bwd_remat``); ``"pallas"`` — the fused
            segment-VJP kernel (`ops/fused_vjp.make_segment_vjp`): forward
            checkpoints each step's lean carry to VMEM scratch, reverse
            sweep applies per-step vjps in-kernel. The production choice on
            chip (the XLA transpose is launch-bound exactly like the
            pre-fusion forward was).
        bwd_chunk: (bwd="xla") if set, within-segment backward recompute
            runs as a `lax.scan` of ``inner_steps / bwd_chunk`` checkpointed
            chunks of ``bwd_chunk`` steps (one extra within-chunk recompute,
            much smaller residual memory / HLO). ``None`` stores residuals
            for the whole segment.
        bwd_remat: per-step `jax.checkpoint` inside the segment (or inside
            each chunk) — minimal residual memory, one more recompute per
            step; composes with ``bwd_chunk``.
        interpret: force the Pallas interpreter (tests); default = interpret
            off exactly on TPU backends.
    """
    if steps % inner_steps != 0:
        raise ValueError(f"steps={steps} not a multiple of "
                         f"inner_steps={inner_steps}")
    if bwd_chunk is not None and inner_steps % bwd_chunk != 0:
        raise ValueError(f"inner_steps={inner_steps} not a multiple of "
                         f"bwd_chunk={bwd_chunk}")
    for src in input_sources:
        if hasattr(src, "times"):
            raise ValueError("make_fused_grad_rollout supports static input "
                             "sources only (window forcing operands are not "
                             "yet threaded through the custom_vjp)")
    n_outer = steps // inner_steps

    def xla_segment(state, params):
        """``pre_closure_step^inner`` with dead leaves zeroed — the XLA twin
        of the fused segment, used for the backward recompute."""
        model = model_fn(params)

        def step(st, d):
            return timestepper.pre_closure_step(model, st, ctx,
                                                input_sources, d)

        if bwd_chunk is not None:
            def chunk(st):
                return lean_chain(step, st, dt, bwd_chunk,
                                  wrap=jax.checkpoint if bwd_remat else None)

            chunk = jax.checkpoint(chunk)

            def body(st, _):
                return chunk(st), None

            state, _ = jax.lax.scan(body, state, None,
                                    length=inner_steps // bwd_chunk)
            return state
        return lean_chain(step, state, dt, inner_steps,
                          wrap=jax.checkpoint if bwd_remat else None)

    def fused_segment(st, p):
        model = model_fn(p)
        fused = make_fused_lean_rollout(
            model, timestepper, ctx, input_sources, dt=dt,
            inner_steps=inner_steps, block_cells=block_cells,
            xy_rank2=xy_rank2, interpret=interpret, apply_closure=False)
        return fused(st, inner_steps)

    if bwd == "pallas":
        from ..ops.fused_vjp import make_segment_vjp

        pallas_seg_vjp = make_segment_vjp(
            model_fn, timestepper, ctx, input_sources, dt=dt,
            inner_steps=inner_steps, block_cells=block_cells,
            xy_rank2=xy_rank2, interpret=interpret)
    elif bwd != "xla":
        raise ValueError(f"bwd must be 'xla' or 'pallas', got {bwd!r}")

    def rollout(state, params):
        seg = jax.custom_vjp(fused_segment)

        def seg_fwd(st, p):
            # residuals = the segment's input state: the checkpoint
            return fused_segment(st, p), (st, p)

        def seg_bwd(res, ct):
            st0, p = res
            if bwd == "pallas":
                return pallas_seg_vjp(st0, p, ct)
            _, vjp = jax.vjp(xla_segment, st0, p)
            return vjp(ct)

        seg.defvjp(seg_fwd, seg_bwd)

        if unroll_outer:
            # python loop over segments: no scan-transpose machinery (no
            # stacked-residual dynamic slicing) at the cost of HLO size
            # O(n_outer); worthwhile for small segment counts
            out = state
            for _ in range(n_outer):
                out = seg(out, params)
        else:
            def body(st, _):
                return seg(st, params), None

            out, _ = jax.lax.scan(body, state, None, length=n_outer)
        # trailing closure restores step^n equality on the prognostics and
        # the closure variables (temperature, pressure head, ...)
        return model_fn(params).closure(out, ctx)

    return rollout
