"""Differentiable stepping / rollout helpers.

TPU-native replacement for the reference's Enzyme + Checkpointing.jl AD path
(`ext/TerrariumCheckpointingExt`, `examples/autodiff/differentiating_terrarium.jl`):
pure step functions differentiate with `jax.grad`; long rollouts wrap the
scanned step in `jax.checkpoint` (rematerialisation) so reverse-mode memory
stays O(sqrt(N)) instead of O(N) — the functional analogue of Revolve
checkpointing schemes.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax

__all__ = ["make_step_fn", "make_rollout_fn"]


def make_step_fn(model, timestepper, ctx, input_sources=()) -> Callable:
    """A pure ``step(state, dt) -> state`` closure over static config."""

    def step(state, dt):
        return timestepper.step(model, state, ctx, input_sources, dt)

    return step


def make_rollout_fn(model, timestepper, ctx, input_sources=(), *,
                    steps: int, remat: bool = False) -> Callable:
    """A pure ``rollout(state, dt) -> state`` over ``steps`` steps.

    With ``remat=True`` each scanned step is wrapped in `jax.checkpoint`, so
    reverse-mode differentiation stores only per-step inputs and recomputes
    intermediates (replacing the reference's `@ad_checkpoint` Revolve
    wrapping, `TerrariumCheckpointingExt.jl:16-31`).
    """
    step = make_step_fn(model, timestepper, ctx, input_sources)
    if remat:
        step = jax.checkpoint(step)

    def rollout(state, dt):
        def body(s, _):
            return step(s, dt), None

        out, _ = jax.lax.scan(body, state, None, length=steps)
        return out

    return rollout
