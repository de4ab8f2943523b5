"""Timestepper tests with mock models.

Mirrors reference `test/timestepping/heun.jl` (ExpModel Euler vs Heun
closed-form values + clipping hook) and `test/timestepping/explicit_step.jl`
(explicit step over namespaces).
"""
import dataclasses

import jax.numpy as jnp
import numpy as np

import terrarium_tpu as tt
from terrarium_tpu.state import build_state
from terrarium_tpu.timesteppers.stepping import explicit_step
from terrarium_tpu.variables import Variables, namespace


@dataclasses.dataclass(frozen=True)
class ExpModel:
    """du/dt = u + v with constant v = 0.1 (reference `heun.jl:6-24`)."""

    grid: object
    clip: bool = False
    initializer: object = tt.DefaultInitializer()

    def variables(self):
        return (tt.prognostic("u", tt.XY()), tt.auxiliary("v", tt.XY()))

    def collated_variables(self):
        return Variables.of(self)

    def make_context(self, bcs=None):
        from terrarium_tpu.processes.base import Context

        return Context(bcs=bcs)

    def initialize(self, state, ctx):
        return self.initializer.initialize(state, self)

    def compute_auxiliary(self, state, ctx):
        return state.update(v=jnp.full_like(state.v, 0.1))

    def compute_tendencies(self, state, ctx):
        return state.add_tendencies(u=state.u + state.v)

    def closure(self, state, ctx):
        return state

    def invclosure(self, state, ctx):
        return state

    def timestep(self, state, ctx, dt):
        # clipping hook (reference `heun.jl:52-67`)
        if self.clip:
            return state.update(u=jnp.maximum(state.u, 0.0))
        return state


def test_euler_heun_closed_form():
    """Reference `heun.jl:26-49`."""
    grid = tt.ColumnGrid.of(cells=1, spacing=tt.UniformSpacing(N=1), nf=np.float64)
    inits = {"u": 0.0, "v": 0.1}
    sim_e = tt.initialize(ExpModel(grid), tt.ForwardEuler(), initializers=inits)
    sim_h = tt.initialize(ExpModel(grid), tt.Heun(), initializers=inits)
    dt = 300.0
    sim_e.timestep(dt, finalize=False)
    sim_h.timestep(dt, finalize=False)
    u_e = float(sim_e.state.u[0])
    u_h = float(sim_h.state.u[0])
    # Euler: u = 0.1*dt; Heun: (0.1*dt + (0.1*dt + 0.1)*dt)/2
    assert u_h > u_e
    np.testing.assert_allclose(u_e, 0.1 * dt, rtol=1e-14)
    np.testing.assert_allclose(u_h, (0.1 * dt + (0.1 * dt + 0.1) * dt) / 2,
                               rtol=1e-14)


def test_timestep_clipping_hook():
    """Reference `heun.jl:52-67`."""
    grid = tt.ColumnGrid.of(cells=1, spacing=tt.UniformSpacing(N=1), nf=np.float64)
    sim = tt.initialize(ExpModel(grid, clip=True), tt.ForwardEuler(),
                        initializers={"u": -20.0, "v": -5.0})
    sim.timestep(300.0, finalize=False)
    assert float(sim.state.u[0]) >= 0.0


def test_explicit_step_with_namespaces():
    """Reference `explicit_step.jl:12-54`: the explicit update recurses into
    namespaces; auxiliaries untouched."""
    grid = tt.ColumnGrid.of(cells=2, spacing=tt.ExponentialSpacing(N=10),
                            nf=np.float64)
    inner = Variables([tt.prognostic("x", tt.XYZ())])
    v = Variables([
        tt.prognostic("x", tt.XYZ()),
        tt.prognostic("y", tt.XYZ()),
        tt.auxiliary("z", tt.XYZ()),
        namespace("inner", inner),
    ])
    state = build_state(v, grid)
    dt = 10.0
    state = state.add_tendencies(x=jnp.full_like(state.x, 0.1),
                                 y=jnp.full_like(state.y, 0.2))
    state = state.replace_namespace(
        "inner", state.namespaces["inner"].add_tendencies(
            x=jnp.full_like(state.namespaces["inner"].x, 0.2)))
    out = explicit_step(state, grid, None, dt)
    np.testing.assert_allclose(out.x, dt * 0.1)
    np.testing.assert_allclose(out.y, dt * 0.2)
    np.testing.assert_allclose(out.namespaces["inner"].x, dt * 0.2)
    np.testing.assert_allclose(out.z, 0.0)


def test_heun_second_order_accuracy():
    """Order-of-accuracy sweep on du/dt = u + 0.1 with exact solution
    u(t) = 0.1 (e^t - 1): halving dt reduces Euler error ~2x, Heun ~4x."""
    grid = tt.ColumnGrid.of(cells=1, spacing=tt.UniformSpacing(N=1), nf=np.float64)
    t_end = 1.0

    def err(stepper, n):
        sim = tt.initialize(ExpModel(grid), stepper,
                            initializers={"u": 0.0, "v": 0.1})
        sim.run(steps=n, dt=t_end / n)
        exact = 0.1 * (np.exp(t_end) - 1.0)
        return abs(float(sim.state.u[0]) - exact)

    e1, e2 = err(tt.ForwardEuler(), 16), err(tt.ForwardEuler(), 32)
    h1, h2 = err(tt.Heun(), 16), err(tt.Heun(), 32)
    assert 1.7 < e1 / e2 < 2.3  # first order
    assert 3.5 < h1 / h2 < 4.5  # second order
