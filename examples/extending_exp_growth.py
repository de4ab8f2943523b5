"""Getting started: a simple exponential-growth model with external forcing.

Port of the reference tutorial `examples/extending/linear_ode_exp_growth.jl`:
the smallest possible custom model — one XY prognostic with linear dynamics

    du/dt = alpha * u + c + F(t)

where the constant offset ``c`` is (artificially) an auxiliary variable and
``F(t)`` is a time-series input. Demonstrates the model interface end to end:
variable declaration, auxiliary/tendency computation, time-series input
sources, single `timestep`, `Heun` integration, time-series output, and a
closed-form accuracy check (the reference tutorial stops at plotting).

Run: python examples/extending_exp_growth.py
"""
import dataclasses

import jax.numpy as jnp
import numpy as np

import terrarium_tpu as tt
from terrarium_tpu.processes.base import Context
from terrarium_tpu.variables import Variables, variables_of


@dataclasses.dataclass(frozen=True)
class LinearDynamics:
    """du/dt = alpha*u + c + F (reference `linear_ode_exp_growth.jl:51-56`)."""

    alpha: float = 0.01
    c: float = 0.1

    def variables(self):
        return (
            tt.prognostic("u", tt.XY(), desc="Exponential growth variable"),
            tt.auxiliary("c", tt.XY(), desc="Constant offset for growth"),
            tt.input("F", tt.XY(), default=0.0, desc="External forcing"),
        )

    def compute_auxiliary(self, state, grid, ctx):
        # reference `compute_auxiliary!` (`linear_ode_exp_growth.jl:105-107`)
        return state.update(c=jnp.full_like(state.c, self.c))

    def compute_tendencies(self, state, grid, ctx):
        # reference `compute_tendencies!` (`linear_ode_exp_growth.jl:109-118`)
        return state.add_tendencies(u=self.alpha * state.u + state.c + state.F)


@dataclasses.dataclass(frozen=True)
class ExpModel:
    grid: object
    dynamics: LinearDynamics = LinearDynamics()
    initializer: object = tt.DefaultInitializer()

    def variables(self):
        return variables_of(self.dynamics)

    def collated_variables(self):
        return Variables.of(self)

    def make_context(self, bcs=None):
        return Context(bcs=bcs)

    def initialize(self, state, ctx):
        return self.initializer.initialize(state, self)

    def compute_auxiliary(self, state, ctx):
        return self.dynamics.compute_auxiliary(state, self.grid, ctx)

    def compute_tendencies(self, state, ctx):
        return self.dynamics.compute_tendencies(state, self.grid, ctx)

    def closure(self, state, ctx):
        return state

    def invclosure(self, state, ctx):
        return state

    def timestep(self, state, ctx, dt):
        return state


def main():
    # one column, one layer: a scalar ODE (reference line 44)
    grid = tt.ColumnGrid.of(cells=1, spacing=tt.UniformSpacing(dz=1.0, N=1),
                            nf=np.float32)
    model = ExpModel(grid=grid)

    # random time-dependent forcing as a time series (reference lines 131-139)
    rng = np.random.default_rng(1234)
    t_F = np.arange(0.0, 301.0, 1.0)
    F = rng.standard_normal((t_F.size, 1))
    forcing = tt.TimeSeriesInputSource(times=t_F, series={"F": F})

    sim = tt.initialize(model, tt.Heun(dt=1.0), initializers={"u": 1.0},
                        input_sources=(forcing,))

    # single step (reference `timestep!`, line 156)
    sim.timestep()
    print(f"u after one step: {float(sim.state.u[0]):.6f}")

    # full run with a time-series writer (reference Simulation + JLD2Writer)
    sim.reinitialize()
    writer = tt.FieldTimeSeriesWriter("exp_growth_out.h5", ["u"],
                                      schedule=tt.TimeInterval(10.0))
    sim.run(period=300.0, dt=1.0, callbacks=[writer],
            callback_interval=writer.schedule.steps_hint(1.0))
    u_final = float(sim.state.u[0])

    # accuracy check vs the exact solution of the same Heun discretization:
    # Heun on du/dt = a*u + c + F(t) with piecewise-linear F is 2nd order;
    # compare against a fine-dt reference integration instead of eye-balling
    # a plot like the reference tutorial does.
    a, c = model.dynamics.alpha, model.dynamics.c
    u = 1.0
    dt = 0.01
    for i in range(int(300.0 / dt)):
        t = i * dt
        Fi = np.interp(t, t_F, F[:, 0])
        Fm = np.interp(t + dt, t_F, F[:, 0])
        k1 = a * u + c + Fi
        k2 = a * (u + dt * k1) + c + Fm
        u = u + dt * 0.5 * (k1 + k2)
    rel = abs(u_final - u) / abs(u)
    print(f"u(300s): heun dt=1 -> {u_final:.4f}, fine-dt reference {u:.4f} "
          f"(rel err {rel:.2e})")
    assert rel < 5e-3, rel


if __name__ == "__main__":
    main()
