"""Extending the framework: a custom linear heat-conduction process.

Port of the reference tutorial `examples/extending/linear_heat_conduction.jl`:
define a new process + model from scratch — declare variables, accumulate
tendencies with `+=` semantics, run it with the shipped timesteppers. Shows
the implementation pattern: pure per-column physics -> vectorised array ops
-> jitted step (the JAX analogue of the reference's interface/kernel/
kernel-function stack).
"""
import dataclasses

import jax.numpy as jnp
import numpy as np

import terrarium_tpu as tt
from terrarium_tpu.ops.bcs import get_bc
from terrarium_tpu.ops.vertical_ops import div_faces, ghosts, grad_faces
from terrarium_tpu.processes.base import Context
from terrarium_tpu.variables import Variables, variables_of


@dataclasses.dataclass(frozen=True)
class LinearHeatConduction:
    """dT/dt = alpha * d2T/dz2 — the simplest vertical diffusion process."""

    alpha: float = 1.0e-6  # thermal diffusivity [m^2/s]

    def variables(self):
        # prognostic temperature; the tendency slot is auto-created
        return (tt.prognostic("T", tt.XYZ(), units="degC"),)

    def compute_auxiliary(self, state, grid, ctx):
        return state

    def compute_tendencies(self, state, grid, ctx):
        T = state.T
        g_bot, g_top = ghosts(T, get_bc(ctx.bcs, "T", "bottom"),
                              get_bc(ctx.bcs, "T", "top"), state, grid.dz_faces)
        q = -self.alpha * grad_faces(T, grid.dz_faces, g_bot, g_top)
        # += accumulation: other processes could also feed dT/dt
        return state.add_tendencies(T=-div_faces(q, grid.dz))


@dataclasses.dataclass(frozen=True)
class LinearHeatModel:
    grid: object
    process: LinearHeatConduction = LinearHeatConduction()
    initializer: object = tt.DefaultInitializer()

    def variables(self):
        return variables_of(self.process)

    def collated_variables(self):
        return Variables.of(self)

    def make_context(self, bcs=None):
        return Context(bcs=bcs)

    def initialize(self, state, ctx):
        return self.initializer.initialize(state, self)

    def compute_auxiliary(self, state, ctx):
        return self.process.compute_auxiliary(state, self.grid, ctx)

    def compute_tendencies(self, state, ctx):
        return self.process.compute_tendencies(state, self.grid, ctx)

    def closure(self, state, ctx):
        return state

    def invclosure(self, state, ctx):
        return state

    def timestep(self, state, ctx, dt):
        return state


grid = tt.ColumnGrid.of(cells=4, spacing=tt.UniformSpacing(dz=0.02, N=50),
                        nf=np.float64)
model = LinearHeatModel(grid=grid)
sim = tt.initialize(
    model, tt.Heun(),
    initializers={"T": 0.0},
    boundary_conditions={"T": {"top": tt.Dirichlet(1.0)}},
)
sim.run(period=6 * 3600.0, dt=10.0)
T = np.asarray(sim.state.T[:, 0])
print("T(top 5 cells):", np.round(T[-5:], 4))
print("monotone decay into the column:", bool(np.all(np.diff(T) >= -1e-12)))
