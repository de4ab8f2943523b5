"""Pallas fused-step equivalence (interpret mode).

The fused whole-step kernel (`ops/fused_step.py`) re-traces the SAME pure
step the XLA path uses, so the two must agree to float tolerance. Mosaic
compilation of the kernel hangs the experimental backend's compiler
(CLAUDE.md), so CI validates the kernel in Pallas interpret mode on CPU;
the XLA path remains the production default.
"""
import numpy as np

import terrarium_tpu as tt
from terrarium_tpu.ops.fused_step import make_fused_step


def _sim(cells=96, nz=12):
    grid = tt.ColumnGrid.of(cells=cells, spacing=tt.ExponentialSpacing(N=nz),
                            nf=np.float32)
    props = tt.ConstantSoilHydraulics(
        swrc=tt.VanGenuchten(alpha=2.0, n=2.0),
        unsat_hydraulic_cond=tt.UnsatKVanGenuchten())
    soil = tt.SoilEnergyWaterCarbon(
        hydrology=tt.SoilHydrology(vertical_flow=tt.RichardsEq(),
                                   hydraulic_properties=props))
    model = tt.SoilModel(grid=grid, soil=soil)
    return tt.initialize(
        model, tt.ForwardEuler(dt=60.0),
        initializers={"temperature": lambda x, z: 1.0 + 0.0 * z,
                      "saturation_water_ice":
                          lambda x, z: np.minimum(1.0, 0.5 - 0.05 * z)},
        boundary_conditions=tt.PrescribedSurfaceTemperature(5.0))


def test_fused_step_matches_xla_step():
    sim = _sim()
    fused = make_fused_step(sim.model, sim.timestepper, sim.ctx,
                            sim.input_sources, dt=60.0, block_cells=64,
                            interpret=True)
    state_f = sim.state
    state_x = sim.state
    for _ in range(3):
        state_f = fused(state_f)
        state_x = sim.step_fn(state_x, 60.0)
    for group in ("prognostic", "auxiliary"):
        for name, a in getattr(state_x, group).items():
            b = getattr(state_f, group)[name]
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-6, atol=1e-6,
                err_msg=f"{group}/{name}")
    assert float(state_f.clock.time) == float(state_x.clock.time)


def test_fused_lean_rollout_matches_lean_rollout():
    """`make_fused_lean_rollout` (VMEM-resident multi-step kernel, lean
    carry) must reproduce the XLA lean rollout bit-for-bit in interpret
    mode: same concat-shift trace, same arithmetic, same closure rotation
    (closure o pre_closure_step^n == step^n on the prognostics)."""
    import jax

    from terrarium_tpu.ops.fused_step import make_fused_lean_rollout

    sim = _sim(cells=96, nz=12)
    n = 12
    s_ref = sim._rollout_fn(n)(sim.state, 60.0)

    fused = make_fused_lean_rollout(sim.model, sim.timestepper, sim.ctx,
                                    sim.input_sources, dt=60.0,
                                    inner_steps=4, block_cells=64,
                                    interpret=True)
    s_fus = jax.jit(lambda s: fused(s, n))(sim.state)

    for name in ("internal_energy", "saturation_water_ice",
                 "surface_excess_water"):
        np.testing.assert_array_equal(
            np.asarray(s_fus.prognostic[name]),
            np.asarray(s_ref.prognostic[name]), err_msg=name)
    # closure variables from the trailing closure
    for name in ("temperature", "pressure_head", "liquid_water_fraction"):
        np.testing.assert_array_equal(np.asarray(s_fus[name]),
                                      np.asarray(s_ref[name]), err_msg=name)
    assert float(s_fus.clock.time) == float(s_ref.clock.time)
    assert int(s_fus.clock.iteration) == int(s_ref.clock.iteration)
