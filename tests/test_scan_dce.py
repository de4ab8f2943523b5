"""Regression tests for the lean (DCE'd, closure-rotated) scan rollouts.

These lock in the performance-critical invariants of
`utils/scan_dce.lean_rollout` + the `pre_closure_step` rotation: rollouts
must match sequential stepping on all prognostic and closure variables, and
the final state must carry *fresh* tendencies and transient auxiliaries
(the final step runs outside the scan).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import terrarium_tpu as tt
from terrarium_tpu.utils.scan_dce import _dead_input_mask, lean_rollout


def _soil_sim(ts):
    grid = tt.ColumnGrid.of(cells=5, spacing=tt.ExponentialSpacing(N=10),
                            nf=np.float64)
    props = tt.ConstantSoilHydraulics(
        swrc=tt.VanGenuchten(alpha=2.0, n=2.0),
        unsat_hydraulic_cond=tt.UnsatKVanGenuchten())
    soil = tt.SoilEnergyWaterCarbon(hydrology=tt.SoilHydrology(
        vertical_flow=tt.RichardsEq(), hydraulic_properties=props))
    model = tt.SoilModel(grid=grid, soil=soil)
    return tt.initialize(
        model, ts,
        initializers={"temperature": 1.0,
                      "saturation_water_ice": lambda x, z: np.minimum(1.0, 0.9 - 0.02 * z)},
        boundary_conditions=tt.PrescribedSurfaceTemperature(
            lambda t: 5.0 * jnp.sin(2 * jnp.pi * t / 86400.0)))


def test_lean_rollout_generic_pytree():
    """lean_rollout == sequential application for a step with dead leaves."""

    @jax.tree_util.register_dataclass
    @dataclasses.dataclass(frozen=True)
    class S:
        x: jnp.ndarray
        scratch: jnp.ndarray  # overwritten before read -> dead in the carry

    def step(s, dt):
        scratch = s.x * dt  # recomputed from live input only
        return S(x=s.x + scratch, scratch=scratch)

    s0 = S(x=jnp.arange(4.0), scratch=jnp.full(4, 7.0))
    used = _dead_input_mask(
        lambda lv, d: jax.tree.leaves(step(jax.tree.unflatten(
            jax.tree.structure(s0), lv), d)), jax.tree.leaves(s0), 0.5)
    assert used[:2] == [True, False]  # x live, scratch dead

    out = lean_rollout(step, s0, 0.5, 5)
    ref = s0
    for _ in range(5):
        ref = step(ref, 0.5)
    np.testing.assert_array_equal(np.asarray(out.x), np.asarray(ref.x))
    np.testing.assert_array_equal(np.asarray(out.scratch), np.asarray(ref.scratch))


@pytest.mark.slow
def test_rollout_matches_sequential_soil():
    for ts in (tt.ForwardEuler(dt=60.0), tt.Heun(dt=60.0),
               tt.ImplicitEuler(dt=60.0)):
        simA, simB = _soil_sim(ts), _soil_sim(ts)
        simA.run(steps=12, dt=60.0)
        for _ in range(12):
            simB.timestep(60.0, finalize=False)
        simB.compute_auxiliary()  # run() finalizes (reference run! tail)
        for group in ("prognostic", "auxiliary", "tendencies"):
            for name, a in getattr(simA.state, group).items():
                b = getattr(simB.state, group)[name]
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-12,
                    err_msg=f"{type(ts).__name__}:{group}.{name}")
        assert simA.iteration == simB.iteration == 12
        assert simA.current_time == simB.current_time


def test_rollout_final_state_has_fresh_scratch():
    """Post-run tendencies/transient aux come from a real final step, not the
    zero placeholders used inside the scan."""
    sim = _soil_sim(tt.ForwardEuler(dt=60.0))
    sim.run(steps=8, dt=60.0)
    # tendencies reflect the last step's physics (non-zero under forcing)
    assert float(np.max(np.abs(np.asarray(
        sim.state.tendencies["internal_energy"])))) > 0.0
    # transient aux (face K) recomputed, strictly positive
    assert float(np.min(np.asarray(sim.state.hydraulic_conductivity))) > 0.0


def test_rollout_single_step():
    simA, simB = (_soil_sim(tt.ForwardEuler(dt=60.0)) for _ in range(2))
    simA.run(steps=1, dt=60.0)
    simB.timestep(60.0, finalize=False)
    np.testing.assert_allclose(
        np.asarray(simA.state.internal_energy),
        np.asarray(simB.state.internal_energy), rtol=1e-15)
