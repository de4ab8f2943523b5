"""Lateral halo-exchange extension (`parallel/halo.py`) — the SURVEY §2.11
north-star machinery: cell-axis neighbor coupling as a forcing, with the
boundary column exchanged across shards (auto collective-permute under
SPMD jit; explicit `lax.ppermute` inside shard_map)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import terrarium_tpu as tt
from terrarium_tpu.parallel.halo import (lateral_diffusion_forcing,
                                         neighbor_shift)
from terrarium_tpu.parallel.sharding import cell_mesh, shard_state

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _sim(cells, forcings=None):
    grid = tt.ColumnGrid.of(cells=cells, spacing=tt.ExponentialSpacing(N=8),
                            nf=np.float64)
    model = tt.SoilModel(grid=grid)
    return tt.initialize(
        model, tt.ForwardEuler(dt=300.0),
        initializers={"temperature":
                          lambda x, z: 5.0 * np.sin(4 * np.pi * x) + 0.0 * z,
                      "saturation_water_ice": 0.5},
        boundary_conditions=tt.PrescribedSurfaceTemperature(2.0),
        forcings=forcings)


def test_neighbor_shift_edges_and_values():
    x = jnp.asarray(np.arange(12.0).reshape(2, 6))
    left = np.asarray(neighbor_shift(x, 1))
    right = np.asarray(neighbor_shift(x, -1))
    np.testing.assert_array_equal(left[:, 1:], np.asarray(x)[:, :-1])
    np.testing.assert_array_equal(left[:, 0], np.asarray(x)[:, 0])  # edge
    np.testing.assert_array_equal(right[:, :-1], np.asarray(x)[:, 1:])
    np.testing.assert_array_equal(right[:, -1], np.asarray(x)[:, -1])


def test_lateral_diffusion_smooths_and_conserves():
    """The lateral operator relaxes cell-to-cell contrasts of ∫U dz while
    conserving the lateral sum (zero-flux ends)."""
    cells = 64
    forcing = lateral_diffusion_forcing(coeff=1.0e3, dx=1.0e3)
    sim = _sim(cells, forcings={"internal_energy": forcing})
    ref = _sim(cells)

    # the lateral operator telescopes to zero per layer (zero-flux ends):
    # it redistributes without creating or destroying the quantity
    lat = np.asarray(forcing(sim.state, sim.model.grid))
    scale = np.abs(lat).sum(axis=1)
    np.testing.assert_allclose(lat.sum(axis=1) / np.maximum(scale, 1e-30),
                               0.0, atol=1e-12)

    sim.run(steps=50, dt=300.0)
    ref.run(steps=50, dt=300.0)
    U1 = np.asarray(sim.state.prognostic["internal_energy"])
    Ur = np.asarray(ref.state.prognostic["internal_energy"])
    # lateral variance strictly decreases relative to the uncoupled run
    assert U1.std(axis=1).sum() < Ur.std(axis=1).sum()


def test_lateral_sharded_bit_identical_with_collective():
    """Under SPMD jit, the cells-sharded laterally-coupled step is
    bit-identical to single-device, and the compiled HLO now CONTAINS the
    designed boundary communication (collective-permute) — the one
    deliberate exception to the collective-free step."""
    cells = 64
    forcing = lateral_diffusion_forcing(coeff=1.0e3, dx=1.0e3)
    sim = _sim(cells, forcings={"internal_energy": forcing})

    model, ts, ctx, sources = (sim.model, sim.timestepper, sim.ctx,
                               sim.input_sources)

    def roll(state):
        for _ in range(6):
            state = ts.step(model, state, ctx, sources, 300.0)
        return state

    jroll = jax.jit(roll)
    out_single = jroll(sim.state)
    mesh = cell_mesh()
    state_sharded = shard_state(sim.state, mesh)
    out_sharded = jroll(state_sharded)
    np.testing.assert_array_equal(
        np.asarray(out_single.prognostic["internal_energy"]),
        np.asarray(out_sharded.prognostic["internal_energy"]))
    hlo = jroll.lower(state_sharded).compile().as_text()
    assert "collective-permute" in hlo, \
        "expected the lateral halo exchange to lower to collective-permute"


def test_halo_shift_inside_shard_map_matches_plain():
    """The explicit ppermute halo (`axis_name=...`) inside shard_map equals
    the plain edge-replicated shift."""
    cells = 64
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, cells)))
    mesh = cell_mesh()
    spec = jax.sharding.PartitionSpec(None, "cells")

    for shift in (1, -1):
        fn = jax.shard_map(
            lambda v, _s=shift: neighbor_shift(v, _s, axis_name="cells"),
            mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False)
        got = np.asarray(fn(jax.device_put(
            x, jax.sharding.NamedSharding(mesh, spec))))
        want = np.asarray(neighbor_shift(x, shift))
        np.testing.assert_array_equal(got, want, err_msg=f"shift={shift}")
