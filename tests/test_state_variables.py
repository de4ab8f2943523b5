"""Variable collation + state container tests.

Mirrors reference `test/state_variables.jl` (TestModel/SubModel/TestClosure
validate collation, namespaces, tendency auto-creation).
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import terrarium_tpu as tt
from terrarium_tpu.state import build_state, reset_tendencies
from terrarium_tpu.variables import Variables, namespace, variables_of


@dataclasses.dataclass(frozen=True)
class DummyClosure:
    def variables(self):
        return (tt.auxiliary("closure_var", tt.XYZ()),)


@dataclasses.dataclass(frozen=True)
class SubProcess:
    def variables(self):
        return (
            tt.auxiliary("aux_sub", tt.XY()),
            tt.input("forcing_a", tt.XY(), default=2.0),
        )


@dataclasses.dataclass(frozen=True)
class TestProcess:
    def variables(self):
        return (
            tt.prognostic("progvar", tt.XYZ(), closure=DummyClosure()),
            tt.auxiliary("auxvar", tt.XYZ()),
            tt.input("forcing_a", tt.XY(), default=2.0),
            tt.input("auxvar", tt.XYZ()),  # shadowed by the auxiliary
        )


def make_grid(cells=3, nz=5):
    return tt.ColumnGrid.of(cells=cells, spacing=tt.UniformSpacing(dz=0.1, N=nz),
                            nf=np.float64)


def test_collation_groups_and_dedup():
    v = Variables.of(TestProcess(), SubProcess())
    assert list(v.prognostic) == ["progvar"]
    # closure vars prepended to auxiliaries
    assert list(v.auxiliary) == ["closure_var", "auxvar", "aux_sub"]
    # input shadowed by auxiliary is dropped; duplicate input deduplicated
    assert list(v.inputs) == ["forcing_a"]
    # tendency auto-created for prognostic
    assert list(v.tendencies) == ["progvar"]


def test_namespaces():
    v = Variables.of(TestProcess(), namespace("sub", SubProcess()))
    assert "sub" in v.namespaces
    assert list(v.namespaces["sub"].auxiliary) == ["aux_sub"]
    grid = make_grid()
    state = build_state(v, grid)
    assert state.sub.aux_sub.shape == (3,)


def test_build_state_shapes_and_defaults():
    grid = make_grid(cells=3, nz=5)
    v = Variables.of(TestProcess(), SubProcess())
    state = build_state(v, grid)
    assert state.progvar.shape == (5, 3)
    assert state.aux_sub.shape == (3,)
    assert state.tendencies["progvar"].shape == (5, 3)
    np.testing.assert_allclose(state.forcing_a, 2.0)


def test_state_update_routing_and_tendency_accumulation():
    grid = make_grid()
    state = build_state(Variables.of(TestProcess()), grid)
    state2 = state.update(auxvar=state.auxvar + 1.0)
    np.testing.assert_allclose(state2.auxvar, 1.0)
    # += accumulation semantics
    state3 = state2.add_tendencies(progvar=jnp.ones_like(state.progvar))
    state3 = state3.add_tendencies(progvar=jnp.ones_like(state.progvar))
    np.testing.assert_allclose(state3.tendencies["progvar"], 2.0)
    state4 = reset_tendencies(state3)
    np.testing.assert_allclose(state4.tendencies["progvar"], 0.0)
    with pytest.raises(KeyError):
        state.update(nonexistent=1.0)


def test_duplicate_cross_group_raises():
    with pytest.raises(ValueError):
        Variables.of((tt.prognostic("x", tt.XYZ()), tt.auxiliary("x", tt.XYZ())))


def test_state_is_pytree():
    import jax

    grid = make_grid()
    state = build_state(Variables.of(TestProcess()), grid)
    leaves = jax.tree_util.tree_leaves(state)
    assert len(leaves) > 0
    mapped = jax.tree_util.tree_map(lambda x: x + 1, state)
    np.testing.assert_allclose(mapped.auxvar, 1.0)
