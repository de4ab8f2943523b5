"""Deficit-pool corrected saturation clamp (`SoilHydrology.deficit_pool`).

The reference clips a residual bottom deficit during the saturation
adjustment with an acknowledged mass-balance violation
(`soil_hydrology.jl:214-218`); round 4 quantified the creation at +2.2% of
water inventory/year on the N145 year protocol. The opt-in corrected mode
tracks the clipped deficit as a prognostic debt pool repaid from the
surface-excess pool. These tests prove, with the exact in-rollout budget
(`diagnostics/budget.ExactBudget`):

* parity mode CREATES water under clip-inducing extraction (residual > 0);
* corrected mode closes the water budget to float roundoff on the same
  forcing;
* the debt is repaid when water returns (deficit decreases, budget still
  closed, pools non-negative).
"""
import numpy as np

import terrarium_tpu as tt
from terrarium_tpu.diagnostics.budget import ExactBudget
from terrarium_tpu.ops.bcs import Flux


def _sim(deficit_pool, bc_value):
    # shallow column (0.5 m) so the extraction below actually exhausts it
    # and triggers the bottom clip within a few hundred steps
    grid = tt.ColumnGrid.of(cells=16,
                            spacing=tt.UniformSpacing(N=10, dz=0.05),
                            nf=np.float64)
    props = tt.ConstantSoilHydraulics(
        swrc=tt.VanGenuchten(alpha=2.0, n=2.0),
        unsat_hydraulic_cond=tt.UnsatKVanGenuchten())
    hyd = tt.SoilHydrology(vertical_flow=tt.RichardsEq(),
                           hydraulic_properties=props,
                           deficit_pool=deficit_pool)
    soil = tt.SoilEnergyWaterCarbon(hydrology=hyd)
    model = tt.SoilModel(grid=grid, soil=soil)
    bcs = tt.merge_boundary_conditions(
        tt.PrescribedSurfaceTemperature(8.0),
        {"saturation_water_ice": {"top": Flux(bc_value)}})
    return tt.initialize(
        model, tt.ForwardEuler(dt=600.0),
        initializers={"temperature": 4.0,
                      "saturation_water_ice": 0.04},
        boundary_conditions=bcs)


EXTRACT = 2.0e-6  # m/s upward water flux: dries the thin column to the clip


def test_parity_mode_creates_water_under_clip():
    sim = _sim(False, EXTRACT)
    eb = ExactBudget.start(sim)
    eb.run(sim, steps=288, dt=600.0)
    rep = eb.report(sim)["water"]
    # the clip manufactures water: inventory drops less than the extracted
    # amount, so the residual is positive and far above roundoff
    assert rep["residual"] > 1e-6, rep
    assert rep["inventory_relative_residual"] > 1e-3, rep


def test_corrected_mode_closes_water_budget():
    sim = _sim(True, EXTRACT)
    eb = ExactBudget.start(sim)
    eb.run(sim, steps=288, dt=600.0)
    rep = eb.report(sim)["water"]
    assert rep["inventory_relative_residual"] < 1e-12, rep
    deficit = np.asarray(sim.state.soil_water_deficit)
    assert np.all(deficit >= 0.0)
    assert deficit.max() > 1e-6  # the debt was actually incurred


def test_deficit_repaid_when_water_returns():
    import jax.numpy as jnp

    # extraction for 2 days, then strong re-wetting (downward flux)
    bc = lambda t: jnp.where(t < 2 * 86400.0, EXTRACT, -5.0e-5)
    sim = _sim(True, bc)
    eb = ExactBudget.start(sim)
    eb.run(sim, steps=288, dt=600.0)  # dry phase
    d_dry = float(np.max(np.asarray(sim.state.soil_water_deficit)))
    assert d_dry > 1e-6
    eb.run(sim, steps=288, dt=600.0)  # re-wet phase
    rep = eb.report(sim)["water"]
    d_wet = np.asarray(sim.state.soil_water_deficit)
    assert float(d_wet.max()) < d_dry * 0.5, (d_dry, float(d_wet.max()))
    assert np.all(d_wet >= 0.0)
    assert np.all(np.asarray(sim.state.surface_excess_water) >= 0.0)
    assert rep["inventory_relative_residual"] < 1e-12, rep


def test_deficit_pool_off_has_no_extra_variable():
    sim = _sim(False, 0.0)
    assert "soil_water_deficit" not in sim.state
