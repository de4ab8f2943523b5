"""Column water/energy budget diagnostics.

The reference checks conservation ad hoc with Oceananigans ``Integral``
fields in tests (`test/soil/soil_hydrology_tests.jl:93-123`); this module
makes the column budget a standing capability: inventories (what is in the
column now), itemized exchange rates (what is crossing its boundaries,
computed from the SAME face fluxes and BC specs the tendency kernels use),
and a :class:`BudgetTracker` callback that time-integrates the rates during
``Simulation.run`` and reports the closure residual.

Identities used (exact for the shipped spatial operators):

* The center divergence telescopes: ``sum_k(-div_faces(q)[k] * dz[k]) =
  q[bottom_face] - q[top_face]`` — so the interior Darcy/heat transport
  changes the column inventory only through the two boundary faces.
* Flux BCs add ``-q_top/dz_top`` / ``+q_bot/dz_bot`` to the boundary-cell
  tendency (`ops/vertical_ops.apply_flux_bcs`), i.e. ``-q_top + q_bot`` to
  the column inventory rate. NOTE the reference applies water flux BCs to
  the *saturation* tendency without the porosity rescale
  (`abstract_timestepper.jl:70-72` vs `soil_hydrology.jl:222-237`), so a
  water BC flux ``q`` [m/s] changes the water inventory by ``q * porosity``
  at the boundary cell — the budget accounts the actual inventory change
  and exposes the quirk as the difference between ``bc_top_water`` and the
  nominal flux.

Known non-closures (by design, documented in README "deviations"):

* parity-mode `DirectSurfaceRunoff` double-counts pool drainage
  (`surface_hydrology.py` docstring); use ``.consistent()`` for a closed
  system budget.
* parity-mode ET applies the humidity flux as a water-volume flux
  (`BareGroundEvaporation.water_flux_scale`); the budget accounts whatever
  the scheme applies, so the *soil* budget still closes.
* the saturation-adjustment clamp can create water when a column is pushed
  below zero saturation (reference `soil_hydrology.jl:185-218` clamps
  without a deficit pool); the residual measures it.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.bcs import Flux, get_bc, resolve_bc_value
from ..ops.vertical_ops import ghosts, grad_faces, interp_faces_mid
from ..processes.soil.hydrology import RichardsEq

__all__ = ["water_column", "energy_column", "water_rates", "energy_rates",
           "BudgetTracker", "ExactBudget"]


def _soil(model):
    soil = getattr(model, "soil", None)
    if soil is None:
        raise ValueError(f"{type(model).__name__} has no soil process")
    return soil


# ---------------------------------------------------------------------------
# Inventories
# ---------------------------------------------------------------------------
def water_column(state, grid, model) -> Dict[str, jnp.ndarray]:
    """Per-column water inventories [m]: ``soil`` = ∫ sat·por dz, plus the
    surface excess pool, canopy store, and snowpack SWE when present.
    ``total`` sums all components."""
    soil = _soil(model)
    por = soil.strat.bulk_porosity(soil.biogeochem, state, grid)
    sat = state.saturation_water_ice
    theta = jnp.broadcast_to(sat * por, (grid.nz, grid.cells))
    out = {"soil": jnp.sum(theta * grid.dz, axis=0)}
    if "surface_excess_water" in state:
        out["pool"] = state.surface_excess_water
    if "canopy_water" in state:
        out["canopy"] = state.canopy_water
    if "snow_water_equivalent" in state:
        out["snow"] = state.snow_water_equivalent
    if "soil_water_deficit" in state:
        # corrected clamp mode (`SoilHydrology.deficit_pool`): the tracked
        # debt is negative inventory, so clip-created water nets to zero
        out["deficit"] = -state.soil_water_deficit
    out["total"] = sum(out.values())
    return out


def energy_column(state, grid, model=None) -> Dict[str, jnp.ndarray]:
    """Per-column energy inventory [J/m^2]: ``soil`` = ∫ U dz."""
    U = state.internal_energy
    soil = jnp.sum(U * grid.dz, axis=0)
    return {"soil": soil, "total": soil}


# ---------------------------------------------------------------------------
# Exchange rates
# ---------------------------------------------------------------------------
def energy_rates(state, grid, model, ctx) -> Dict[str, jnp.ndarray]:
    """Itemized d/dt of the column energy inventory [W/m^2], recomputing the
    same boundary-face fluxes the tendency kernel uses
    (`processes/soil/energy.py` compute_tendencies; reference
    `soil_energy.jl:102-149`). Keys:

    * ``diff_bottom`` / ``diff_top``: diffusive flux through the bottom/top
      face (positive up; zero under Flux/no BC by the zero-gradient ghost),
    * ``bc_bottom`` / ``bc_top``: Flux-BC contributions,
    * ``net``: total rate; equals d(energy_column)/dt up to forcing hooks.
    """
    soil = _soil(model)
    energy = soil.energy
    T = state.temperature
    kappa = jnp.broadcast_to(energy.thermal_conductivity(state, grid, soil),
                             (grid.nz, grid.cells))
    bc_bot = get_bc(ctx.bcs, "temperature", "bottom")
    bc_top = get_bc(ctx.bcs, "temperature", "top")
    g_bot, g_top = ghosts(T, bc_bot, bc_top, state, grid.dz_faces)
    kappa_f = interp_faces_mid(kappa)
    q = -kappa_f * grad_faces(T, grid.dz_faces, g_bot, g_top)
    zeros = jnp.zeros(grid.cells, dtype=grid.nf)
    out = {
        "diff_bottom": jnp.broadcast_to(q[0], (grid.cells,)),
        "diff_top": -jnp.broadcast_to(q[-1], (grid.cells,)),
        "bc_bottom": zeros, "bc_top": zeros,
    }
    fbc_top = get_bc(ctx.bcs, "internal_energy", "top")
    fbc_bot = get_bc(ctx.bcs, "internal_energy", "bottom")
    if isinstance(fbc_top, Flux):
        out["bc_top"] = -jnp.broadcast_to(
            resolve_bc_value(fbc_top.value, state), (grid.cells,))
    if isinstance(fbc_bot, Flux):
        out["bc_bottom"] = jnp.broadcast_to(
            resolve_bc_value(fbc_bot.value, state), (grid.cells,))
    out["net"] = (out["diff_bottom"] + out["diff_top"]
                  + out["bc_bottom"] + out["bc_top"])
    return out


def water_rates(state, grid, model, ctx) -> Dict[str, jnp.ndarray]:
    """Itemized d/dt of the column water inventory [m/s], mirroring
    `processes/soil/hydrology.py` compute_tendencies (reference
    `soil_hydrology_rre.jl:95-131`, `soil_hydrology.jl:245-283`). Keys:

    * ``darcy_bottom`` / ``darcy_top``: Darcy flux through the boundary
      faces (positive up; both zero for `NoFlow`),
    * ``et``: evapotranspiration sink applied to the top soil layer,
    * ``bc_top_water`` / ``bc_bottom_water``: water-inventory change from
      Flux BCs on ``saturation_water_ice`` — the nominal flux times the
      boundary-cell porosity (see module docstring on the reference quirk),
    * ``pool``: surface-excess pool tendency (its drainage term, with the
      parity/consistent sign),
    * ``canopy`` / ``snow``: store tendencies when present,
    * ``net``: total system rate (soil + pool + canopy + snow).
    """
    soil = _soil(model)
    hyd = soil.hydrology
    por = jnp.broadcast_to(
        soil.strat.bulk_porosity(soil.biogeochem, state, grid),
        (grid.nz, grid.cells))
    zeros = jnp.zeros(grid.cells, dtype=grid.nf)
    out = {"darcy_bottom": zeros, "darcy_top": zeros, "et": zeros,
           "bc_top_water": zeros, "bc_bottom_water": zeros, "pool": zeros}
    evtr = getattr(ctx.extras, "evapotranspiration", None) if ctx.extras else None
    runoff = getattr(ctx.extras, "runoff", None) if ctx.extras else None

    if isinstance(hyd.vertical_flow, RichardsEq):
        from ..ops.vertical_ops import shift_z

        psi = state.pressure_head
        bc_bot = get_bc(ctx.bcs, "pressure_head", "bottom")
        bc_top = get_bc(ctx.bcs, "pressure_head", "top")
        g_bot, g_top = ghosts(psi, bc_bot, bc_top, state, grid.dz_faces)
        grad = grad_faces(psi, grid.dz_faces, g_bot, g_top)
        K = state.hydraulic_conductivity
        K_eff = jnp.where(grad < 0.0,
                          jnp.minimum(shift_z(K, 1, jnp.inf), K),
                          jnp.minimum(K, shift_z(K, -1, jnp.inf)))
        q = -K_eff * grad
        out["darcy_bottom"] = jnp.broadcast_to(q[0], (grid.cells,))
        out["darcy_top"] = -jnp.broadcast_to(q[-1], (grid.cells,))
        if evtr is not None:
            out["et"] = jnp.broadcast_to(
                evtr.soil_moisture_sink(state, grid, ctx.constants),
                (grid.cells,))
        fbc_top = get_bc(ctx.bcs, "saturation_water_ice", "top")
        fbc_bot = get_bc(ctx.bcs, "saturation_water_ice", "bottom")
        if isinstance(fbc_top, Flux):
            out["bc_top_water"] = jnp.broadcast_to(
                -resolve_bc_value(fbc_top.value, state) * por[-1],
                (grid.cells,))
        if isinstance(fbc_bot, Flux):
            out["bc_bottom_water"] = jnp.broadcast_to(
                resolve_bc_value(fbc_bot.value, state) * por[0],
                (grid.cells,))
        if "surface_excess_water" in state:
            S = state.surface_excess_water
            dSdt = (runoff.surface_drainage(S) if runoff is not None
                    else jnp.zeros_like(S))
            sign = -1.0 if getattr(runoff, "consistent_drainage", False) else 1.0
            out["pool"] = sign * jnp.minimum(dSdt, S)

    if "canopy_water" in state:
        # dw/dt = I - E_can*scale - R (surface_hydrology.py)
        E_can = state["evaporation_canopy"] if "evaporation_canopy" in state \
            else zeros
        scale = getattr(evtr, "water_flux_scale", 1.0) if evtr else 1.0
        out["canopy"] = (state.canopy_water_interception - E_can * scale
                         - state.canopy_water_removal)
    if "snow_water_equivalent" in state:
        out["snow"] = (model.atmosphere.snowfall(state) - state.snow_melt)
    out["net"] = sum(v for k, v in out.items())
    return out


# ---------------------------------------------------------------------------
# Run-time tracker
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class BudgetTracker:
    """``Simulation.run`` callback accumulating time-integrated exchange
    rates (trapezoid between callback samples) against inventory changes.

    Usage::

        tracker = BudgetTracker.start(sim)
        sim.run(steps=..., callbacks=[tracker], callback_interval=...)
        report = tracker.report()   # residuals per budget

    ``report()['water']['relative_residual']`` is
    ``|Δinventory - ∫rates dt| / max(|Δinventory|, |∫rates dt|, tiny)``
    reduced over columns (global sums).

    ``rule`` selects the quadrature between samples: ``"trapezoid"``
    (default; error O(interval²·rate″) for smooth forcing) or ``"left"`` —
    left-endpoint sampling, which is EXACT for ForwardEuler at one-step
    callback spacing (the explicit update applies rate(t_k)·dt verbatim;
    locked by tests/test_budget.py)."""

    water0: Any
    energy0: Any
    t_prev: float
    rates_prev: Dict[str, Any]
    int_water: Any
    int_energy: Any
    rule: str = "trapezoid"
    _last: Any = None

    @staticmethod
    def _rates(sim):
        if getattr(sim, "_budget_jit", None) is None:
            from ..timesteppers.stepping import update_state

            model, ctx, sources = sim.model, sim.ctx, sim.input_sources

            @jax.jit
            def fns(state):
                g = model.grid
                # rates must see the SAME auxiliaries the next step applies:
                # compute_auxiliary is not idempotent for SEB models (the
                # implicit skin-temperature sweep advances Ts each call), so
                # re-run the step's own update_state before sampling
                rs = update_state(model, state, ctx, sources)
                return (water_column(state, g, model),
                        energy_column(state, g, model),
                        water_rates(rs, g, model, ctx),
                        energy_rates(rs, g, model, ctx))

            sim._budget_jit = fns
        return sim._budget_jit(sim.state)

    @classmethod
    def start(cls, sim, rule: str = "trapezoid") -> "BudgetTracker":
        w, e, wr, er = cls._rates(sim)
        zero = jnp.zeros(sim.model.grid.cells, dtype=sim.model.grid.nf)
        return cls(water0=w, energy0=e, t_prev=float(sim.state.clock.time),
                   rates_prev={"water": wr["net"], "energy": er["net"]},
                   int_water=zero, int_energy=zero, rule=rule)

    def __call__(self, sim):
        w, e, wr, er = self._rates(sim)
        t = float(sim.state.clock.time)
        dt = t - self.t_prev
        if self.rule == "left":
            inc_w = dt * self.rates_prev["water"]
            inc_e = dt * self.rates_prev["energy"]
        else:
            inc_w = 0.5 * dt * (self.rates_prev["water"] + wr["net"])
            inc_e = 0.5 * dt * (self.rates_prev["energy"] + er["net"])
        self.int_water = self.int_water + inc_w
        self.int_energy = self.int_energy + inc_e
        self.t_prev = t
        self.rates_prev = {"water": wr["net"], "energy": er["net"]}
        self._last = (w, e)

    def report(self, sim=None) -> Dict[str, Dict[str, float]]:
        if sim is not None:
            w, e, _, _ = self._rates(sim)
        elif self._last is not None:
            w, e = self._last
        else:
            # no callback has fired yet (e.g. report() right after start(),
            # or callback_interval > steps): the inventory is unchanged
            w, e = self.water0, self.energy0
        out = {}
        for name, now, then, integ in (
                ("water", w["total"], self.water0["total"], self.int_water),
                ("energy", e["total"], self.energy0["total"], self.int_energy)):
            delta = float(jnp.sum(now - then))
            flux = float(jnp.sum(integ))
            inv = float(jnp.sum(jnp.abs(then)))
            resid = delta - flux
            out[name] = {
                "delta_inventory": delta,
                "integrated_rates": flux,
                "residual": resid,
                # vs the exchanged amount: meaningful when fluxes dominate
                # the float quantum of the inventory sums
                "relative_residual": abs(resid) / max(abs(delta), abs(flux),
                                                      1e-30),
                # vs the standing inventory: the honest closure number when
                # net exchange is near zero (pure-roundoff deltas report as
                # closed at the state dtype's precision)
                "inventory_relative_residual": abs(resid) / max(inv, 1e-30),
            }
        return out


# ---------------------------------------------------------------------------
# Exact in-rollout accumulator
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class ExactBudget:
    """Sampling-independent budget closure: the ``net`` exchange rates are
    accumulated INSIDE the rollout scan at every step (``acc += net(t_k)·dt``
    carried with the state), so the integral is a property of the run, not of
    the callback cadence — closing the quadrature hole of
    :class:`BudgetTracker` (trapezoid at coarse sampling was 83x off on the
    post-init energy-flux transient, docs/performance.md).

    For :class:`~terrarium_tpu.timesteppers.stepping.ForwardEuler` the
    left-endpoint per-step rule is EXACT: the explicit update applies
    ``tend(t_k)·dt`` verbatim, so ``Δinventory == Σ net(t_k)·dt`` up to
    float roundoff and genuine non-conservation (e.g. the saturation-clamp
    creation this instrument exists to measure). Chunking the run changes
    nothing — the per-step adds happen in the same order (locked by
    tests/test_budget.py::test_exact_budget_sampling_independent).

    Usage::

        eb = ExactBudget.start(sim)
        eb.run(sim, steps=..., dt=..., chunk=...)   # advances sim.state
        report = eb.report(sim)
    """

    water0: Any
    energy0: Any
    int_water: Any
    int_energy: Any

    @classmethod
    def start(cls, sim) -> "ExactBudget":
        g = sim.model.grid
        w = water_column(sim.state, g, sim.model)
        e = energy_column(sim.state, g, sim.model)
        zero = jnp.zeros(g.cells, dtype=g.nf)
        return cls(water0=w, energy0=e, int_water=zero, int_energy=zero)

    def _rollout(self, sim, n: int):
        key = ("exact_budget", n)
        cache = getattr(sim, "_exact_budget_fns", None)
        if cache is None:
            cache = sim._exact_budget_fns = {}
        if key not in cache:
            from ..timesteppers.stepping import update_state

            model, ctx, ts = sim.model, sim.ctx, sim.timestepper
            sources = sim.input_sources
            grid = model.grid

            @jax.jit
            def roll(state, dt, aw, ae):
                def body(carry, _):
                    st, aw_, ae_ = carry
                    # rates must see the SAME auxiliaries the step applies
                    rs = update_state(model, st, ctx, sources)
                    wr = water_rates(rs, grid, model, ctx)["net"]
                    er = energy_rates(rs, grid, model, ctx)["net"]
                    st = ts.step(model, st, ctx, sources, dt)
                    return (st, aw_ + wr * dt, ae_ + er * dt), None

                (state, aw, ae), _ = jax.lax.scan(
                    body, (state, aw, ae), None, length=n)
                return state, aw, ae

            cache[key] = roll
        return cache[key]

    def run(self, sim, steps: int, dt=None, chunk: Optional[int] = None):
        """Advance ``sim`` by ``steps`` while accumulating per-step rate
        integrals. ``chunk`` only bounds the on-device scan length per
        dispatch (host checkpoints between chunks); the accumulated integral
        is bit-identical for any chunking."""
        dt = float(dt) if dt is not None else sim.timestepper.default_dt()
        chunk = int(chunk or steps)
        done = 0
        while done < steps:
            n = min(chunk, steps - done)
            roll = self._rollout(sim, n)
            sim.state, self.int_water, self.int_energy = roll(
                sim.state, dt, self.int_water, self.int_energy)
            done += n
        return self

    def report(self, sim) -> Dict[str, Dict[str, float]]:
        g = sim.model.grid
        w = water_column(sim.state, g, sim.model)
        e = energy_column(sim.state, g, sim.model)
        out = {}
        for name, now, then, integ in (
                ("water", w["total"], self.water0["total"], self.int_water),
                ("energy", e["total"], self.energy0["total"],
                 self.int_energy)):
            delta = float(jnp.sum(now - then))
            flux = float(jnp.sum(integ))
            inv = float(jnp.sum(jnp.abs(then)))
            resid = delta - flux
            out[name] = {
                "delta_inventory": delta,
                "integrated_rates": flux,
                "residual": resid,
                # the headline number: vs the standing inventory (configs
                # with ~zero net exchange would otherwise divide by noise)
                "inventory_relative_residual": abs(resid) / max(inv, 1e-30),
                "relative_residual": abs(resid) / max(abs(delta), abs(flux),
                                                      1e-30),
            }
        return out
