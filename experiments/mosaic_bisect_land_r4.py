"""Round-4 op-level bisect of the Mosaic `layout.h:320` crash.

Round 3 pinned the fused coupled-LandModel kernel crash
(`F layout.h:320 Check failed: arr.size() >= layout_rank(implicit_dim)
(1 vs. 2)`) to the surface-hydrology trace at MODEL granularity
(experiments/mosaic_land_repro.py). This harness drills to OP granularity:
each variant monkeypatches ONE construct out of the coupled trace and
compiles a tiny fused lean rollout on the real chip in a SUBPROCESS (the
Mosaic abort kills the process, signal 6).

Usage:
    python experiments/mosaic_bisect_land_r4.py            # driver: all variants
    python experiments/mosaic_bisect_land_r4.py VARIANT    # one variant in-process

Suspects (all constructs unique to the coupled trace — absent from the
Mosaic-proven SoilModel/N72-forced kernels):

  * the `ground_temperature` top-row extraction `jnp.reshape(T[-1:], (-1,))`
    becoming LIVE (it is DCE'd out of the bare SoilModel lean kernel,
    utils/scan_dce.py) and feeding XY math in SEB/runoff,
  * the DirectSurfaceRunoff `jnp.squeeze(x[-1:], 0)` extractions of face/
    center arrays,
  * the ET-sink `(block,)/(1,)` division and its rank-1 -> rank-2 broadcast
    into the tendency row mask,
  * the InputRef flux-BC reads of in-kernel-computed XY auxiliaries
    (ground_heat_flux, infiltration).
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CELLS, NZ, BLOCK, INNER, NSTEPS = 1024, 8, 256, 4, 8


def _masked_row(arr, row):
    """Row extraction as a one-hot masked sum (rank-2 -> rank-1 via
    reduction, the construct already Mosaic-proven by `_WindowSource`)
    instead of slice+reshape/squeeze."""
    import jax
    import jax.numpy as jnp

    nz = arr.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 0)
    return jnp.sum(jnp.where(rows == (row % nz), arr, 0.0), axis=0)


def apply_variant(name, tt):
    import jax.numpy as jnp

    from terrarium_tpu.processes.soil.energy import SoilEnergyTemperatureClosure
    from terrarium_tpu.processes.surface_hydrology import surface_hydrology as sh
    from terrarium_tpu.processes.soil import hydrology as hyd

    if name in ("base", "soil_only"):
        return

    if "+" in name:  # stackable atoms: "a+b+c" applies each in turn
        for atom in name.split("+"):
            apply_variant(atom, tt)
        return

    if name == "minseb":
        # the WHOLE surface energy balance reduced to one linear carried-
        # prognostic update from the T top row: Ts' = 0.9 Ts + 0.1 Tg
        from terrarium_tpu.processes.surface_energy import seb as seb_mod

        def compute_auxiliary(self, state, grid, constants, atmos, evtr=None,
                              ctx=None):
            return state.update(
                skin_temperature=0.9 * state.skin_temperature
                + 0.1 * state.ground_temperature)

        def compute_surface_energy_fluxes(self, state, grid, constants,
                                          atmos, evtr=None):
            return state

        seb_mod.SurfaceEnergyBalance.compute_auxiliary = compute_auxiliary
        seb_mod.SurfaceEnergyBalance.compute_surface_energy_fluxes = \
            compute_surface_energy_fluxes
        return

    if name == "minseb_twice":
        # minseb but the Ts update applied TWICE in sequence per step (the
        # real LandModel runs the SEB sweep 2-4x: compute_auxiliary +
        # compute_surface_energy_fluxes, each optionally two-pass)
        from terrarium_tpu.processes.surface_energy import seb as seb_mod

        def compute_auxiliary(self, state, grid, constants, atmos, evtr=None,
                              ctx=None):
            state = state.update(
                skin_temperature=0.9 * state.skin_temperature
                + 0.1 * state.ground_temperature)
            return state.update(
                skin_temperature=0.9 * state.skin_temperature
                + 0.1 * state.ground_temperature)

        def compute_surface_energy_fluxes(self, state, grid, constants,
                                          atmos, evtr=None):
            return state

        seb_mod.SurfaceEnergyBalance.compute_auxiliary = compute_auxiliary
        seb_mod.SurfaceEnergyBalance.compute_surface_energy_fluxes = \
            compute_surface_energy_fluxes
        return

    if name == "minseb_full":
        # ALL exonerated ingredients together: two sequential sweeps, each
        # reading input leaves, writing the six flux aux leaves, and
        # updating the carried Ts — the closest linear analogue of the real
        # (crashing) one-sweep SEB structure
        from terrarium_tpu.processes.surface_energy import seb as seb_mod

        def _sweep(state, atmos):
            Ts, Tg = state.skin_temperature, state.ground_temperature
            SW = atmos.shortwave_down(state)
            LW = atmos.longwave_down(state)
            Ta = atmos.air_temperature(state)
            SW_up = 0.3 * SW
            LW_up = 1.5 * Ts + 0.97 * LW
            R_net = SW_up - SW + LW_up - LW
            H_s = 1.0e-3 * (Ts - Ta)
            H_l = 1.0e-3 * Ts
            G = R_net - H_s - H_l
            state = state.update(surface_net_radiation=R_net,
                                 ground_heat_flux=G,
                                 surface_shortwave_up=SW_up,
                                 surface_longwave_up=LW_up,
                                 sensible_heat_flux=H_s,
                                 latent_heat_flux=H_l)
            return state.update(
                skin_temperature=Tg - 1.0e-3 * state.ground_heat_flux)

        def compute_auxiliary(self, state, grid, constants, atmos, evtr=None,
                              ctx=None):
            return _sweep(state, atmos)

        def compute_surface_energy_fluxes(self, state, grid, constants,
                                          atmos, evtr=None):
            return _sweep(state, atmos)

        seb_mod.SurfaceEnergyBalance.compute_auxiliary = compute_auxiliary
        seb_mod.SurfaceEnergyBalance.compute_surface_energy_fluxes = \
            compute_surface_energy_fluxes
        return

    if name in ("minseb_inputs", "minseb_aux", "minseb_ghf"):
        from terrarium_tpu.processes.surface_energy import seb as seb_mod

        if name == "minseb_inputs":
            # minseb + input-leaf reads in the XY chain
            def compute_auxiliary(self, state, grid, constants, atmos,
                                  evtr=None, ctx=None):
                extra = 1.0e-6 * (atmos.shortwave_down(state)
                                  + atmos.longwave_down(state)
                                  + atmos.air_temperature(state))
                return state.update(
                    skin_temperature=0.9 * state.skin_temperature
                    + 0.1 * state.ground_temperature + extra)
        elif name == "minseb_ghf":
            # minseb + ONE aux intermediary (ground_heat_flux) in the chain
            def compute_auxiliary(self, state, grid, constants, atmos,
                                  evtr=None, ctx=None):
                G = 1.5 * state.skin_temperature - state.ground_temperature
                state = state.update(ground_heat_flux=G)
                return state.update(
                    skin_temperature=0.9 * state.skin_temperature
                    + 1.0e-3 * state.ground_heat_flux
                    + 0.1 * state.ground_temperature)
        else:  # minseb_aux: minseb + the five flux aux writes (no inputs)
            def compute_auxiliary(self, state, grid, constants, atmos,
                                  evtr=None, ctx=None):
                Ts, Tg = state.skin_temperature, state.ground_temperature
                state = state.update(
                    surface_net_radiation=1.1 * Ts + 0.1 * Tg,
                    ground_heat_flux=1.5 * Ts - Tg,
                    surface_shortwave_up=0.5 * Ts,
                    surface_longwave_up=0.7 * Ts,
                    sensible_heat_flux=0.2 * Ts,
                    latent_heat_flux=0.1 * Ts)
                return state.update(
                    skin_temperature=0.9 * Ts
                    + 1.0e-3 * state.ground_heat_flux + 0.1 * Tg)

        def compute_surface_energy_fluxes(self, state, grid, constants,
                                          atmos, evtr=None):
            return state

        seb_mod.SurfaceEnergyBalance.compute_auxiliary = compute_auxiliary
        seb_mod.SurfaceEnergyBalance.compute_surface_energy_fluxes = \
            compute_surface_energy_fluxes
        return

    if name in ("rad_linear", "turb_linear"):
        from terrarium_tpu.processes.surface_energy import seb as seb_mod

        if name == "rad_linear":
            def upwelling(self, state, seb, constants, atmos, Ts):
                SW_down = atmos.shortwave_down(state)
                LW_down = atmos.longwave_down(state)
                return 0.3 * SW_down, 1.5 * Ts + 0.97 * LW_down

            seb_mod.DiagnosedRadiativeFluxes.upwelling = upwelling
        else:
            def sensible(self, state, seb, constants, atmos, Ts):
                return 1.0e-3 * (Ts - atmos.air_temperature(state))

            def latent(self, state, seb, constants, atmos, Ts, evtr=None):
                return 1.0e-3 * Ts

            seb_mod.DiagnosedTurbulentFluxes.sensible = sensible
            seb_mod.DiagnosedTurbulentFluxes.latent = latent
        return

    if name in ("skin_simple", "skin_const_dz", "skin_no_clip"):
        from terrarium_tpu.processes.surface_energy import seb as seb_mod

        if name == "skin_simple":
            def compute_skin_temperature(self, state, grid):
                return state.ground_temperature - 1.0e-3 * state.ground_heat_flux
        elif name == "skin_const_dz":
            def compute_skin_temperature(self, state, grid):
                G = state.ground_heat_flux
                Tg = state.ground_temperature
                delta = jnp.clip(-G * 0.05 / (2.0 * self.kappa_s),
                                 -self.max_delta, self.max_delta)
                return Tg + delta
        else:  # skin_no_clip
            def compute_skin_temperature(self, state, grid):
                dz1 = jnp.reshape(grid.dz[-1:], ())
                G = state.ground_heat_flux
                Tg = state.ground_temperature
                return Tg - G * dz1 / (2.0 * self.kappa_s)

        seb_mod.ImplicitSkinTemperature.compute_skin_temperature = \
            compute_skin_temperature
        return

    if name == "fluxes_plain":
        # _fluxes without the broadcast_to/astype normalization on updates
        from terrarium_tpu.processes.surface_energy import seb as seb_mod
        net_radiation = seb_mod.net_radiation
        DiagnosedRadiativeFluxes = seb_mod.DiagnosedRadiativeFluxes
        DiagnosedTurbulentFluxes = seb_mod.DiagnosedTurbulentFluxes

        def _fluxes(self, state, grid, constants, atmos, evtr):
            Ts = self.skin_temperature.skin_temperature(state)
            SW_up, LW_up = self.radiative_fluxes.upwelling(state, self,
                                                          constants, atmos, Ts)
            SW_down = atmos.shortwave_down(state)
            LW_down = atmos.longwave_down(state)
            R_net = net_radiation(SW_up, SW_down, LW_up, LW_down)
            H_s = self.turbulent_fluxes.sensible(state, self, constants,
                                                 atmos, Ts)
            H_l = self.turbulent_fluxes.latent(state, self, constants, atmos,
                                              Ts, evtr)
            G = (R_net + H_s + H_l if self.ground_flux_form == "consistent"
                 else R_net - H_s - H_l)
            updates = dict(surface_net_radiation=R_net, ground_heat_flux=G)
            if isinstance(self.radiative_fluxes, DiagnosedRadiativeFluxes):
                updates.update(surface_shortwave_up=SW_up,
                               surface_longwave_up=LW_up)
            if isinstance(self.turbulent_fluxes, DiagnosedTurbulentFluxes):
                updates.update(sensible_heat_flux=H_s, latent_heat_flux=H_l)
            ones = jnp.ones_like(state.ground_heat_flux)
            return state.update({k: v * ones for k, v in updates.items()})

        seb_mod.SurfaceEnergyBalance._fluxes = _fluxes
        return

    if name == "gt_masksum":
        orig_cl, orig_inv = (SoilEnergyTemperatureClosure.closure,
                             SoilEnergyTemperatureClosure.invclosure)

        def closure(self, state, grid, energy, soil, constants):
            state = orig_cl(self, state, grid, energy, soil, constants)
            return state.update(
                ground_temperature=_masked_row(state.temperature, -1))

        def invclosure(self, state, grid, energy, soil, constants):
            state = orig_inv(self, state, grid, energy, soil, constants)
            return state.update(
                ground_temperature=_masked_row(state.temperature, -1))

        SoilEnergyTemperatureClosure.closure = closure
        SoilEnergyTemperatureClosure.invclosure = invclosure
        return

    if name == "gt_zero":
        orig_cl, orig_inv = (SoilEnergyTemperatureClosure.closure,
                             SoilEnergyTemperatureClosure.invclosure)

        def closure(self, state, grid, energy, soil, constants):
            state = orig_cl(self, state, grid, energy, soil, constants)
            return state.update(
                ground_temperature=jnp.zeros_like(state.ground_temperature))

        def invclosure(self, state, grid, energy, soil, constants):
            state = orig_inv(self, state, grid, energy, soil, constants)
            return state.update(
                ground_temperature=jnp.zeros_like(state.ground_temperature))

        SoilEnergyTemperatureClosure.closure = closure
        SoilEnergyTemperatureClosure.invclosure = invclosure
        return

    if name == "runoff_masksum":
        def compute_auxiliary(self, state, grid, canopy, soil, ctx):
            rain = state.rainfall_ground
            S = state.surface_excess_water
            k_unsat = _masked_row(state.hydraulic_conductivity, -1)
            sat_top = _masked_row(state.saturation_water_ice, -1)
            unsaturated = sat_top < 1.0
            has_excess = S > 0.0
            drainage = jnp.where(has_excess, self.surface_drainage(S), 0.0)
            influx = jnp.where(has_excess, drainage, rain)
            infil = jnp.where(unsaturated, jnp.minimum(influx, k_unsat), 0.0)
            runoff = rain + drainage - infil
            return state.update(infiltration=infil, surface_runoff=runoff)

        sh.DirectSurfaceRunoff.compute_auxiliary = compute_auxiliary
        return

    if name == "runoff_trivial":
        def compute_auxiliary(self, state, grid, canopy, soil, ctx):
            rain = state.rainfall_ground
            return state.update(infiltration=jnp.zeros_like(rain),
                                surface_runoff=rain)

        sh.DirectSurfaceRunoff.compute_auxiliary = compute_auxiliary
        return

    if name == "sink_zero":
        def soil_moisture_sink(self, state, grid, constants):
            return jnp.zeros_like(state.surface_excess_water)

        sh.BareGroundEvaporation.soil_moisture_sink = soil_moisture_sink
        return

    if name == "sink_rank2":
        # ET sink applied as an explicit rank-2 (1, block) row instead of a
        # rank-1 (block,) implicit broadcast
        def soil_moisture_sink(self, state, grid, constants):
            v = -self.surface_humidity_flux(state) * self.water_flux_scale
            return v[None, :]  # (1, block): broadcasts vs (Nz, block) rank-2

        sh.BareGroundEvaporation.soil_moisture_sink = soil_moisture_sink
        return

    if name == "et_zero_aux":
        def compute_auxiliary(self, state, grid, canopy, constants, atmos,
                              soil, vegetation, ctx):
            return state.update(
                evaporation_ground=jnp.zeros_like(state.skin_temperature))

        sh.BareGroundEvaporation.compute_auxiliary = compute_auxiliary
        return

    if name == "gt_zero_mul":
        # keep the T -> gt -> SEB dataflow GRAPH, zero only the values: if
        # this still crashes, Mosaic trips on the graph/layout chain, not on
        # any particular numeric path
        orig_cl = SoilEnergyTemperatureClosure.closure

        def closure(self, state, grid, energy, soil, constants):
            state = orig_cl(self, state, grid, energy, soil, constants)
            return state.update(
                ground_temperature=0.0 * state.ground_temperature)

        SoilEnergyTemperatureClosure.closure = closure
        return

    if name == "gt_barrier":
        # lax.optimization_barrier between the rank-2 row extraction and the
        # XY consumers: forces a layout-assignment boundary
        import jax

        orig_cl = SoilEnergyTemperatureClosure.closure

        def closure(self, state, grid, energy, soil, constants):
            state = orig_cl(self, state, grid, energy, soil, constants)
            return state.update(ground_temperature=jax.lax.optimization_barrier(
                state.ground_temperature))

        SoilEnergyTemperatureClosure.closure = closure
        return

    if name == "ts_eq_tg":
        # cut the skin-temperature update chain: Ts = Tg directly
        from terrarium_tpu.processes.surface_energy import seb as seb_mod

        def compute_skin_temperature(self, state, grid):
            return state.ground_temperature

        seb_mod.ImplicitSkinTemperature.compute_skin_temperature = \
            compute_skin_temperature
        return

    if name == "no_skin_write":
        # SEB computes fluxes at Tg-independent Ts (the carried prognostic)
        # and never writes Ts from Tg; gt stays live only through the
        # latent/vpd chain
        from terrarium_tpu.processes.surface_energy import seb as seb_mod

        def compute_surface_energy_fluxes(self, state, grid, constants,
                                          atmos, evtr=None):
            return self._fluxes(state, grid, constants, atmos, evtr)

        seb_mod.SurfaceEnergyBalance.compute_surface_energy_fluxes = \
            compute_surface_energy_fluxes
        return

    if name == "one_sweep":
        # keep the Ts update but skip the SECOND flux sweep
        from terrarium_tpu.processes.surface_energy import seb as seb_mod
        ImplicitSkin = seb_mod.ImplicitSkinTemperature

        def compute_surface_energy_fluxes(self, state, grid, constants,
                                          atmos, evtr=None):
            state = self._fluxes(state, grid, constants, atmos, evtr)
            if isinstance(self.skin_temperature, ImplicitSkin):
                Ts = self.skin_temperature.compute_skin_temperature(state, grid)
                state = state.update(skin_temperature=Ts)
            return state

        seb_mod.SurfaceEnergyBalance.compute_surface_energy_fluxes = \
            compute_surface_energy_fluxes
        return

    if name in ("seb_linear", "seb_no_pow4", "seb_no_esat", "seb_no_ra"):
        from terrarium_tpu.processes.surface_energy import seb as seb_mod
        from terrarium_tpu.processes import atmosphere as atm_mod
        from terrarium_tpu import constants as const_mod

        if name in ("seb_linear", "seb_no_pow4"):
            def upwelling(self, state, seb, constants, atmos, Ts):
                SW_down = atmos.shortwave_down(state)
                LW_down = atmos.longwave_down(state)
                SW_up = 0.3 * SW_down
                LW_up = 1.5 * Ts + 0.97 * LW_down  # linear LW stand-in
                return SW_up, LW_up

            seb_mod.DiagnosedRadiativeFluxes.upwelling = upwelling
        if name == "seb_linear":
            def sensible(self, state, seb, constants, atmos, Ts):
                Ta = atmos.air_temperature(state)
                return 1.0e-3 * (Ts - Ta)

            def latent(self, state, seb, constants, atmos, Ts, evtr=None):
                return 1.0e-3 * Ts

            seb_mod.DiagnosedTurbulentFluxes.sensible = sensible
            seb_mod.DiagnosedTurbulentFluxes.latent = latent
        if name == "seb_no_esat":
            def humidity_vpd(self, state, constants, Ts=None):
                Ts = Ts if Ts is not None else self.air_temperature(state)
                return 1.0e-5 * Ts + 1.0e-4  # linear stand-in, keeps graph

            atm_mod.PrescribedAtmosphere.humidity_vpd = humidity_vpd
        if name == "seb_no_ra":
            def aerodynamic_resistance(self, state, constants=None):
                import jax.numpy as jnp2

                return jnp2.full_like(state.skin_temperature, 260.0)

            atm_mod.PrescribedAtmosphere.aerodynamic_resistance = \
                aerodynamic_resistance
        return

    if name in ("bc_zero_infil", "bc_zero_ghf", "bc_zero_both"):
        from terrarium_tpu.models import land_model as lm
        from terrarium_tpu.ops.bcs import Flux, InputRef, merge_boundary_conditions
        from terrarium_tpu.models.boundary_conditions import GroundHeatFlux

        def make_context(self, bcs=None):
            if name == "bc_zero_both":
                coupling = {}
            elif name == "bc_zero_infil":
                coupling = merge_boundary_conditions(
                    GroundHeatFlux("ground_heat_flux"), {})
            else:  # bc_zero_ghf
                coupling = {"saturation_water_ice":
                            {"top": Flux(InputRef("infiltration", -1.0))}}
            bcs = merge_boundary_conditions(bcs or {}, coupling)
            extras = lm._LandExtras(
                evapotranspiration=self.surface_hydrology.evapotranspiration,
                runoff=self.surface_hydrology.surface_runoff)
            from terrarium_tpu.processes.base import Context
            return Context(constants=self.constants, bcs=bcs, extras=extras)

        lm.LandModel.make_context = make_context
        return

    raise SystemExit(f"unknown variant {name!r}")


def run_variant(name):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import terrarium_tpu as tt

    apply_variant(name, tt)
    # initialization is many tiny EAGER ops — minutes over the remote-chip
    # tunnel (CLAUDE.md). Build the sim on host CPU, then move the state to
    # the chip; only the fused rollout compiles/executes there.
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        sim = _build_sim(name, tt)
    sim.state = jax.device_put(sim.state, tpu)
    sim.input_sources = jax.device_put(sim.input_sources, tpu)
    sim.fused_inner_steps, sim.fused_block_cells = INNER, BLOCK
    roll = sim._rollout_fn(NSTEPS)
    t0 = time.perf_counter()
    s = roll(sim.state, 600.0)
    v = float(np.asarray(jax.numpy.sum(s.prognostic["internal_energy"])))
    print(f"OK {name}: {time.perf_counter() - t0:.1f}s finite={np.isfinite(v)}",
          flush=True)


def _build_sim(name, tt):
    grid = tt.ColumnGrid.of(cells=CELLS, spacing=tt.ExponentialSpacing(N=NZ),
                            nf=np.float32)
    if name == "soil_only":
        soil = tt.SoilEnergyWaterCarbon(
            strat=tt.HomogeneousStratigraphy(
                texture=tt.SoilTexture.preset("loam")),
            hydrology=tt.SoilHydrology(vertical_flow=tt.RichardsEq()))
        model = tt.SoilModel(grid=grid, soil=soil)
        sim = tt.initialize(model, tt.ForwardEuler(dt=600.0),
                            initializers={"temperature": 5.0,
                                          "saturation_water_ice": 0.6},
                            boundary_conditions=tt.PrescribedSurfaceTemperature(5.0))
    else:
        soil = tt.SoilEnergyWaterCarbon(
            strat=tt.HomogeneousStratigraphy(
                texture=tt.SoilTexture.preset("loam")),
            hydrology=tt.SoilHydrology(vertical_flow=tt.RichardsEq()))
        model = tt.LandModel(grid=grid, vegetation=None, soil=soil)
        static = tt.FieldInputSource(fields={
            "surface_longwave_down": 330.0, "rainfall": 4.0e-8,
            "windspeed": 3.0, "surface_shortwave_down": 300.0,
            "air_temperature": 10.0})
        sim = tt.initialize(model, tt.ForwardEuler(dt=600.0),
                            initializers={"temperature": 5.0,
                                          "saturation_water_ice": 0.6},
                            input_sources=(static,))
    return sim


# ladder 2 (after ladder-1 localization: every variant with live
# T -> ground_temperature -> SEB dataflow crashes; gt_zero alone is OK):
# drill inside the SEB consumption chain + cheap lowering dodges
# FINAL STATE (round 4, seven ladders, ~30 on-chip probes):
#   gt_zero OK | gt_masksum/gt_zero_mul CRASH      -> graph-triggered, not op
#   all periphery cut (BCs/ET/runoff) still CRASH  -> SEB-internal
#   seb_linear / fluxes_plain / all skin variants CRASH -> not transcendental
#     ops, not broadcast/astype, not the dz1 scalar, not clip
#   minseb / minseb_inputs / minseb_ghf / minseb_aux / minseb_twice all OK
#   minseb_full (two linear sweeps x [input reads + 6 aux writes + Ts
#     update]) CRASH -> the trigger is the COMPOUND graph: the full
#     (even fully linear) two-sweep SEB dataflow composed with the soil
#     closure chain in one kernel. No single crashing op exists; this is a
#     Mosaic layout-inference bug on graph composition (layout.h:320,
#     size-1 array meeting a rank-2 implicit-dim layout).
# The sharpest committed crasher: variant
#   "minseb_full+bc_zero_both+runoff_trivial+sink_zero+et_zero_aux"
# — zero transcendentals, zero real SEB physics, still aborts the compiler.
X = "bc_zero_both+runoff_trivial+sink_zero+et_zero_aux"
VARIANTS = [f"minseb_full+{X}"]
LADDER5 = "one_sweep+X+rad_linear+turb_linear[+skin_simple|skin_const_dz|skin_no_clip|fluxes_plain]"
#: chip: ALL ladder-5 variants CRASH(layout)
MINI = "minseb+bc_zero_both+runoff_trivial+sink_zero+et_zero_aux"
LADDER4 = [MINI,
           "minseb+runoff_trivial+sink_zero+et_zero_aux",
           "minseb+bc_zero_both+sink_zero+et_zero_aux",
           "minseb+bc_zero_both+runoff_trivial",
           "one_sweep+bc_zero_both+runoff_trivial+sink_zero+et_zero_aux"]
#: chip: minseb combos all OK; one_sweep+all-cut CRASH(layout)
LADDER3 = ["seb_linear", "seb_no_esat", "seb_no_pow4", "seb_no_ra"]
#: chip: seb_linear CRASH(layout)
LADDER2 = ["gt_barrier", "gt_zero_mul", "ts_eq_tg", "no_skin_write",
           "one_sweep"]
#: chip results: gt_barrier FAIL(non-layout), gt_zero_mul CRASH (graph not
#: values), ts_eq_tg CRASH, no_skin_write OK (gt unconsumed -> DCE),
#: one_sweep CRASH. Pure-Pallas minimal patterns (mosaic_min_repro.py)
#: ALL COMPILE -> the bare row->XY-carry pattern is innocent.
# ladder 1 (all measured, see LADDER1_RESULTS below)
LADDER1 = ["gt_masksum", "runoff_masksum", "sink_rank2",
           "gt_zero", "runoff_trivial", "sink_zero", "bc_zero_both",
           "et_zero_aux", "bc_zero_infil", "bc_zero_ghf"]
#: chip results 2026-08-21 (cells=1024, nz=8, block=256, inner=4):
#: gt_masksum CRASH, runoff_masksum CRASH, sink_rank2 CRASH, gt_zero OK,
#: runoff_trivial CRASH, sink_zero CRASH, bc_zero_both CRASH,
#: et_zero_aux CRASH, bc_zero_infil CRASH, bc_zero_ghf CRASH
#: => trigger = the temperature -> ground_temperature -> SEB dataflow being
#: live in-kernel (independent of extraction op, coupling BCs, ET, runoff)
LADDER1_RESULTS = "see comment"


def main():
    if len(sys.argv) > 1:
        run_variant(sys.argv[1])
        return
    results = {}
    only = [a for a in sys.argv[2:]] if len(sys.argv) > 2 else None
    for v in (only or VARIANTS):
        t0 = time.perf_counter()
        try:
            p = subprocess.run([sys.executable, __file__, v],
                               capture_output=True, text=True, timeout=1800)
        except subprocess.TimeoutExpired:
            results[v] = "HANG  (>1800s, Mosaic compile timeout)"
            print(f"{v:18s} {results[v]}", flush=True)
            continue
        dt = time.perf_counter() - t0
        if p.returncode == 0:
            results[v] = f"OK    ({dt:.0f}s)"
        else:
            err = (p.stderr or "") + (p.stdout or "")
            tail = err.strip().splitlines()[-3:]
            if "layout.h" in err:
                tag = "CRASH(layout)"
            elif "Mosaic" in err or "INTERNAL" in err or p.returncode < 0:
                tag = "CRASH(mosaic)"
            else:
                tag = "FAIL "
            results[v] = (f"{tag} rc={p.returncode} "
                          f"({dt:.0f}s) {' | '.join(tail[-1:])[:160]}")
        print(f"{v:18s} {results[v]}", flush=True)
    print("\nSummary:")
    for v, r in results.items():
        print(f"  {v:18s} {r}")


if __name__ == "__main__":
    main()
