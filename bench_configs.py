"""Per-config benchmark suite for the five BASELINE.json workloads.

`bench.py` remains the driver's single-line headline benchmark (N145 soil
heat + Richards, explicit). This suite measures all five BASELINE configs on
the real chip and prints ONE JSON line per config:

1. column_heat_explicit      — single-column SoilModel, heat only, ForwardEuler
                               (reference `examples/simulations/soil_heat_column.jl`)
2. column_implicit_tridiag   — heat + Richards, ImplicitEuler (PCR tridiagonal
                               solves), N145-sized cell batch (new capability —
                               the reference has only explicit steppers)
3. global_heat_n72_forcing   — soil heat over the masked N72 ERA5-land grid
                               with a time-interpolated forcing source
                               (reference `examples/simulations/soil_heat_global.jl`)
4. land_coupled_n145         — full LandModel (SEB + surface hydrology +
                               PALADYN vegetation + soil heat/water) on N145
5. grad_n145_heat            — value_and_grad of mean final soil temperature
                               wrt mineral conductivity through a remat
                               rollout on N145 (fwd+bwd per step counted)

Timing methodology matches bench.py: large on-device scan blocks (the
dispatch+sync tunnel costs ~35 ms/call), persistent compilation cache,
median of 5 blocks.
"""
from __future__ import annotations

import json
import time

import numpy as np


def _sync(x):
    import jax.numpy as jnp

    return float(np.asarray(jnp.sum(x)))


def _time_blocks(roll, state, dt, sync_leaf, reps=5):
    t0 = time.perf_counter()
    state = roll(state, dt)
    _sync(sync_leaf(state))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state = roll(state, dt)
        _sync(sync_leaf(state))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), compile_s, state


def _best_of_fused(sim, steps, dt, med_xla, inner=144, block=512,
                   xy_rank2_first=False):
    """Try the fused Pallas rollout back-to-back in this process; return
    (median_s, path) for the better of the two. Any failure (unsupported
    sources, Mosaic limits) leaves the XLA number standing.

    ``xy_rank2_first``: try the XY-rank-2 kernel layout first — required
    for coupled LandModel kernels, whose rank-1 layout aborts the Mosaic
    compiler (round-4 bisect; ops/fused_step.py xy_rank2). The other
    layout is attempted as fallback either way."""
    best, path = med_xla, "xla_lean_scan"
    orders = ((True, False) if xy_rank2_first else (False, True))
    for rank2 in orders:
        try:
            sim.fused_inner_steps, sim.fused_block_cells = inner, block
            sim.fused_xy_rank2 = rank2
            roll = sim._rollout_fn(steps)
            med_f, _, _ = _time_blocks(roll, sim.state, dt,
                                       lambda s: s.prognostic["internal_energy"],
                                       reps=3)
            if med_f < best:
                best = med_f
                path = f"pallas_fused_{block}x{inner}" + ("_xyr2" if rank2
                                                         else "")
            break  # first layout that compiles is measured; don't pay a
            # second multi-minute Mosaic compile for the alternate layout
        except Exception:
            continue
        finally:
            sim.fused_inner_steps = None
            sim.fused_xy_rank2 = False
    return best, path


def _emit(name, cells, steps, med_s, compile_s, dt, extra=None):
    rec = {
        "config": name,
        "metric": "cells_steps_per_s_per_chip",
        "value": round(cells * steps / med_s, 1),
        "unit": "cells*steps/s",
        "detail": {"cells": cells, "steps_per_block": steps, "dt_s": dt,
                   "median_block_s": round(med_s, 4),
                   "steps_per_s": round(steps / med_s, 1),
                   "compile_s": round(compile_s, 2), **(extra or {})},
    }
    print(json.dumps(rec), flush=True)


def _ring_grid(n, nz, tt, pad_multiple=8):
    mask, _, _ = tt.load_land_mask(
        f"/root/reference/inputs/era5-land_land_sea_mask_N{n}.nc")
    ring = tt.full_gaussian_grid(n)
    return tt.ColumnRingGrid.create(
        ring, mask, spacing=tt.ExponentialSpacing(N=nz),
        nf=np.float32, pad_multiple=pad_multiple)


def config1_column_heat(tt):
    grid = tt.ColumnGrid.of(cells=1, spacing=tt.ExponentialSpacing(N=30),
                            nf=np.float32)
    model = tt.SoilModel(grid=grid)
    sim = tt.initialize(
        model, tt.ForwardEuler(dt=300.0),
        initializers={"temperature": -2.0, "saturation_water_ice": 1.0},
        boundary_conditions=tt.PrescribedSurfaceTemperature(
            _diurnal_bc()),
    )
    steps = 57600
    roll = sim._rollout_fn(steps)
    med, comp, _ = _time_blocks(roll, sim.state, 300.0,
                                lambda s: s.prognostic["internal_energy"])
    _emit("column_heat_explicit", 1, steps, med, comp, 300.0)


def _diurnal_bc():
    import jax.numpy as jnp

    return lambda t: 5.0 * jnp.sin(2 * jnp.pi * t / 86400.0)


def _n145_cells():
    import h5py

    with h5py.File("/root/reference/inputs/era5-land_land_sea_mask_N145.nc",
                   "r") as f:
        return int((np.asarray(f["lsm"][0]) > 0.5).sum())


def config2_implicit(tt):
    cells = _n145_cells()
    grid = tt.ColumnGrid.of(cells=cells, spacing=tt.ExponentialSpacing(N=30),
                            nf=np.float32)
    hydrology = tt.SoilHydrology(
        vertical_flow=tt.RichardsEq(),
        hydraulic_properties=tt.ConstantSoilHydraulics(
            swrc=tt.VanGenuchten(alpha=2.0, n=2.0),
            unsat_hydraulic_cond=tt.UnsatKVanGenuchten()))
    model = tt.SoilModel(grid=grid,
                         soil=tt.SoilEnergyWaterCarbon(hydrology=hydrology))
    sim = tt.initialize(
        model, tt.ImplicitEuler(dt=900.0),
        initializers={
            "temperature": lambda x, z: 1.0 + 0.0 * z,
            "saturation_water_ice": lambda x, z: np.minimum(1.0, 0.5 - 0.05 * z),
        },
        boundary_conditions=tt.PrescribedSurfaceTemperature(_diurnal_bc()),
    )
    steps = 1920  # 20 simulated days at dt=900
    roll = sim._rollout_fn(steps)
    med, comp, _ = _time_blocks(roll, sim.state, 900.0,
                                lambda s: s.prognostic["internal_energy"])
    # fused attempt with the r5 in-kernel solver choice: fully-unrolled
    # Thomas (185.7M) beat PCR (168.2M) inside the kernel — the XLA-level
    # PCR win was launch-driven and inverts in VMEM (2x fewer flops); the
    # r5 attribution (experiments/ab_implicit_r5.py): the tridiagonal
    # solve owns 44% of the fused implicit step (diag-only 302M), inner=96
    # flat, stacking still loses. PCR remains the XLA-path default.
    from terrarium_tpu.ops import tridiag

    solver_used = "pcr"
    try:
        tridiag.THOMAS_UNROLL = "full"
        # r5 final: pair the heat+Richards solves into (2, cells) row ops
        # (stack_solves="rows"): 218.1M at i96_b512 -- crosses the 2x bar
        # (212.6M) that plain Thomas (202.9M) and PCR (168M) missed; the
        # solve owns 44% of the step and the pairing doubles its sublane
        # utilization (experiments/ab_implicit_r5.py)
        sim_t = tt.initialize(
            model, tt.ImplicitEuler(dt=900.0, solver="thomas",
                                    stack_solves="rows"),
            initializers={
                "temperature": lambda x, z: 1.0 + 0.0 * z,
                "saturation_water_ice": lambda x, z: np.minimum(
                    1.0, 0.5 - 0.05 * z)},
            boundary_conditions=tt.PrescribedSurfaceTemperature(_diurnal_bc()),
        )
        med2, path = _best_of_fused(sim_t, steps, 900.0, med,
                                    inner=96, block=512)
        if med2 < med:
            med, solver_used = med2, "thomas_full_unroll_pair_rows"
    finally:
        tridiag.THOMAS_UNROLL = 2
    if solver_used == "pcr":
        med, path = _best_of_fused(sim, steps, 900.0, med,
                                   inner=48, block=384)
    _emit("column_implicit_tridiag", cells, steps, med, comp, 900.0,
          {"solver": solver_used, "rollout_path": path})


def config3_global_heat_n72(tt):
    grid = _ring_grid(72, 30, tt)
    model = tt.SoilModel(grid=grid)
    lat = np.asarray(grid.cell_lats, dtype=np.float64)
    T_mean = 25.0 * np.maximum(np.cos(np.deg2rad(lat)), 0.05) - 5.0
    hours = np.arange(0.0, 31 * 86400.0, 3600.0)
    ts = (T_mean[None, :]
          + 8.0 * np.sin(2 * np.pi * hours[:, None] / 86400.0)).astype(np.float32)
    forcing = tt.TimeSeriesInputSource(times=hours,
                                       series={"surface_temperature": ts})
    sim = tt.initialize(
        model, tt.ForwardEuler(dt=300.0),
        initializers={"temperature": lambda x, z: T_mean[None, :] + 0.0 * z,
                      "saturation_water_ice": 0.8},
        boundary_conditions=tt.PrescribedSurfaceTemperature("surface_temperature"),
        input_sources=(forcing,),
    )
    steps = 5760  # 20 simulated days at dt=300
    roll = sim._rollout_fn(steps)
    med, comp, _ = _time_blocks(roll, sim.state, 300.0,
                                lambda s: s.prognostic["internal_energy"])
    med, path = _best_of_fused(sim, steps, 300.0, med)
    _emit("global_heat_n72_forcing", grid.cells, steps, med, comp, 300.0,
          {"land_cells": int(grid.n_land), "rollout_path": path})


def config4_land_coupled_n145(tt):
    import jax.numpy as jnp

    grid = _ring_grid(145, 20, tt)
    soil = tt.SoilEnergyWaterCarbon(
        strat=tt.HomogeneousStratigraphy(texture=tt.SoilTexture.preset("loam")),
        hydrology=tt.SoilHydrology(vertical_flow=tt.RichardsEq()),
    )
    model = tt.LandModel(grid=grid, vegetation=tt.VegetationCarbon(), soil=soil)
    lat = np.asarray(grid.cell_lats, dtype=np.float64)
    coslat = np.maximum(np.cos(np.deg2rad(lat)), 0.05)
    T_mean = 28.0 * coslat - 8.0
    hours = np.arange(0.0, 31 * 86400.0, 3600.0)
    day_frac = hours / 86400.0
    sw = (900.0 * coslat[None, :]
          * np.maximum(0.0, np.sin(2 * np.pi * (day_frac[:, None] - 0.25))))
    ta = T_mean[None, :] + 6.0 * np.sin(2 * np.pi * (day_frac[:, None] - 0.3))
    forcing = tt.TimeSeriesInputSource(
        times=hours, series={"surface_shortwave_down": sw.astype(np.float32),
                             "air_temperature": ta.astype(np.float32)})
    static = tt.FieldInputSource(fields={"surface_longwave_down": 330.0,
                                         "rainfall": 4.0e-8, "windspeed": 3.0})
    sim = tt.initialize(
        model, tt.ForwardEuler(dt=600.0),
        initializers={"temperature": lambda x, z: T_mean[None, :] + 0.0 * z,
                      "saturation_water_ice": 0.6,
                      "carbon_vegetation": 2.0,
                      "vegetation_area_fraction": 0.5},
        input_sources=(forcing, static),
    )
    steps = 1440  # 10 simulated days at dt=600
    roll = sim._rollout_fn(steps)
    med, comp, _ = _time_blocks(roll, sim.state, 600.0,
                                lambda s: s.prognostic["internal_energy"])
    # block 640 won the round-4 coupled sweep (410.9M vs 400.7M at 512;
    # 768:406.3, 896:400.9, 1024/2048 slower — /tmp sweep logs, PARITY.md)
    med, path = _best_of_fused(sim, steps, 600.0, med, block=640,
                               xy_rank2_first=True)
    _emit("land_coupled_n145", grid.cells, steps, med, comp, 600.0,
          {"land_cells": int(grid.n_land), "nz": 20, "rollout_path": path})


def config5_grad_n145(tt):
    import jax
    import jax.numpy as jnp

    from terrarium_tpu.timesteppers.autodiff import make_rollout_fn

    grid = _ring_grid(145, 20, tt)
    steps = 288

    def mean_final_temperature(k_mineral):
        tp = tt.SoilThermalProperties(
            conductivities=tt.SoilThermalConductivities(mineral=k_mineral))
        soil = tt.SoilEnergyWaterCarbon(
            energy=tt.SoilEnergyBalance(thermal_properties=tp))
        model = tt.SoilModel(grid=grid, soil=soil)
        sim = tt.initialize(
            model, tt.ForwardEuler(),
            initializers={"temperature": -1.0, "saturation_water_ice": 0.8},
            boundary_conditions=tt.PrescribedSurfaceTemperature(4.0))
        roll = make_rollout_fn(sim.model, sim.timestepper, sim.ctx, (),
                               steps=steps, remat=True)
        out = roll(sim.state, 300.0)
        return jnp.mean(out.temperature)

    vg = jax.jit(jax.value_and_grad(mean_final_temperature))
    t0 = time.perf_counter()
    v, g = vg(3.8)
    float(v), float(g)
    comp = time.perf_counter() - t0
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        v, g = vg(3.8)
        float(v), float(g)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    _emit("grad_n145_heat", grid.cells, steps, med, comp, 300.0,
          {"land_cells": int(grid.n_land), "includes": "forward+backward",
           "dT_dk_mineral": round(float(g), 6)})


def config6_grad_n145_coupled(tt):
    """BASELINE config #5 at full coupling: gradient through the COUPLED
    heat + Richards N145 rollout (fwd+bwd), parameter = log saturated
    hydraulic conductivity, objective mixing both prognostic families.
    Includes a central-difference cross-check at reduced size (VERDICT r2
    item 9)."""
    import jax
    import jax.numpy as jnp

    from terrarium_tpu.timesteppers.autodiff import make_rollout_fn

    def model_fn_for(grid):
        def model_fn(log_ksat):
            props = tt.ConstantSoilHydraulics(
                sat_hydraulic_cond=jnp.exp(log_ksat),
                swrc=tt.VanGenuchten(alpha=2.0, n=2.0),
                unsat_hydraulic_cond=tt.UnsatKVanGenuchten())
            soil = tt.SoilEnergyWaterCarbon(hydrology=tt.SoilHydrology(
                vertical_flow=tt.RichardsEq(), hydraulic_properties=props))
            return tt.SoilModel(grid=grid, soil=soil)
        return model_fn

    def sim_for(model):
        return tt.initialize(
            model, tt.ForwardEuler(),
            initializers={
                "temperature": -1.0,
                "saturation_water_ice": lambda x, z: np.minimum(
                    1.0, 0.6 - 0.04 * z)},
            boundary_conditions=tt.PrescribedSurfaceTemperature(4.0))

    def make_loss(grid, steps, dt, fused=False):
        model_fn = model_fn_for(grid)

        def loss(log_ksat):
            sim = sim_for(model_fn(log_ksat))
            if fused:
                # r5: fused Pallas forward + fused segment-VJP backward
                # (`ops/fused_vjp` — the whole reverse sweep in VMEM);
                # unrolled outer segments (beat the scan by ~4%).
                # Attribution vs the 90M target: experiments/
                # ab_grad_attrib.py + docs/performance.md (the in-kernel
                # transpose alone exceeds that budget on this chip).
                from terrarium_tpu.timesteppers.fused_grad import (
                    make_fused_grad_rollout)

                roll = make_fused_grad_rollout(
                    model_fn, sim.timestepper, sim.ctx, (), steps=steps,
                    dt=dt, inner_steps=48, block_cells=512, bwd="pallas",
                    unroll_outer=True)
                out = roll(sim.state, log_ksat)
            else:
                # round-4 path: lean-carry per-step remat (won the r4 A/B;
                # experiments/ab_backward.py)
                roll = make_rollout_fn(sim.model, sim.timestepper, sim.ctx,
                                       (), steps=steps, remat=True,
                                       lean=True)
                out = roll(sim.state, dt)
            return (jnp.mean(out.temperature)
                    + jnp.mean(out.saturation_water_ice))
        return loss

    # finite-difference cross-check at reduced size (64 columns, nz=10)
    small = tt.ColumnGrid.of(cells=64, spacing=tt.ExponentialSpacing(N=10),
                             nf=np.float32)
    loss_s = make_loss(small, steps=48, dt=300.0)
    x0, h = float(np.log(1e-5)), 0.02
    g_ad = float(jax.jit(jax.grad(loss_s))(x0))
    f_p = float(jax.jit(loss_s)(x0 + h))
    f_m = float(jax.jit(loss_s)(x0 - h))
    g_fd = (f_p - f_m) / (2 * h)
    fd_rel_err = abs(g_ad - g_fd) / max(abs(g_fd), 1e-12)

    grid = _ring_grid(145, 20, tt)
    steps = 288
    results = {}
    for name, fused in (("fused_pallas_bwd", True), ("xla_lean_remat", False)):
        try:
            vg = jax.jit(jax.value_and_grad(
                make_loss(grid, steps, 300.0, fused=fused)))
            t0 = time.perf_counter()
            v, g = vg(x0)
            float(v), float(g)
            comp = time.perf_counter() - t0
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                v, g = vg(x0)
                float(v), float(g)
                times.append(time.perf_counter() - t0)
            results[name] = (float(np.median(times)), comp, float(g))
        except Exception:
            continue
    path, (med, comp, g) = min(results.items(), key=lambda kv: kv[1][0])
    _emit("grad_n145_heat_richards", grid.cells, steps, med, comp, 300.0,
          {"land_cells": int(grid.n_land), "includes": "forward+backward",
           "param": "log_K_sat", "dloss_dlogksat": round(g, 6),
           "fd_rel_err_reduced": round(fd_rel_err, 5),
           "grad_path": path,
           "both_M": {k: round(grid.cells * steps / v[0] / 1e6, 1)
                      for k, v in results.items()}})


def config7_heun_n145(tt):
    """Heun (2nd-order) on the headline N145 heat+Richards workload with
    time-varying forcing — exercises the predictor/corrector staging and the
    input re-update at t+dt inside the lean scan (VERDICT r2 weak #7)."""
    cells = _n145_cells()
    grid = tt.ColumnGrid.of(cells=cells, spacing=tt.ExponentialSpacing(N=30),
                            nf=np.float32)
    hydrology = tt.SoilHydrology(
        vertical_flow=tt.RichardsEq(),
        hydraulic_properties=tt.ConstantSoilHydraulics(
            swrc=tt.VanGenuchten(alpha=2.0, n=2.0),
            unsat_hydraulic_cond=tt.UnsatKVanGenuchten()))
    model = tt.SoilModel(grid=grid,
                         soil=tt.SoilEnergyWaterCarbon(hydrology=hydrology))
    hours = np.arange(0.0, 31 * 86400.0, 3600.0)
    ts = (5.0 * np.sin(2 * np.pi * hours[:, None] / 86400.0)
          * np.ones((1, cells))).astype(np.float32)
    forcing = tt.TimeSeriesInputSource(times=hours,
                                       series={"surface_temperature": ts})
    sim = tt.initialize(
        model, tt.Heun(dt=60.0),
        initializers={
            "temperature": lambda x, z: 1.0 + 0.0 * z,
            "saturation_water_ice": lambda x, z: np.minimum(1.0, 0.5 - 0.05 * z),
        },
        boundary_conditions=tt.PrescribedSurfaceTemperature("surface_temperature"),
        input_sources=(forcing,),
    )
    steps = 2880  # 2 simulated days at dt=60 (Heun does 2 stages/step)
    roll = sim._rollout_fn(steps)
    med, comp, _ = _time_blocks(roll, sim.state, 60.0,
                                lambda s: s.prognostic["internal_energy"])
    # Heun's in-kernel body is 2 stages -> halve inner_steps for compile
    med, path = _best_of_fused(sim, steps, 60.0, med, inner=72)
    _emit("heun_n145_heat_richards_forcing", cells, steps, med, comp, 60.0,
          {"stages_per_step": 2, "rollout_path": path})


CONFIGS = {
    "1": config1_column_heat, "2": config2_implicit,
    "3": config3_global_heat_n72, "4": config4_land_coupled_n145,
    "5": config5_grad_n145, "6": config6_grad_n145_coupled,
    "7": config7_heun_n145,
}


def main():
    import sys

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    import terrarium_tpu as tt

    picks = sys.argv[1:] or ["1", "2", "3", "4", "5", "6", "7"]
    for fn in (CONFIGS[p] for p in picks):
        try:
            fn(tt)
        except Exception as e:  # keep the suite going; report the failure
            print(json.dumps({"config": fn.__name__, "error": repr(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
