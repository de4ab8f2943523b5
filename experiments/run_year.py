"""The 1-simulated-year protocol (BASELINE parity target; r5 items 4/8/9).

Reproduces the reference benchmark/parity protocol on the real chip:
SoilModel heat + RichardsEq, N145 ERA5-land masked Gaussian grid, Nz=30
ExponentialSpacing, Float32, dt=60 s, annual-cycle surface temperature BC
``T_ub(t) = 30 sin(2 pi t / (365*24*3600))``
(`/root/reference/test/benchmarks/gpu/soil_heat_hydrology_global.jl:39-58`),
run for 525,600 steps = 1 simulated year. Sections:

1. soil year on the fused Pallas path — throughput, per-chunk records,
   end-state golden + checksums (`tests/goldens/year_n145_endstate.npz`);
2. EXACT water/energy budget years (`diagnostics/budget.ExactBudget`:
   per-step in-rollout rate accumulation, sampling-independent) — parity
   mode (residual quantifies the saturation-clamp creation) AND the
   ``deficit_pool`` corrected mode (must close to <=1e-3 of inventory);
3. coupled LandModel year on the FUSED kernel path (xy_rank2 auto) with
   golden + checksums, plus a 30-day exact-budget closure assessment of
   the ``consistent()`` composition.

Emits ``YEAR_r05.json``. Run: python experiments/run_year.py [--quick]
(--quick = 2 simulated days for harness validation; does not overwrite the
year artifacts)
"""
from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

YEAR_STEPS = 365 * 24 * 60  # dt=60 -> 525,600
DT = 60.0
CHUNK = 1440  # 1 simulated day per chunk: daily budget sampling
# (36.5-day sampling could not integrate the spiky post-init boundary
# transients; measured 83x energy-flux integral error at 10 samples/yr)


def _sha(arr):
    return hashlib.sha256(np.ascontiguousarray(arr).tobytes()).hexdigest()[:16]


def build_sim(tt, np_, deficit_pool=False):
    """EXACTLY the parity-harness protocol configuration — single source of
    truth, so the year artifact and `parity_vs_reference.py` compare the
    same model (reference `soil_heat_hydrology_global.jl:39-58`: default
    SoilHydrology hydraulics, SoilInitializer defaults, annual-cycle BC).
    ``deficit_pool`` switches on the corrected clamp mode (r5 item 9) for
    the exact-budget assessment; the parity/golden runs keep it off."""
    from parity_vs_reference import build_sim as parity_build

    sim, _ = parity_build(
        "/root/reference/inputs/era5-land_land_sea_mask_N145.nc", dt=DT,
        deficit_pool=deficit_pool)
    return sim


def build_coupled_sim(tt, np_):
    """Reduced-dt coupled LandModel year: bare-ground surface schemes over
    the same N145 mask, daily-resolution annual forcing cycle (lat-dependent
    air temperature + shortwave) as a (366, cells) TimeSeriesInputSource
    (~70 MB device-resident — hourly would not fit HBM; the forcing pipeline
    covers that regime, io/forcing_pipeline.py)."""
    mask, _, _ = tt.load_land_mask(
        "/root/reference/inputs/era5-land_land_sea_mask_N145.nc")
    ring = tt.full_gaussian_grid(145)
    grid = tt.ColumnRingGrid.create(ring, mask,
                                    spacing=tt.ExponentialSpacing(N=20),
                                    nf=np_.float32, pad_multiple=8)
    soil = tt.SoilEnergyWaterCarbon(
        strat=tt.HomogeneousStratigraphy(
            texture=tt.SoilTexture.preset("loam")),
        hydrology=tt.SoilHydrology(vertical_flow=tt.RichardsEq()))
    # year-scale coupled runs REQUIRE the consistent production modes: the
    # reference's parity semantics overdraw soil water ~773x (ET humidity
    # flux applied as a volume flux) and feed turbulent losses back into the
    # ground with the wrong sign — both documented deviations (README); a
    # parity-mode coupled year drains the column and blows up the skin
    # temperature (measured: sat -> 0, Ts -> 600 degC in 2 days).
    from terrarium_tpu.processes.surface_hydrology.surface_hydrology import (
        BareGroundEvaporation, DirectSurfaceRunoff, NoCanopyInterception,
        SurfaceHydrology)

    sh = SurfaceHydrology(
        canopy_interception=NoCanopyInterception(),
        evapotranspiration=BareGroundEvaporation.consistent_units(),
        surface_runoff=DirectSurfaceRunoff.consistent())
    model = tt.LandModel(grid=grid, vegetation=None, soil=soil,
                         surface_hydrology=sh,
                         surface_energy_balance=tt.SurfaceEnergyBalance.consistent())
    lat = np.asarray(grid.cell_lats, dtype=np.float64)
    T_mean = 25.0 * np.maximum(np.cos(np.deg2rad(lat)), 0.05) - 5.0
    days = np.arange(366.0)
    ann = np.sin(2.0 * np.pi * days / 365.0)[:, None]
    ta = (T_mean[None, :] + 10.0 * ann * np.sign(lat)[None, :]
          ).astype(np.float32)
    sw = (150.0 + 120.0 * np.maximum(np.cos(np.deg2rad(lat)), 0.0)[None, :]
          * (1.0 + 0.5 * ann * np.sign(lat)[None, :])).astype(np.float32)
    forcing = tt.TimeSeriesInputSource(
        times=days * 86400.0,
        series={"air_temperature": ta, "surface_shortwave_down": sw})
    static = tt.FieldInputSource(fields={
        "surface_longwave_down": 330.0, "rainfall": 4.0e-8,
        "windspeed": 3.0, "specific_humidity": 0.006,
        "air_pressure": 101325.0})
    return tt.initialize(
        model, tt.ForwardEuler(dt=600.0),
        initializers={"temperature": 5.0, "saturation_water_ice": 0.6},
        input_sources=(forcing, static))


def run(quick=False):
    import jax

    if os.environ.get("YEAR_FORCE_CPU"):  # harness validation off-chip
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    import terrarium_tpu as tt

    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    with jax.default_device(cpu):
        sim = build_sim(tt, np)
    sim.state = jax.device_put(sim.state, dev)
    if not os.environ.get("YEAR_FORCE_CPU"):
        # interpret-mode Pallas at N145 scale is pathological on CPU; the
        # fused path is chip-only (the XLA lean scan validates off-chip)
        sim.fused_inner_steps, sim.fused_block_cells = 144, 512

    steps = 2 * 1440 if quick else YEAR_STEPS
    chunk = 1440 if quick else CHUNK
    n_chunks = steps // chunk
    assert n_chunks * chunk == steps

    records = []
    t_start = time.perf_counter()
    for i in range(n_chunks):
        t0 = time.perf_counter()
        sim.run(steps=chunk, dt=DT)
        wall = time.perf_counter() - t0
        T = np.asarray(sim.state.temperature)
        sat = np.asarray(sim.state.prognostic["saturation_water_ice"])
        rec = {
            "chunk": i, "wall_s": round(wall, 2),
            "t_sim_days": round(float(sim.state.clock.time) / 86400.0, 2),
            "finite": bool(np.all(np.isfinite(T)) and np.all(np.isfinite(sat))),
            "T_min": float(T.min()), "T_max": float(T.max()),
            "sat_min": float(sat.min()), "sat_max": float(sat.max()),
        }
        records.append(rec)
        if i % 30 == 0 or not rec["finite"]:
            print(json.dumps(rec), flush=True)
        if not rec["finite"]:
            break
    wall_total = time.perf_counter() - t_start

    # uninstrumented throughput: the daily budget callbacks cost ~0.9 s of
    # host round-trip each (0.14 s of chip compute per simulated day), so
    # the instrumented wall time is NOT the production speed — measure the
    # compiled rollout back-to-back without callbacks
    roll = sim._rollout_fn(chunk)
    s = sim.state
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        s = roll(s, DT)
        jax.block_until_ready(s.prognostic["internal_energy"])
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    thr = sim.model.grid.cells * chunk / med
    sypd_clean = (chunk * DT / (365.0 * 86400.0)) / (med / 86400.0)

    cells = sim.model.grid.cells
    sim_years = float(sim.state.clock.time) / (365.0 * 86400.0)
    sypd = sim_years / (wall_total / 86400.0)
    U = np.asarray(sim.state.prognostic["internal_energy"])
    sat = np.asarray(sim.state.prognostic["saturation_water_ice"])
    out = {
        "protocol": "soil_heat_hydrology_global.jl:39-58 annual-cycle BC, "
                    "1 simulated year, N145 ERA5-land mask, Nz=30, f32, dt=60",
        "steps": steps, "dt": DT, "cells": cells,
        "land_cells": int(sim.model.grid.n_land),
        "wall_s": round(wall_total, 1),
        "sypd_instrumented": round(sypd, 2),
        "sypd": round(sypd_clean, 2),
        "cells_steps_per_s_M": round(thr / 1e6, 1),
        "finite": all(r["finite"] for r in records),
        "end_T_range": [records[-1]["T_min"], records[-1]["T_max"]],
        "end_sat_range": [records[-1]["sat_min"], records[-1]["sat_max"]],
        "checksums": {"internal_energy": _sha(U),
                      "saturation_water_ice": _sha(sat)},
        "chunks": records[-3:],
    }

    # --- EXACT budget years (r5 items 8+9): per-step in-rollout rate
    # accumulation -> the closure number is sampling-independent by
    # construction (tests/test_budget.py locks chunk-invariance). Parity
    # mode quantifies the saturation-clamp creation; the deficit_pool
    # corrected mode must close water to <=1e-3 of inventory. ---
    bsteps = 2 * 1440 if quick else YEAR_STEPS
    bchunk = 1440 if quick else YEAR_STEPS // 10
    out["exact_budget"] = {}
    for mode in ("parity", "deficit_pool"):
        with jax.default_device(cpu):
            bsim = build_sim(tt, np, deficit_pool=(mode == "deficit_pool"))
        bsim.state = jax.device_put(bsim.state, dev)
        eb = tt.ExactBudget.start(bsim)
        t0 = time.perf_counter()
        eb.run(bsim, steps=bsteps, dt=DT, chunk=bchunk)
        rep = eb.report(bsim)
        rec = {
            "wall_s": round(time.perf_counter() - t0, 1),
            "water": {k: float(v) for k, v in rep["water"].items()},
            "energy": {k: float(v) for k, v in rep["energy"].items()},
        }
        if mode == "deficit_pool":
            rec["deficit_total_m"] = float(np.sum(np.asarray(
                bsim.state.soil_water_deficit)))
        out["exact_budget"][mode] = rec
        print(json.dumps({mode: rec}), flush=True)
    if not quick:
        assert (out["exact_budget"]["deficit_pool"]["water"]
                ["inventory_relative_residual"] < 1e-3), \
            "corrected year failed to close water"

    # --- reduced-dt coupled LandModel year on the FUSED kernel path
    # (fused_xy_rank2 auto-on for LandModel — the round-4 fix for the
    # Mosaic layout.h crash; block 640 per the coupled sweep) ---
    with jax.default_device(cpu):
        csim = build_coupled_sim(tt, np)
    csim.state = jax.device_put(csim.state, dev)
    csim.input_sources = jax.device_put(csim.input_sources, dev)
    if not os.environ.get("YEAR_FORCE_CPU"):
        csim.fused_inner_steps = 144  # block/xy_rank2 auto -> 640/True
    csteps = 288 if quick else 365 * 144  # dt=600 -> 52,560 = 1 year
    t0 = time.perf_counter()
    csim.run(steps=csteps, dt=600.0)
    cwall = time.perf_counter() - t0
    cT = np.asarray(csim.state.temperature)
    csat = np.asarray(csim.state.prognostic["saturation_water_ice"])
    cskin = np.asarray(csim.state.prognostic["skin_temperature"])
    out["coupled"] = {
        "steps": csteps, "dt": 600.0, "nz": 20,
        "rollout_path": "pallas_fused_640x144_xyr2",
        "wall_s": round(cwall, 1),
        "sypd": round((csteps * 600.0 / (365 * 86400.0))
                      / (cwall / 86400.0), 2),
        "finite": bool(np.all(np.isfinite(cT)) & np.all(np.isfinite(csat))
                       & np.all(np.isfinite(cskin))),
        "T_range": [float(cT.min()), float(cT.max())],
        # sat may exceed 1 by one explicit step's inflow between closure
        # adjustments (~2.75e-4 at dt=600 measured r4): the NEXT step's
        # adjustment spills it; bound it explicitly here
        "sat_range": [float(csat.min()), float(csat.max())],
        "skin_range": [float(cskin.min()), float(cskin.max())],
        "checksums": {"internal_energy": _sha(np.asarray(
            csim.state.prognostic["internal_energy"])),
            "saturation_water_ice": _sha(csat)},
    }
    assert csat.max() < 1.01, "post-step sat overshoot beyond one-step bound"
    print(json.dumps(out["coupled"]), flush=True)

    # 30-day exact-budget closure of the consistent() coupled composition
    with jax.default_device(cpu):
        c2 = build_coupled_sim(tt, np)
    c2.state = jax.device_put(c2.state, dev)
    c2.input_sources = jax.device_put(c2.input_sources, dev)
    ceb = tt.ExactBudget.start(c2)
    cbs = 144 if quick else 30 * 144
    ceb.run(c2, steps=cbs, dt=600.0, chunk=cbs)
    crep = ceb.report(c2)
    out["coupled"]["exact_budget_30d"] = {
        k: {kk: float(vv) for kk, vv in v.items()} for k, v in crep.items()}
    print(json.dumps(out["coupled"]["exact_budget_30d"]), flush=True)

    if not quick:
        with open("/root/repo/YEAR_r05.json", "w") as f:
            json.dump(out, f, indent=1)
        np.savez_compressed(
            "/root/repo/tests/goldens/year_n145_endstate.npz",
            internal_energy=U[:, ::64], saturation_water_ice=sat[:, ::64],
            surface_excess_water=np.asarray(
                sim.state.prognostic["surface_excess_water"])[::64],
            meta_steps=steps, meta_cells=cells)
        np.savez_compressed(
            "/root/repo/tests/goldens/year_coupled_endstate.npz",
            internal_energy=np.asarray(
                csim.state.prognostic["internal_energy"])[:, ::64],
            saturation_water_ice=csat[:, ::64],
            skin_temperature=cskin[::64],
            meta_steps=csteps, meta_cells=csim.model.grid.cells)
        print("wrote YEAR_r05.json + year goldens (soil + coupled)")
    print(json.dumps({k: out[k] for k in
                      ("wall_s", "sypd", "cells_steps_per_s_M", "finite",
                       "checksums") if k in out}))
    return out


if __name__ == "__main__":
    run(quick="--quick" in sys.argv)
