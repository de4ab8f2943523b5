"""Benchmark: global soil heat + Richards water on the N145 land mask.

Reproduces the reference benchmark protocol
(`test/benchmarks/gpu/soil_heat_hydrology_global.jl:39-103`): SoilModel with
heat conduction + Richards hydrology, Nz=30 ExponentialSpacing, dt=60 s,
measuring throughput over the packed land cells of the ERA5-land N145 mask.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Metric: grid-points * steps / second / chip (lateral cells per BASELINE.json).
The reference publishes no numbers (BASELINE.md), so vs_baseline is reported
against the first recorded value of this harness (1.0 on the initial run).
"""
from __future__ import annotations

import json
import time

import numpy as np


def n145_land_cells(default=24572):
    """Count land cells in the shipped ERA5-land N145 mask."""
    try:
        import h5py

        with h5py.File("/root/reference/inputs/era5-land_land_sea_mask_N145.nc", "r") as f:
            lsm = np.asarray(f["lsm"][0])
        return int((lsm > 0.5).sum())
    except Exception:
        return default


def main():
    import jax

    # persistent compilation cache: first run pays the (slow, remote) compile,
    # later runs reuse the executable
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    import terrarium_tpu as tt

    cells = n145_land_cells()
    nz = 30
    dt = 60.0

    grid = tt.ColumnGrid.of(cells=cells, spacing=tt.ExponentialSpacing(N=nz),
                            nf=np.float32)
    hydrology = tt.SoilHydrology(
        vertical_flow=tt.RichardsEq(),
        hydraulic_properties=tt.ConstantSoilHydraulics(
            swrc=tt.VanGenuchten(alpha=2.0, n=2.0),
            unsat_hydraulic_cond=tt.UnsatKVanGenuchten()))
    soil = tt.SoilEnergyWaterCarbon(hydrology=hydrology)
    model = tt.SoilModel(grid=grid, soil=soil)
    sim = tt.initialize(
        model, tt.ForwardEuler(dt=dt),
        initializers={
            "temperature": lambda x, z: 1.0 + 0.0 * z,
            "saturation_water_ice": lambda x, z: np.minimum(1.0, 0.5 - 0.05 * z),
        },
        boundary_conditions=tt.PrescribedSurfaceTemperature(
            lambda t: 5.0 * jax.numpy.sin(2 * jax.numpy.pi * t / 86400.0)),
    )

    # Large timed blocks: dispatch+sync through the remote tunnel costs
    # ~30-40 ms per call (measured, experiments/ab_blocksize.py), so timing
    # single simulated hours (60 steps ~ 0.7 s of compute at production
    # speed) would understate steady-state throughput by ~5x. Production
    # rollouts run exactly like this — one on-device scan per output
    # interval. 5760 steps = 4 simulated days per block.
    steps_per_block = 5760

    def sync(state):
        # force full materialization with a device->host transfer;
        # block_until_ready does not reliably block on the axon backend
        return float(np.asarray(jax.numpy.sum(state.prognostic["internal_energy"])))

    def measure(reps=5):
        roll = sim._rollout_fn(steps_per_block)
        t0 = time.perf_counter()
        sim.state = roll(sim.state, dt)
        sync(sim.state)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sim.state = roll(sim.state, dt)
            sync(sim.state)
            times.append(time.perf_counter() - t0)
        return float(np.median(times)), compile_s

    # XLA lean-scan rollout (the robust default path)
    med_xla, compile_s = measure()

    # Pallas fused lean rollout (VMEM-resident multi-step kernel;
    # experiments/ab_fused_rollout.py picked block 512 / inner 144). Take
    # the better of the two paths, measured back-to-back in this process.
    med = med_xla
    rollout_path = "xla_lean_scan"
    med_fused = None
    try:
        sim.fused_inner_steps, sim.fused_block_cells = 144, 512
        med_fused, _ = measure(reps=3)
        if med_fused < med:
            med, rollout_path = med_fused, "pallas_fused_lean"
    except Exception:
        pass  # fused path is best-effort; the XLA number stands
    finally:
        sim.fused_inner_steps = None
    steps_per_s = steps_per_block / med
    value = cells * steps_per_s  # grid-points * steps / s / chip

    # vs_baseline: the reference publishes no numbers (BASELINE.md), so the
    # baseline is this harness's first recorded value (BENCH_r01.json).
    baseline = 426902796.8

    # SYPD at dt=60s for context (reference harness metric):
    # simulated years per wall-clock day
    sypd = (steps_per_s * dt) / (365.0 * 86400.0) * 86400.0
    assert np.all(np.isfinite(np.asarray(sim.state.temperature)))

    print(json.dumps({
        "metric": "gridpoints_steps_per_s_per_chip_n145_heat_richards",
        "value": round(value, 1),
        "unit": "cells*steps/s",
        "vs_baseline": round(value / baseline, 3),
        "detail": {
            "cells": cells, "nz": nz, "dt_s": dt,
            "steps_per_block": steps_per_block,
            "median_s_per_sim_hour": round(med / (steps_per_block * dt / 3600.0), 4),
            "sypd": round(sypd, 2),
            "compile_s": round(compile_s, 2),
            "backend": jax.devices()[0].platform,
            "rollout_path": rollout_path,
            "xla_M": round(cells * steps_per_block / med_xla / 1e6, 1),
            "fused_M": (round(cells * steps_per_block / med_fused / 1e6, 1)
                        if med_fused else None),
        },
    }))


if __name__ == "__main__":
    main()
