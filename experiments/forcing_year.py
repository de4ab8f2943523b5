"""Hourly-year ERA5-scale forcing through the chunked pipeline (r5 item 5).

The production regime SURVEY hard-part #5 names: an hourly (8761, cells)
surface-temperature series for the N145 heat+Richards year protocol —
~2 GB/var at f32, too large to ship as a jit constant or hold per-run in
HBM alongside everything else — streamed from a lazy host provider through
`io/forcing_pipeline.run_fused`: fixed 170-slice windows (one week of
coverage, ~39 MB) enter the ONE compiled fused rollout as shifted-origin
arguments; the next window's transfer overlaps the chunk's compute.

Measures, in ONE process:
* ``resident_week``   — the SAME fused windowed rollout with one week of
                        the series device-resident (no streaming): the
                        zero-overhead reference with identical kernel shape
* ``streamed_fused``  — the full-year series streamed from the lazy host
                        provider through `run_fused`
* ``streamed_xla``    — the round-2 per-step-scan pipeline (`run`), for
                        contrast
* a full simulated year on the streamed-fused path (SYPD, finiteness).

Writes FORCING_r05.json. Run: python experiments/forcing_year.py [--quick]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DT = 60.0
YEAR_S = 365 * 86400.0


def main(quick=False):
    import jax

    if os.environ.get("YEAR_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    import terrarium_tpu as tt
    from terrarium_tpu.io.forcing_pipeline import ChunkedForcingPipeline

    mask, _, _ = tt.load_land_mask(
        "/root/reference/inputs/era5-land_land_sea_mask_N145.nc")
    ring = tt.full_gaussian_grid(145)
    grid = tt.ColumnRingGrid.create(ring, mask,
                                    spacing=tt.ExponentialSpacing(N=30),
                                    nf=np.float32, pad_multiple=8)
    cells = grid.cells
    lat = np.asarray(grid.cell_lats, dtype=np.float64)
    T_mean = (25.0 * np.maximum(np.cos(np.deg2rad(lat)), 0.05) - 5.0
              ).astype(np.float32)
    sgn = np.sign(lat).astype(np.float32)

    hours = np.arange(0.0, YEAR_S + 7 * 86400.0, 3600.0)  # year + margin

    def provider(i0, i1):
        """Lazy hourly surface temperature: latitudinal mean + annual +
        diurnal cycles. Never materializes the full (8929, cells) array."""
        t = hours[i0:i1].astype(np.float32)[:, None]
        ann = np.sin(2 * np.pi * t / YEAR_S)
        day = np.sin(2 * np.pi * t / 86400.0)
        return T_mean[None, :] + 10.0 * sgn[None, :] * ann + 8.0 * day

    full_bytes = hours.size * cells * 4
    pipe = ChunkedForcingPipeline(times=hours,
                                  series={"surface_temperature": provider},
                                  window=170)

    def build(streamed):
        """Same model + BC structure either way; the baseline holds ONE
        WEEK of the hourly series device-resident (a TimeSeriesInputSource
        through the same fused in-kernel windows — ~39 MB), the streamed
        variant pulls the full-year series from the host provider. The
        fused kernel shape is identical, so the difference is pure
        streaming overhead."""
        model = tt.SoilModel(grid=grid, initializer=tt.SoilInitializer())
        bc = tt.PrescribedSurfaceTemperature("surface_temperature")
        if streamed:
            srcs = (pipe,)
        else:
            week = tt.TimeSeriesInputSource(
                times=hours[:170], series={"surface_temperature":
                                           provider(0, 170)})
            srcs = (week,)
        sim = tt.initialize(model, tt.ForwardEuler(dt=DT),
                            boundary_conditions=bc, input_sources=srcs)
        sim.fused_inner_steps, sim.fused_block_cells = 144, 512
        return sim

    block_steps = 1440 if quick else 10080  # 1 day / 1 week per timed block
    out = {"cells": cells, "land_cells": int(grid.n_land), "dt": DT,
           "series_bytes_per_var": full_bytes,
           "window_slices": 170,
           "window_bytes": 170 * cells * 4}

    def timed_blocks(fn, reps=3):
        fn()  # compile/warm
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    # resident-week fused baseline
    sim_a = build(streamed=False)
    roll = sim_a._rollout_fn(block_steps)

    def run_resident():
        sim_a.state = roll(sim_a.state, DT)
        np.asarray(sim_a.state.prognostic["internal_energy"][:1, :1])

    med = timed_blocks(run_resident)
    out["resident_week_M"] = round(cells * block_steps / med / 1e6, 1)

    # streamed fused
    sim_s = build(streamed=True)

    def run_streamed():
        pipe.run_fused(sim_s, steps=block_steps, dt=DT)
        np.asarray(sim_s.state.prognostic["internal_energy"][:1, :1])

    med_s = timed_blocks(run_streamed)
    out["streamed_fused_M"] = round(cells * block_steps / med_s / 1e6, 1)
    out["streaming_overhead_pct"] = round(100.0 * (med_s / med - 1.0), 1)

    # per-step-scan pipeline (round-2 path) for contrast, shorter block
    sim_x = build(streamed=True)
    xb = max(288, block_steps // 7)

    def run_xla():
        pipe.run(sim_x, steps=xb, dt=DT)
        np.asarray(sim_x.state.prognostic["internal_energy"][:1, :1])

    med_x = timed_blocks(run_xla, reps=2)
    out["streamed_xla_M"] = round(cells * xb / med_x / 1e6, 1)
    print(json.dumps(out), flush=True)

    # full streamed year (continue sim_s to 1 simulated year)
    if not quick:
        done = int(round(float(sim_s.state.clock.time) / DT))
        remaining = 525600 - done
        remaining -= remaining % 144
        t0 = time.perf_counter()
        pipe.run_fused(sim_s, steps=remaining, dt=DT)
        T = np.asarray(sim_s.state.temperature)
        wall = time.perf_counter() - t0
        sim_years = float(sim_s.state.clock.time) / YEAR_S
        out["year"] = {
            "steps_total": done + remaining,
            "wall_s_remaining": round(wall, 1),
            "sypd_streamed": round(
                (remaining * DT / YEAR_S) / (wall / 86400.0), 1),
            "finite": bool(np.all(np.isfinite(T))),
            "T_range": [float(T.min()), float(T.max())],
        }
        print(json.dumps(out["year"]), flush=True)

    with open("/root/repo/FORCING_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote FORCING_r05.json")


if __name__ == "__main__":
    main(quick="--quick" in sys.argv)
