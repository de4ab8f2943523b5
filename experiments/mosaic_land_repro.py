"""Mosaic compiler CHECK-crash repro: fused coupled LandModel, rank-1 XY.

STATUS (round 4): **dodged in production** — `fused_xy_rank2=True` keeps XY
leaves rank-2 `(1, block)` in-kernel and the coupled kernel compiles and
runs (410.9 M cells*steps/s at block 640, BENCH_CONFIGS_r04.jsonl). This
script still compiles the RANK-1 layout, which aborts the compiler:

    F layout.h:320] Check failed: arr.size() >= layout_rank(implicit_dim) (1 vs. 2)

Keep running it on toolchain updates: when it stops crashing, the rank-1
layout can be re-benchmarked against the rank-2 dodge.

Round-4 op-level bisect (experiments/mosaic_bisect_land_r4.py, 7 ladders,
~30 on-chip probes): NO single op triggers the crash — row-extraction ops,
coupling BCs, ET, runoff, transcendental flux math, the skin formula,
broadcast/astype, input reads, aux writes, and double carried-leaf updates
all compile in isolation; a fully LINEAR two-sweep SEB stand-in still
crashes. Layout inference fails on the compound graph.

Round-3 model-level table (each variant standalone, block 512/inner 144):

| kernel | result |
|---|---|
| SoilModel heat+Richards, ColumnGrid nz=30 | OK (455 M cells*steps/s) |
| + uniform time-series forcing windows | OK (445 M) |
| SoilModel heat-only, ColumnRingGrid N72 nz=30 + forcing | OK (1.02 B) |
| Heun 2-stage kernel, inner 72 | OK (267 M) |
| SurfaceEnergyModel (SEB alone), nz=20 | OK |
| SoilModel + input-variable GroundHeatFlux BC, nz=20 | OK |
| LandModel (with or without vegetation), rank-1 XY | CRASH |
| LandModel, rank-2 XY (`fused_xy_rank2`) | OK (round 4) |

Run: python experiments/mosaic_land_repro.py   (expect the compiler abort
while the toolchain bug persists)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import terrarium_tpu as tt

    cells = 4096
    grid = tt.ColumnGrid.of(cells=cells, spacing=tt.ExponentialSpacing(N=20),
                            nf=np.float32)
    soil = tt.SoilEnergyWaterCarbon(
        strat=tt.HomogeneousStratigraphy(texture=tt.SoilTexture.preset("loam")),
        hydrology=tt.SoilHydrology(vertical_flow=tt.RichardsEq()),
    )
    model = tt.LandModel(grid=grid, vegetation=None, soil=soil)
    static = tt.FieldInputSource(fields={
        "surface_longwave_down": 330.0, "rainfall": 4.0e-8, "windspeed": 3.0,
        "surface_shortwave_down": 300.0, "air_temperature": 10.0})
    sim = tt.initialize(model, tt.ForwardEuler(dt=600.0),
                        initializers={"temperature": 5.0,
                                      "saturation_water_ice": 0.6},
                        input_sources=(static,))
    sim.fused_inner_steps, sim.fused_block_cells = 144, 512
    roll = sim._rollout_fn(1440)
    t0 = time.perf_counter()
    s = roll(sim.state, 600.0)
    v = float(np.asarray(jax.numpy.sum(s.prognostic["internal_energy"])))
    print("compiled+ran (bug fixed?):", round(time.perf_counter() - t0, 1),
          "finite:", np.isfinite(v))


if __name__ == "__main__":
    main()
