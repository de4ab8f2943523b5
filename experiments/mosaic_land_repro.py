"""Minimal repro: Mosaic compiler CHECK-crash on the fused coupled LandModel.

Compiling the fused lean rollout of a `LandModel` (soil + SEB + surface
hydrology + flux-BC coupling) on the axon backend aborts inside the Mosaic
compiler (signal 6):

    F layout.h:320] Check failed: arr.size() >= layout_rank(implicit_dim) (1 vs. 2)

Round-3 bisect (each variant run standalone on the chip, block 512 /
inner 144):

| kernel | result |
|---|---|
| SoilModel heat+Richards, ColumnGrid nz=30 | OK (455 M cells*steps/s) |
| + uniform time-series forcing windows | OK (445 M) |
| SoilModel heat-only, ColumnRingGrid N72 nz=30 + forcing | OK (1.02 B) |
| Heun 2-stage kernel, inner 72 | OK (267 M) |
| SurfaceEnergyModel (SEB alone), nz=20 | OK |
| SoilModel + input-variable GroundHeatFlux BC, nz=20 | OK |
| LandModel WITHOUT vegetation (soil+SEB+surface hydrology) | CRASH |
| LandModel WITH vegetation | CRASH |

=> the trigger is in the SURFACE HYDROLOGY trace (bare-ground ET +
DirectSurfaceRunoff + the ET-sink/infiltration coupling), not vegetation,
not the SEB, not the BC machinery, not the ring grid. Rewriting the one
float-by-bool multiply (`infil * unsaturated` -> `where`) did NOT resolve
it, so the bad layout comes from something subtler in this combination
(candidates: the SEB ground-temperature top-row view feeding XY math, or
the ET sink row-mask interaction). The interpret-mode
Pallas path runs the identical trace bit-correctly
(tests/test_fused_step.py::test_fused_lean_rollout_coupled_land_model), so
this is a Mosaic layout-inference bug, not a tracing bug. `Simulation`
falls back to the XLA lean scan automatically (`bench_configs._best_of_fused`).

Run: python experiments/mosaic_land_repro.py   (expect the compiler abort)
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
