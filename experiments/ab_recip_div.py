"""Coordinate-division strength reduction A/B (r5 roofline follow-up).

KERNELS_r05 prices div at 341 G/s vs mul 937 G/s and the census counts
~390 full-tile divisions/cell*step, most by grid-coordinate columns. On
the XLA path coordinates are trace constants and XLA already canonicalizes
those divides (flag A/B is bit-identical on CPU); inside the fused kernel
the coordinates are TRACED INPUTS, so the divides are real. The
``RECIP_COORD_DIV`` flag computes the (Nz, 1) reciprocal once (512x fewer
lanes) and multiplies.

Headline workload, fused 512x144, one process, drift-checked.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    import terrarium_tpu as tt
    from terrarium_tpu.ops import vertical_ops as vo
    from terrarium_tpu.ops.fused_step import make_fused_lean_rollout

    cells, steps, dt = 24576, 5760, 60.0
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
        model, tt.ForwardEuler(dt=dt),
        initializers={
            "temperature": lambda x, z: 1.0 + 0.0 * z,
            "saturation_water_ice": lambda x, z: np.minimum(1.0, 0.5 - 0.05 * z)},
        boundary_conditions=tt.PrescribedSurfaceTemperature(
            lambda t: 5.0 * jax.numpy.sin(2 * jax.numpy.pi * t / 86400.0)))

    for flag in (False, True, False):
        try:
            vo.RECIP_COORD_DIV = flag
            fused = make_fused_lean_rollout(sim.model, sim.timestepper,
                                            sim.ctx, (), dt=dt,
                                            inner_steps=144, block_cells=512)
            roll = jax.jit(lambda s: fused(s, steps))
            st = roll(sim.state)
            float(np.asarray(st.prognostic["internal_energy"][:1, :1]))
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                st = roll(st)
                float(np.asarray(st.prognostic["internal_energy"][:1, :1]))
                times.append(time.perf_counter() - t0)
            med = float(np.median(times))
            print(json.dumps({"recip": flag, "median_s": round(med, 3),
                              "mcells_steps_per_s": round(
                                  cells * steps / med / 1e6, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"recip": flag,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
        finally:
            vo.RECIP_COORD_DIV = False


if __name__ == "__main__":
    main()
