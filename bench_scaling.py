"""Scaling-efficiency benchmark over a device mesh.

BASELINE asks for >= 90% grid-points/s scaling efficiency at 2+ hosts. Real
multi-chip hardware is not available in this environment, so this harness
measures the *methodology* on a virtual CPU mesh (``--devices N`` forces
``xla_force_host_platform_device_count``). NOTE virtual devices share the
host's physical cores, so CPU weak-scaling efficiency is bounded by total
host throughput and does NOT reflect TPU ICI scaling — the per-column step
is collective-free (see tests/test_sharding.py), so on a real pod slice
(run unchanged, drop ``--cpu``) the only efficiency losses are I/O and
diagnostics reductions.

Prints one JSON line per mesh size and a final efficiency summary.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--cpu", action="store_true", default=True)
    ap.add_argument("--cells-per-device", type=int, default=8192)
    ap.add_argument("--nz", type=int, default=30)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    if args.cpu:
        import os

        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={args.devices}")

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import terrarium_tpu as tt
    from terrarium_tpu.parallel.sharding import cell_mesh, shard_state
    from terrarium_tpu.timesteppers.autodiff import make_rollout_fn

    def build(cells):
        grid = tt.ColumnGrid.of(cells=cells,
                                spacing=tt.ExponentialSpacing(N=args.nz),
                                nf=np.float32)
        props = tt.ConstantSoilHydraulics(
            swrc=tt.VanGenuchten(alpha=2.0, n=2.0),
            unsat_hydraulic_cond=tt.UnsatKVanGenuchten())
        soil = tt.SoilEnergyWaterCarbon(
            hydrology=tt.SoilHydrology(vertical_flow=tt.RichardsEq(),
                                       hydraulic_properties=props))
        model = tt.SoilModel(grid=grid, soil=soil)
        return tt.initialize(
            model, tt.ForwardEuler(),
            initializers={"temperature": lambda x, z: 1.0 + 0.0 * z,
                          "saturation_water_ice": lambda x, z: np.minimum(1.0, 0.5 - 0.05 * z)},
            boundary_conditions=tt.PrescribedSurfaceTemperature(5.0))

    results = {}
    all_devices = jax.devices()
    for n_dev in sorted({1, 2, max(1, args.devices // 2), args.devices}):
        if n_dev > len(all_devices):
            continue
        # weak scaling: cells proportional to devices
        cells = args.cells_per_device * n_dev
        sim = build(cells)
        mesh = cell_mesh(all_devices[:n_dev])
        state = shard_state(sim.state, mesh)
        roll = jax.jit(make_rollout_fn(sim.model, sim.timestepper, sim.ctx,
                                       sim.input_sources, steps=args.steps))
        # warmup/compile
        state = roll(state, 60.0)
        float(np.asarray(jax.numpy.sum(state.prognostic["internal_energy"])))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            state = roll(state, 60.0)
            float(np.asarray(jax.numpy.sum(state.prognostic["internal_energy"])))
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        rate = cells * args.steps / med
        results[n_dev] = rate
        print(json.dumps({"devices": n_dev, "cells": cells,
                          "cell_steps_per_s": round(rate, 1),
                          "s_per_block": round(med, 4)}))

    base = results[min(results)]
    summary = {
        f"{n}dev_efficiency": round(rate / (base * n / min(results)), 3)
        for n, rate in results.items()}
    print(json.dumps({"metric": "weak_scaling_efficiency",
                      "note": "virtual devices share host cores; see "
                              "sharding_overhead below for the meaningful "
                              "virtual-mesh number", **summary}))

    # The measurable virtual-mesh quantity: SPMD partitioning overhead at
    # constant compute resources — same total cells, sharded over the full
    # mesh vs unsharded on one device (same host cores either way). On a
    # real pod slice each device is physical and the collective-free step
    # makes weak scaling track this number instead.
    import os

    cells = args.cells_per_device * args.devices
    sim = build(cells)
    roll = jax.jit(make_rollout_fn(sim.model, sim.timestepper, sim.ctx,
                                   sim.input_sources, steps=args.steps))

    def timed(state):
        state = roll(state, 60.0)
        float(np.asarray(jax.numpy.sum(state.prognostic["internal_energy"])))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            state = roll(state, 60.0)
            float(np.asarray(jax.numpy.sum(
                state.prognostic["internal_energy"])))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    t_unsharded = timed(sim.state)
    t_sharded = timed(shard_state(sim.state, cell_mesh(all_devices)))
    print(json.dumps({
        "metric": "sharding_overhead_constant_compute",
        "cells": cells, "devices": args.devices,
        "host_cpus": os.cpu_count(),
        "t_unsharded_s": round(t_unsharded, 4),
        "t_sharded_s": round(t_sharded, 4),
        "sharded_over_unsharded": round(t_sharded / t_unsharded, 3)}))

    # the fused PRODUCTION path under the mesh (round 4): the same
    # constant-compute comparison through `make_sharded_fused_rollout`
    # (shard_map; interpret-mode kernels on CPU) vs the unsharded fused
    # rollout — the number a real pod's weak scaling tracks for the
    # fused path (collective-free by construction, test_sharding.py)
    from terrarium_tpu.ops.fused_step import make_fused_lean_rollout
    from terrarium_tpu.parallel.sharding import make_sharded_fused_rollout

    inner = args.steps
    fused1 = make_fused_lean_rollout(
        sim.model, sim.timestepper, sim.ctx, sim.input_sources,
        dt=60.0, inner_steps=inner, block_cells=512)
    fusedN = make_sharded_fused_rollout(
        sim.model, sim.timestepper, sim.ctx, sim.input_sources,
        mesh=cell_mesh(all_devices), dt=60.0, inner_steps=inner,
        block_cells=512)

    def timed_fused(fn, state):
        r = jax.jit(lambda s: fn(s, args.steps, ()))
        state = r(state)
        float(np.asarray(jax.numpy.sum(state.prognostic["internal_energy"])))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            state = r(state)
            float(np.asarray(jax.numpy.sum(
                state.prognostic["internal_energy"])))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    tf1 = timed_fused(fused1, sim.state)
    tfN = timed_fused(fusedN, shard_state(sim.state, cell_mesh(all_devices)))
    print(json.dumps({
        "metric": "fused_shardmap_overhead_constant_compute",
        "cells": cells, "devices": args.devices,
        "t_unsharded_s": round(tf1, 4), "t_sharded_s": round(tfN, 4),
        "sharded_over_unsharded": round(tfN / tf1, 3)}))


if __name__ == "__main__":
    main()
