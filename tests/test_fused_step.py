"""Pallas fused-step equivalence (interpret mode).

The fused whole-step kernel (`ops/fused_step.py`) re-traces the SAME pure
step the XLA path uses, so the two must agree to float tolerance. Mosaic
compilation of the kernel hangs the experimental backend's compiler
(CLAUDE.md), so CI validates the kernel in Pallas interpret mode on CPU;
the XLA path remains the production default.
"""
import numpy as np

import terrarium_tpu as tt
from terrarium_tpu.ops.fused_step import make_fused_step


def _sim(cells=96, nz=12):
    grid = tt.ColumnGrid.of(cells=cells, spacing=tt.ExponentialSpacing(N=nz),
                            nf=np.float32)
    props = tt.ConstantSoilHydraulics(
        swrc=tt.VanGenuchten(alpha=2.0, n=2.0),
        unsat_hydraulic_cond=tt.UnsatKVanGenuchten())
    soil = tt.SoilEnergyWaterCarbon(
        hydrology=tt.SoilHydrology(vertical_flow=tt.RichardsEq(),
                                   hydraulic_properties=props))
    model = tt.SoilModel(grid=grid, soil=soil)
    return tt.initialize(
        model, tt.ForwardEuler(dt=60.0),
        initializers={"temperature": lambda x, z: 1.0 + 0.0 * z,
                      "saturation_water_ice":
                          lambda x, z: np.minimum(1.0, 0.5 - 0.05 * z)},
        boundary_conditions=tt.PrescribedSurfaceTemperature(5.0))


def test_fused_step_matches_xla_step():
    sim = _sim()
    fused = make_fused_step(sim.model, sim.timestepper, sim.ctx,
                            sim.input_sources, dt=60.0, block_cells=64,
                            interpret=True)
    state_f = sim.state
    state_x = sim.state
    for _ in range(3):
        state_f = fused(state_f)
        state_x = sim.step_fn(state_x, 60.0)
    for group in ("prognostic", "auxiliary"):
        for name, a in getattr(state_x, group).items():
            b = getattr(state_f, group)[name]
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-6, atol=1e-6,
                err_msg=f"{group}/{name}")
    assert float(state_f.clock.time) == float(state_x.clock.time)


def test_fused_lean_rollout_matches_lean_rollout():
    """`make_fused_lean_rollout` (VMEM-resident multi-step kernel, lean
    carry) must reproduce the XLA lean rollout bit-for-bit in interpret
    mode: same concat-shift trace, same arithmetic, same closure rotation
    (closure o pre_closure_step^n == step^n on the prognostics)."""
    import jax

    from terrarium_tpu.ops.fused_step import make_fused_lean_rollout

    sim = _sim(cells=96, nz=12)
    n = 12
    s_ref = sim._rollout_fn(n)(sim.state, 60.0)

    fused = make_fused_lean_rollout(sim.model, sim.timestepper, sim.ctx,
                                    sim.input_sources, dt=60.0,
                                    inner_steps=4, block_cells=64,
                                    interpret=True)
    s_fus = jax.jit(lambda s: fused(s, n))(sim.state)

    for name in ("internal_energy", "saturation_water_ice",
                 "surface_excess_water"):
        np.testing.assert_array_equal(
            np.asarray(s_fus.prognostic[name]),
            np.asarray(s_ref.prognostic[name]), err_msg=name)
    # closure variables from the trailing closure
    for name in ("temperature", "pressure_head", "liquid_water_fraction"):
        np.testing.assert_array_equal(np.asarray(s_fus[name]),
                                      np.asarray(s_ref[name]), err_msg=name)
    assert float(s_fus.clock.time) == float(s_ref.clock.time)
    assert int(s_fus.clock.iteration) == int(s_ref.clock.iteration)


def test_fused_lean_rollout_with_time_varying_forcing():
    """Round-3 capability: uniformly-spaced `TimeSeriesInputSource` forcing
    inside the fused rollout. Each outer kernel invocation receives an XLA-
    sliced (W, block) window of every series; the kernel interpolates with
    one-hot row masks (`fused_step._WindowSource` — no gathers). Must match
    the XLA lean rollout, which interpolates with searchsorted on the full
    series, to float tolerance across a window boundary AND past the end of
    the series (flat extrapolation)."""
    import jax
    import jax.numpy as jnp

    from terrarium_tpu.ops.fused_step import make_fused_lean_rollout

    cells, nz = 96, 12
    grid = tt.ColumnGrid.of(cells=cells, spacing=tt.ExponentialSpacing(N=nz),
                            nf=np.float32)
    props = tt.ConstantSoilHydraulics(
        swrc=tt.VanGenuchten(alpha=2.0, n=2.0),
        unsat_hydraulic_cond=tt.UnsatKVanGenuchten())
    soil = tt.SoilEnergyWaterCarbon(
        hydrology=tt.SoilHydrology(vertical_flow=tt.RichardsEq(),
                                   hydraulic_properties=props))
    model = tt.SoilModel(grid=grid, soil=soil)
    # hourly forcing covering only part of the rollout (tests extrapolation)
    hours = np.arange(0.0, 5 * 3600.0, 3600.0)
    rng = np.random.default_rng(7)
    ts = (5.0 * np.sin(2 * np.pi * hours[:, None] / 86400.0)
          + rng.normal(0, 0.5, (hours.size, cells))).astype(np.float32)
    forcing = tt.TimeSeriesInputSource(times=hours,
                                       series={"surface_temperature": ts})
    sim = tt.initialize(
        model, tt.ForwardEuler(dt=900.0),
        initializers={"temperature": lambda x, z: 1.0 + 0.0 * z,
                      "saturation_water_ice":
                          lambda x, z: np.minimum(1.0, 0.5 - 0.05 * z)},
        boundary_conditions=tt.PrescribedSurfaceTemperature(
            "surface_temperature"),
        input_sources=(forcing,),
    )
    n = 32  # 8 h at dt=900 -> crosses window boundaries and the series end
    s_ref = sim._rollout_fn(n)(sim.state, 900.0)

    fused = make_fused_lean_rollout(sim.model, sim.timestepper, sim.ctx,
                                    sim.input_sources, dt=900.0,
                                    inner_steps=8, block_cells=64,
                                    interpret=True)
    s_fus = jax.jit(lambda s: fused(s, n))(sim.state)

    for name in ("internal_energy", "saturation_water_ice",
                 "surface_excess_water"):
        np.testing.assert_allclose(
            np.asarray(s_fus.prognostic[name]),
            np.asarray(s_ref.prognostic[name]), rtol=2e-5, atol=1e-6,
            err_msg=name)
    assert float(s_fus.clock.time) == float(s_ref.clock.time)


def test_fused_lean_rollout_rejects_nonuniform_forcing():
    import pytest

    from terrarium_tpu.ops.fused_step import make_fused_lean_rollout

    grid = tt.ColumnGrid.of(cells=8, spacing=tt.ExponentialSpacing(N=4),
                            nf=np.float32)
    model = tt.SoilModel(grid=grid)
    forcing = tt.TimeSeriesInputSource(
        times=np.array([0.0, 3600.0, 5000.0]),
        series={"surface_temperature": np.zeros((3, 8), np.float32)})
    sim = tt.initialize(
        model, tt.ForwardEuler(dt=300.0),
        initializers={"temperature": 1.0, "saturation_water_ice": 0.5},
        boundary_conditions=tt.PrescribedSurfaceTemperature(
            "surface_temperature"),
        input_sources=(forcing,),
    )
    with pytest.raises(ValueError, match="uniform"):
        make_fused_lean_rollout(sim.model, sim.timestepper, sim.ctx,
                                sim.input_sources, dt=300.0, inner_steps=4,
                                block_cells=8, interpret=True)


def test_simulation_fused_path_with_forcing():
    """`Simulation.fused_inner_steps` drives rollouts through the fused
    kernel (interpret mode on CPU), with time-varying sources passed as jit
    pytree ARGUMENTS (not HLO constants); results match the XLA path."""
    cells = 64
    grid = tt.ColumnGrid.of(cells=cells, spacing=tt.ExponentialSpacing(N=8),
                            nf=np.float32)
    model = tt.SoilModel(grid=grid)
    hours = np.arange(0.0, 48 * 3600.0, 3600.0)
    ts = (4.0 * np.sin(2 * np.pi * hours[:, None] / 86400.0)
          * np.ones((1, cells))).astype(np.float32)
    forcing = tt.TimeSeriesInputSource(times=hours,
                                       series={"surface_temperature": ts})

    def build():
        return tt.initialize(
            model, tt.ForwardEuler(dt=900.0),
            initializers={"temperature": -1.0, "saturation_water_ice": 0.8},
            boundary_conditions=tt.PrescribedSurfaceTemperature(
                "surface_temperature"),
            input_sources=(forcing,),
        )

    sim_x = build()
    sim_x.run(period=12 * 3600.0, dt=900.0)

    sim_f = build()
    sim_f.fused_inner_steps, sim_f.fused_block_cells = 16, 64
    sim_f.run(period=12 * 3600.0, dt=900.0)

    np.testing.assert_allclose(
        np.asarray(sim_f.state.temperature),
        np.asarray(sim_x.state.temperature), rtol=2e-5, atol=1e-6)
    assert float(sim_f.state.clock.time) == float(sim_x.state.clock.time)


def test_fused_lean_rollout_coupled_land_model():
    """The fused kernel traces the FULL coupled LandModel (SEB implicit
    skin-T + surface hydrology + PALADYN vegetation + Richards soil) with
    mixed static + time-varying forcing; prognostics match the XLA lean
    rollout. Uses the stable `consistent_units` vegetation configuration
    (the parity-default per-year rate quirk diverges by design — README
    deviations; test_parity_robustness.py pins that)."""
    import jax

    from terrarium_tpu.ops.fused_step import make_fused_lean_rollout

    cells = 64
    grid = tt.ColumnGrid.of(cells=cells, spacing=tt.ExponentialSpacing(N=8),
                            nf=np.float32)
    soil = tt.SoilEnergyWaterCarbon(
        strat=tt.HomogeneousStratigraphy(texture=tt.SoilTexture.preset("loam")),
        hydrology=tt.SoilHydrology(vertical_flow=tt.RichardsEq()),
    )
    model = tt.LandModel(grid=grid,
                         vegetation=tt.VegetationCarbon.consistent_units(),
                         soil=soil)
    hours = np.arange(0.0, 48 * 3600.0, 3600.0)
    day = hours / 86400.0
    sw = (800.0 * np.maximum(0.0, np.sin(2 * np.pi * (day[:, None] - 0.25)))
          * np.ones((1, cells))).astype(np.float32)
    ta = ((12.0 + 6.0 * np.sin(2 * np.pi * (day[:, None] - 0.3)))
          * np.ones((1, cells))).astype(np.float32)
    forcing = tt.TimeSeriesInputSource(
        times=hours, series={"surface_shortwave_down": sw,
                             "air_temperature": ta})
    static = tt.FieldInputSource(fields={"surface_longwave_down": 330.0,
                                         "rainfall": 4.0e-8,
                                         "windspeed": 3.0,
                                         "specific_humidity": 0.006})
    sim = tt.initialize(
        model, tt.ForwardEuler(dt=600.0),
        initializers={"temperature": 8.0, "saturation_water_ice": 0.6,
                      "carbon_vegetation": 2.0,
                      "vegetation_area_fraction": 0.5},
        input_sources=(forcing, static))

    n = 12
    s_ref = sim._rollout_fn(n)(sim.state, 600.0)
    fused = make_fused_lean_rollout(sim.model, sim.timestepper, sim.ctx,
                                    sim.input_sources, dt=600.0,
                                    inner_steps=4, block_cells=64,
                                    interpret=True)
    s_fus = jax.jit(lambda s: fused(s, n))(sim.state)
    for name in sorted(s_ref.prognostic):
        a = np.asarray(s_fus.prognostic[name])
        b = np.asarray(s_ref.prognostic[name])
        assert np.all(np.isfinite(b)), f"reference not finite: {name}"
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-7, err_msg=name)


def test_fused_lean_rollout_scalar_time_series():
    """(T,) scalar series (supported by the XLA path, which broadcasts the
    interpolated scalar) must also work through the fused rollout — and in
    particular must NOT be mis-broadcast along cells when T == cells
    (ADVICE r3: a (T,) series hit trailing-dim broadcasting, wrong or
    failing depending on shape coincidence)."""
    import jax

    from terrarium_tpu.ops.fused_step import make_fused_lean_rollout

    cells, nz = 16, 8  # T == cells below: the dangerous coincidence
    grid = tt.ColumnGrid.of(cells=cells, spacing=tt.ExponentialSpacing(N=nz),
                            nf=np.float32)
    model = tt.SoilModel(grid=grid)
    hours = np.arange(0.0, 16 * 3600.0, 3600.0)
    ts = (5.0 + 4.0 * np.sin(2 * np.pi * hours / 86400.0)).astype(np.float32)
    assert ts.ndim == 1 and ts.size == cells
    forcing = tt.TimeSeriesInputSource(times=hours,
                                       series={"surface_temperature": ts})
    sim = tt.initialize(
        model, tt.ForwardEuler(dt=900.0),
        initializers={"temperature": 1.0, "saturation_water_ice": 0.5},
        boundary_conditions=tt.PrescribedSurfaceTemperature(
            "surface_temperature"),
        input_sources=(forcing,),
    )
    n = 16
    s_ref = sim._rollout_fn(n)(sim.state, 900.0)
    fused = make_fused_lean_rollout(sim.model, sim.timestepper, sim.ctx,
                                    sim.input_sources, dt=900.0,
                                    inner_steps=4, block_cells=16,
                                    interpret=True)
    s_fus = jax.jit(lambda s: fused(s, n))(sim.state)
    np.testing.assert_allclose(
        np.asarray(s_fus.prognostic["internal_energy"]),
        np.asarray(s_ref.prognostic["internal_energy"]), rtol=2e-5, atol=1e-6)


def test_fused_lean_rollout_preserves_source_order():
    """Static + time-series sources providing the SAME input variable:
    update_inputs is last-wins per variable, so the fused path must apply
    sources in the user's order (ADVICE r3: window stand-ins were appended
    after all static sources regardless of original order)."""
    import jax

    from terrarium_tpu.ops.fused_step import make_fused_lean_rollout

    cells, nz = 16, 8
    grid = tt.ColumnGrid.of(cells=cells, spacing=tt.ExponentialSpacing(N=nz),
                            nf=np.float32)
    model = tt.SoilModel(grid=grid)
    hours = np.arange(0.0, 16 * 3600.0, 3600.0)
    ts = np.full((hours.size, cells), 2.0, np.float32)
    forcing = tt.TimeSeriesInputSource(times=hours,
                                       series={"surface_temperature": ts})
    # the STATIC source comes AFTER the ts source, so it must win
    static = tt.FieldInputSource(fields={"surface_temperature": 7.0})
    sim = tt.initialize(
        model, tt.ForwardEuler(dt=900.0),
        initializers={"temperature": 1.0, "saturation_water_ice": 0.5},
        boundary_conditions=tt.PrescribedSurfaceTemperature(
            "surface_temperature"),
        input_sources=(forcing, static),
    )
    n = 8
    s_ref = sim._rollout_fn(n)(sim.state, 900.0)
    fused = make_fused_lean_rollout(sim.model, sim.timestepper, sim.ctx,
                                    sim.input_sources, dt=900.0,
                                    inner_steps=4, block_cells=16,
                                    interpret=True)
    s_fus = jax.jit(lambda s: fused(s, n))(sim.state)
    np.testing.assert_allclose(
        np.asarray(s_fus.prognostic["internal_energy"]),
        np.asarray(s_ref.prognostic["internal_energy"]), rtol=2e-5, atol=1e-6)


def test_fused_lean_rollout_implicit_stepper():
    """VERDICT r4 item 4: the fused lean rollout composes with ImplicitEuler
    (linearized assemble + PCR tridiagonal solves are pad-shift/row-mask
    pure, so the whole implicit step traces into the kernel). Interpret-mode
    equivalence vs the XLA implicit rollout."""
    import jax

    from terrarium_tpu.ops.fused_step import make_fused_lean_rollout

    cells, nz = 96, 16
    grid = tt.ColumnGrid.of(cells=cells, spacing=tt.ExponentialSpacing(N=nz),
                            nf=np.float64)
    props = tt.ConstantSoilHydraulics(
        swrc=tt.VanGenuchten(alpha=2.0, n=2.0),
        unsat_hydraulic_cond=tt.UnsatKVanGenuchten())
    soil = tt.SoilEnergyWaterCarbon(
        hydrology=tt.SoilHydrology(vertical_flow=tt.RichardsEq(),
                                   hydraulic_properties=props))
    model = tt.SoilModel(grid=grid, soil=soil)
    sim = tt.initialize(
        model, tt.ImplicitEuler(dt=3600.0),
        initializers={
            "temperature": lambda x, z: 3.0 * np.cos(2 * np.pi * x) + 0.1 * z,
            "saturation_water_ice":
                lambda x, z: np.minimum(1.0, 0.65 - 0.04 * z)},
        boundary_conditions=tt.PrescribedSurfaceTemperature(
            lambda t: -8.0 + 0.0 * t))
    n = 12
    s_ref = sim._rollout_fn(n)(sim.state, 3600.0)
    fused = make_fused_lean_rollout(sim.model, sim.timestepper, sim.ctx,
                                    sim.input_sources, dt=3600.0,
                                    inner_steps=4, block_cells=64,
                                    interpret=True)
    s_fus = jax.jit(lambda s: fused(s, n))(sim.state)
    for name in ("internal_energy", "saturation_water_ice"):
        a = np.asarray(s_fus.prognostic[name])
        b = np.asarray(s_ref.prognostic[name])
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12, err_msg=name)


def test_fused_lean_rollout_xy_rank2_coupled():
    """The XY-rank-2 kernel mode (`xy_rank2=True`) — the Mosaic layout
    dodge that unblocks the coupled LandModel kernel on chip (round-4
    bisect) — is bit-identical to the rank-1 mode in interpret mode."""
    import jax

    from terrarium_tpu.ops.fused_step import make_fused_lean_rollout

    cells, nz = 96, 10
    grid = tt.ColumnGrid.of(cells=cells, spacing=tt.ExponentialSpacing(N=nz),
                            nf=np.float64)
    soil = tt.SoilEnergyWaterCarbon(
        strat=tt.HomogeneousStratigraphy(texture=tt.SoilTexture.preset("loam")),
        hydrology=tt.SoilHydrology(vertical_flow=tt.RichardsEq()))
    model = tt.LandModel(grid=grid,
                         vegetation=tt.VegetationCarbon.consistent_units(),
                         soil=soil)
    static = tt.FieldInputSource(fields={
        "surface_longwave_down": 330.0, "rainfall": 4.0e-8, "windspeed": 3.0,
        "surface_shortwave_down": 300.0, "air_temperature": 10.0,
        "specific_humidity": 0.006})
    sim = tt.initialize(model, tt.ForwardEuler(dt=600.0),
                        initializers={"temperature": 8.0,
                                      "saturation_water_ice": 0.6,
                                      "carbon_vegetation": 2.0,
                                      "vegetation_area_fraction": 0.5},
                        input_sources=(static,))
    n = 8
    kw = dict(dt=600.0, inner_steps=4, block_cells=32, interpret=True)
    f1 = make_fused_lean_rollout(sim.model, sim.timestepper, sim.ctx,
                                 sim.input_sources, **kw)
    f2 = make_fused_lean_rollout(sim.model, sim.timestepper, sim.ctx,
                                 sim.input_sources, xy_rank2=True, **kw)
    s1 = jax.jit(lambda s: f1(s, n))(sim.state)
    s2 = jax.jit(lambda s: f2(s, n))(sim.state)
    for name in sorted(s1.prognostic):
        np.testing.assert_array_equal(np.asarray(s1.prognostic[name]),
                                      np.asarray(s2.prognostic[name]),
                                      err_msg=name)


def test_fused_implicit_thomas_full_unroll():
    """r5: the fused-kernel implicit solver choice — fully-unrolled Thomas
    (`ops.tridiag.THOMAS_UNROLL="full"`, the Mosaic-lowerable form) matches
    the PCR rollout through the fused kernel (solver-level agreement ~1e-10
    on these diagonally dominant systems; trajectories may diverge slightly
    at phase-change thresholds, hence the loose rtol)."""
    import jax

    from terrarium_tpu.ops import tridiag
    from terrarium_tpu.ops.fused_step import make_fused_lean_rollout

    cells, nz = 96, 16
    grid = tt.ColumnGrid.of(cells=cells, spacing=tt.ExponentialSpacing(N=nz),
                            nf=np.float64)
    props = tt.ConstantSoilHydraulics(
        swrc=tt.VanGenuchten(alpha=2.0, n=2.0),
        unsat_hydraulic_cond=tt.UnsatKVanGenuchten())
    soil = tt.SoilEnergyWaterCarbon(
        hydrology=tt.SoilHydrology(vertical_flow=tt.RichardsEq(),
                                   hydraulic_properties=props))
    model = tt.SoilModel(grid=grid, soil=soil)

    def build(solver):
        return tt.initialize(
            model, tt.ImplicitEuler(dt=3600.0, solver=solver),
            initializers={"temperature": 3.0,
                          "saturation_water_ice":
                              lambda x, z: np.minimum(1.0, 0.65 - 0.04 * z)},
            boundary_conditions=tt.PrescribedSurfaceTemperature(-6.0))

    s_ref = build("pcr")._rollout_fn(8)(build("pcr").state, 3600.0)
    try:
        tridiag.THOMAS_UNROLL = "full"
        sim = build("thomas")
        fused = make_fused_lean_rollout(sim.model, sim.timestepper, sim.ctx,
                                        (), dt=3600.0, inner_steps=4,
                                        block_cells=64, interpret=True)
        s_th = jax.jit(lambda s: fused(s, 8))(sim.state)
    finally:
        tridiag.THOMAS_UNROLL = 2
    np.testing.assert_allclose(
        np.asarray(s_th.prognostic["internal_energy"]),
        np.asarray(s_ref.prognostic["internal_energy"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_th.prognostic["saturation_water_ice"]),
        np.asarray(s_ref.prognostic["saturation_water_ice"]),
        rtol=1e-5, atol=1e-9)


def test_fused_kernel_hoists_committed_array_consts():
    """r5 chip bug: a committed device array stored in a process config
    (e.g. ``sat_hydraulic_cond=jnp.exp(x)``) was left baked into the
    kernel jaxpr by `jax.closure_convert` (it hoists only traced consts)
    and Mosaic rejected the kernel with "captures constants".
    `ops.fused_step.closure_convert_all` hoists ALL jaxpr constants; the
    kernel must trace with zero captured consts and reproduce the
    python-float-config rollout bitwise."""
    import jax
    import jax.numpy as jnp

    from terrarium_tpu.ops.fused_step import make_fused_lean_rollout

    grid = tt.ColumnGrid.of(cells=64, spacing=tt.ExponentialSpacing(N=8),
                            nf=np.float32)

    def build(ksat):
        props = tt.ConstantSoilHydraulics(
            sat_hydraulic_cond=ksat,
            swrc=tt.VanGenuchten(alpha=2.0, n=2.0),
            unsat_hydraulic_cond=tt.UnsatKVanGenuchten())
        soil = tt.SoilEnergyWaterCarbon(hydrology=tt.SoilHydrology(
            vertical_flow=tt.RichardsEq(), hydraulic_properties=props))
        model = tt.SoilModel(grid=grid, soil=soil)
        return tt.initialize(
            model, tt.ForwardEuler(),
            initializers={"temperature": -1.0,
                          "saturation_water_ice":
                              lambda x, z: np.minimum(1.0, 0.6 - 0.04 * z)},
            boundary_conditions=tt.PrescribedSurfaceTemperature(4.0))

    outs = {}
    for key, ksat in (("float", float(np.exp(np.log(1e-5)))),
                      ("device_array", jnp.exp(jnp.float32(np.log(1e-5))))):
        sim = build(ksat)
        fused = make_fused_lean_rollout(sim.model, sim.timestepper, sim.ctx,
                                        (), dt=300.0, inner_steps=4,
                                        block_cells=64, interpret=True)
        # tracing must not raise (the TPU lowering would reject captured
        # consts; interpret mode tolerates them, so ALSO check the jaxpr)
        jaxpr = jax.make_jaxpr(lambda s: fused(s, 4))(sim.state)

        def find_pallas(jx, out):
            for e in jx.eqns:
                if e.primitive.name == "pallas_call":
                    out.append(e)
                for v in e.params.values():
                    inner_jx = getattr(v, "jaxpr", None)
                    if inner_jx is not None:
                        find_pallas(inner_jx, out)
            return out

        pallas_eqns = find_pallas(jaxpr.jaxpr, [])
        assert pallas_eqns, "no pallas_call traced"
        outs[key] = np.asarray(jax.jit(lambda s: fused(s, 8))(
            sim.state).prognostic["internal_energy"])
    np.testing.assert_array_equal(outs["device_array"], outs["float"])
