"""Output writers, checkpoint/resume, and debug-hook tests.

Covers the aux subsystems from SURVEY §5: field time-series output with
schedules (the reference's Oceananigans-writer delegation), checkpointed
restart (a capability beyond the reference), and NaN-check hooks.
"""
import numpy as np
import pytest

import terrarium_tpu as tt
from terrarium_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from terrarium_tpu.io.output import (FieldTimeSeriesWriter, IterationInterval,
                                     TimeInterval, load_field_time_series)


def _sim(cells=2, nz=8):
    grid = tt.ColumnGrid.of(cells=cells, spacing=tt.ExponentialSpacing(N=nz),
                            nf=np.float64)
    model = tt.SoilModel(grid=grid)
    return tt.initialize(
        model, tt.ForwardEuler(),
        initializers={"temperature": 1.0, "saturation_water_ice": 0.5},
        boundary_conditions=tt.PrescribedSurfaceTemperature(5.0))


def test_field_time_series_writer(tmp_path):
    sim = _sim()
    path = str(tmp_path / "out.h5")
    writer = FieldTimeSeriesWriter(path, ["temperature", "ground_temperature"],
                                   schedule=IterationInterval(4))
    writer(sim)  # initial snapshot
    sim.run(steps=16, dt=300.0, callbacks=[writer], callback_interval=4)
    data = load_field_time_series(path)
    assert data["time"].shape[0] == 5  # t=0 + 4 actuations
    assert data["temperature"].shape == (5, 8, 2)
    assert data["ground_temperature"].shape == (5, 2)
    # surface warms toward the 5 degC boundary condition over time
    assert data["ground_temperature"][-1, 0] > data["ground_temperature"][0, 0]
    np.testing.assert_allclose(data["time"],
                               [0.0, 1200.0, 2400.0, 3600.0, 4800.0])


def test_time_interval_schedule(tmp_path):
    sim = _sim()
    path = str(tmp_path / "out_t.h5")
    writer = FieldTimeSeriesWriter(path, ["ground_temperature"],
                                   schedule=TimeInterval(1800.0))
    sim.run(steps=12, dt=300.0, callbacks=[writer],
            callback_interval=writer.schedule.steps_hint(300.0))
    data = load_field_time_series(path)
    assert data["time"].shape[0] == 2  # at 1800 and 3600 s
    np.testing.assert_allclose(data["time"], [1800.0, 3600.0])


def test_averaged_time_interval(tmp_path):
    """AveragedTimeInterval stores the time mean of snapshots since the last
    actuation (reference: Oceananigans `AveragedTimeInterval`,
    `docs/src/running/time_stepping.md:97-175`)."""
    from terrarium_tpu.io.output import AveragedTimeInterval

    sim = _sim()
    path = str(tmp_path / "out_avg.h5")
    writer = FieldTimeSeriesWriter(path, ["ground_temperature"],
                                   schedule=AveragedTimeInterval(1800.0))
    # also record every step for the expected mean
    snaps, times = [], []

    def recorder(s):
        snaps.append(np.asarray(s.state.ground_temperature).copy())
        times.append(s.current_time)

    sim.run(steps=12, dt=300.0, callbacks=[recorder, writer],
            callback_interval=1)
    data = load_field_time_series(path)
    assert data["time"].shape[0] == 2
    # first actuation at t=1800 averages the first 6 per-step snapshots
    first6 = np.mean(np.stack(snaps[:6]), axis=0)
    np.testing.assert_allclose(data["ground_temperature"][0], first6,
                               rtol=1e-12)


def test_checkpoint_resume(tmp_path):
    """Bit-exact resume: run 20 steps straight vs 10 + checkpoint + 10."""
    dt = 300.0
    sim_a = _sim()
    sim_a.run(steps=20, dt=dt)

    sim_b = _sim()
    sim_b.run(steps=10, dt=dt)
    path = save_checkpoint(str(tmp_path / "ckpt"), sim_b.state)

    sim_c = _sim()  # fresh initialization
    sim_c.state = load_checkpoint(path, sim_c.state)
    assert sim_c.current_time == sim_b.current_time
    sim_c.run(steps=10, dt=dt)

    np.testing.assert_array_equal(np.asarray(sim_a.state.temperature),
                                  np.asarray(sim_c.state.temperature))
    np.testing.assert_array_equal(np.asarray(sim_a.state.internal_energy),
                                  np.asarray(sim_c.state.internal_energy))
    assert sim_c.iteration == sim_a.iteration


def test_nancheck():
    import jax.numpy as jnp

    sim = _sim()
    tt.nancheck(sim.state)  # clean state passes
    bad = sim.state.update(temperature=sim.state.temperature.at[0, 0].set(jnp.nan))
    with pytest.raises(FloatingPointError, match="temperature"):
        tt.nancheck(bad)


def test_debug_callback_toggle():
    sim = _sim()
    try:
        tt.enable_debug(True)
        tt.debug_callback(sim)  # no error on clean state
    finally:
        tt.enable_debug(False)


def test_duck_typed_input_source():
    """A user source that is NOT a registered pytree must still work: it is
    closure-captured by the compiled step instead of passed as a jit
    argument (reference allows any `InputSource` subtype,
    `input_sources.jl:11-73`)."""
    import terrarium_tpu as tt

    class RampAirTemp:  # deliberately NOT a registered pytree
        def variables(self):
            from terrarium_tpu.variables import input as input_var, XY
            return (input_var("air_temperature", XY()),)

        def initialize_inputs(self, state):
            return self.update_inputs(state)

        def update_inputs(self, state):
            import jax.numpy as jnp
            val = 2.0 + 1e-5 * state.clock.time
            t = jnp.full_like(state.inputs["air_temperature"], 0.0) + val
            return state.update({"air_temperature": t})

    grid = tt.ColumnGrid.of(cells=2, spacing=tt.ExponentialSpacing(N=8),
                            nf=np.float64)
    model = tt.SoilModel(grid=grid)
    sim = tt.initialize(
        model, tt.ForwardEuler(),
        initializers={"temperature": 1.0, "saturation_water_ice": 0.5},
        boundary_conditions=tt.PrescribedSurfaceTemperature(5.0),
        input_sources=(RampAirTemp(),))
    sim.timestep(dt=300.0)
    t0 = float(np.asarray(sim.state.inputs["air_temperature"])[0])
    sim.run(steps=10, dt=300.0)
    t1 = float(np.asarray(sim.state.inputs["air_temperature"])[0])
    assert t1 > t0  # the ramp actually advanced inside the jitted rollout
    assert np.all(np.isfinite(np.asarray(sim.state.temperature)))


def test_netcdf_raster_writer(tmp_path):
    """NetCDF4 raster output: scatter-back to lat-lon, CF dims, round-trip
    through the h5py NetCDF reader (write half of the reference's
    Oceananigans NetCDF-writer delegation, `time_stepping.md:97-138`)."""
    from terrarium_tpu.io.netcdf import read_netcdf
    from terrarium_tpu.io.output import NetCDFRasterWriter

    ring = tt.full_gaussian_grid(8)
    mask = np.zeros(ring.shape, dtype=bool)
    mask[3:8, 4:20] = True
    grid = tt.ColumnRingGrid.create(ring, mask,
                                    spacing=tt.ExponentialSpacing(N=6),
                                    nf=np.float64)
    model = tt.SoilModel(grid=grid)
    sim = tt.initialize(
        model, tt.ForwardEuler(),
        initializers={"temperature": 4.0, "saturation_water_ice": 0.5},
        boundary_conditions=tt.PrescribedSurfaceTemperature(8.0))
    path = str(tmp_path / "out.nc")
    writer = NetCDFRasterWriter(path, ["ground_temperature", "temperature"],
                                schedule=IterationInterval(5),
                                units={"temperature": "degC"})
    sim.run(steps=10, dt=300.0, callbacks=[writer], callback_interval=5)

    data = read_netcdf(path)
    gt = data["ground_temperature"]
    T = data["temperature"]
    assert gt.dims == ["time", "lat", "lon"]
    assert T.dims == ["time", "z", "lat", "lon"]
    assert T.attrs.get("units") in (b"degC", "degC")
    assert gt.data.shape == (2, ring.nlat, ring.nlon)
    assert T.data.shape == (2, 6, ring.nlat, ring.nlon)
    np.testing.assert_allclose(data["lat"].data, ring.lats)
    np.testing.assert_allclose(data["time"].data, [1500.0, 3000.0])
    # land points finite, sea points fill (NaN)
    assert np.isfinite(gt.data[-1][mask]).all()
    assert np.isnan(gt.data[-1][~mask]).all()


def test_profiling_helpers(tmp_path):
    """step_timings and profile_rollout run and report sane numbers
    (the tracing/profiling aux subsystem, SURVEY §5)."""
    sim = _sim()
    stats = tt.step_timings(sim, dt=300.0, block=8, reps=2)
    assert stats["steps_per_s"] > 0 and np.isfinite(stats["us_per_step"])
    assert sim.iteration == 8 * 3  # warm block + 2 timed blocks advanced state
    out = tt.profile_rollout(_sim(), steps=4, logdir=str(tmp_path / "trace"))
    assert out["steps_per_s"] > 0
    import os
    assert any(os.scandir(tmp_path / "trace"))  # trace files written


def test_opaque_source_swap_rebuilds_step():
    """Swapping an opaque (closure-captured) source must retrace the step —
    not silently keep using the first compile's forcing."""
    def make_source(val):
        class Const:
            def variables(self):
                from terrarium_tpu.variables import input as input_var, XY
                return (input_var("air_temperature", XY()),)

            def initialize_inputs(self, state):
                return self.update_inputs(state)

            def update_inputs(self, state):
                import jax.numpy as jnp
                return state.update({"air_temperature": jnp.full_like(
                    state.inputs["air_temperature"], val)})
        return Const()

    grid = tt.ColumnGrid.of(cells=2, spacing=tt.ExponentialSpacing(N=6),
                            nf=np.float64)
    model = tt.SoilModel(grid=grid)
    sim = tt.initialize(
        model, tt.ForwardEuler(),
        initializers={"temperature": 1.0, "saturation_water_ice": 0.5},
        input_sources=(make_source(3.0),))
    sim.timestep(300.0)
    assert float(np.asarray(sim.state.inputs["air_temperature"])[0]) == 3.0
    sim.input_sources = (make_source(42.0),)
    sim.timestep(300.0)
    assert float(np.asarray(sim.state.inputs["air_temperature"])[0]) == 42.0
    sim.run(steps=3, dt=300.0)  # rollout path rebuilds too
    assert float(np.asarray(sim.state.inputs["air_temperature"])[0]) == 42.0


def test_write_netcdf_coordinate_variable_and_conflicts(tmp_path):
    """A 1-D variable named after its own dim becomes the coordinate (data +
    attrs preserved); dim-size conflicts raise instead of misaligning."""
    from terrarium_tpu.io.netcdf import NCVariable, read_netcdf, write_netcdf

    path = str(tmp_path / "c.nc")
    times = np.array([0.0, 60.0, 120.0])
    write_netcdf(path, {
        "time": NCVariable("time", times, ["time"],
                           {"units": "seconds since 2000-01-01"}),
        "x": NCVariable("x", np.arange(6, dtype=float).reshape(3, 2),
                        ["time", "cell"], {}),
    })
    data = read_netcdf(path)
    np.testing.assert_allclose(data["time"].data, times)
    assert data["time"].attrs.get("units") in (
        b"seconds since 2000-01-01", "seconds since 2000-01-01")

    import pytest as _pytest
    with _pytest.raises(ValueError, match="dimension"):
        write_netcdf(str(tmp_path / "bad.nc"), {
            "a": NCVariable("a", np.zeros((3, 2)), ["time", "cell"], {}),
            "b": NCVariable("b", np.zeros((4, 2)), ["time", "cell"], {}),
        })
