"""Chunked forcing pipeline tests (SURVEY hard part #5)."""
import numpy as np
import pytest

import terrarium_tpu as tt
from terrarium_tpu.io.forcing_pipeline import ChunkedForcingPipeline


def _build(sources):
    grid = tt.ColumnGrid.of(cells=4, spacing=tt.ExponentialSpacing(N=10),
                            nf=np.float64)
    model = tt.SoilModel(grid=grid)
    return tt.initialize(
        model, tt.ForwardEuler(),
        initializers={"temperature": 1.0, "saturation_water_ice": 0.5},
        boundary_conditions=tt.PrescribedSurfaceTemperature("surface_temp"),
        input_sources=sources)


def test_chunked_pipeline_matches_monolithic(rng):
    """Streaming the forcing in small windows must reproduce the monolithic
    (all-in-memory) time-series source exactly."""
    T = 40
    times = np.arange(T) * 1800.0  # half-hourly
    surface_temp = 5.0 * np.sin(2 * np.pi * times / 86400.0)[:, None] \
        + rng.normal(0, 0.5, (T, 4))

    steps, dt = 96, 300.0

    # monolithic reference
    mono = tt.TimeSeriesInputSource(times=times,
                                    series={"surface_temp": surface_temp})
    sim_a = _build((mono,))
    sim_a.run(steps=steps, dt=dt)

    # chunked: window of 8 slices
    pipeline = ChunkedForcingPipeline(times, {"surface_temp": surface_temp},
                                      window=8)
    sim_b = _build((mono,))  # declares the input variable; values streamed
    pipeline.run(sim_b, steps=steps, dt=dt)

    np.testing.assert_allclose(np.asarray(sim_b.state.temperature),
                               np.asarray(sim_a.state.temperature),
                               rtol=1e-12)
    assert sim_b.iteration == sim_a.iteration


def test_pipeline_single_compilation(rng):
    """All windows share one compiled executable (the window is a traced
    argument, not a baked constant)."""
    T = 64
    times = np.arange(T) * 600.0
    vals = rng.normal(0, 1, (T, 4))
    pipeline = ChunkedForcingPipeline(times, {"surface_temp": vals}, window=8)
    mono = tt.TimeSeriesInputSource(times=times, series={"surface_temp": vals})
    sim = _build((mono,))
    import jax

    before = sim.state
    pipeline.run(sim, steps=60, dt=600.0)
    assert np.all(np.isfinite(np.asarray(sim.state.temperature)))
    assert float(sim.state.clock.time) == 60 * 600.0
