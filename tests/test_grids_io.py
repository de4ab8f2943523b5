"""Ring grids, mask packing, NetCDF IO, and global-model integration tests.

Mirrors reference `test/grids.jl`, `test/inputs/raster_inputs.jl`, and
`test/timestepping/run_simulation.jl` (global SoilModel on a ring grid).
"""
import os

import numpy as np
import pytest

import terrarium_tpu as tt

N72_MASK = "/root/reference/inputs/era5-land_land_sea_mask_N72.nc"


def test_vertical_spacings():
    """Spacing formulas (reference `vertical_discretization.jl`)."""
    u = tt.UniformSpacing(dz=0.1, N=10)
    np.testing.assert_allclose(u.thicknesses(), 0.1)
    e = tt.ExponentialSpacing(dz_min=0.05, dz_max=100.0, N=50, sig=3)
    dz = e.thicknesses()
    assert dz.shape == (50,)
    assert dz[0] == 0.05 and dz[-1] == 100.0
    assert np.all(np.diff(dz) >= 0)
    # sig rounding: 3 significant digits
    assert all(float(f"{v:.3g}") == v for v in dz)
    p = tt.PrescribedSpacing(dz=[0.1, 0.2, 0.3])
    assert p.N == 3
    # vertical grid construction: bottom-up faces, surface at 0
    g = tt.VerticalGrid.from_spacing(p)
    np.testing.assert_allclose(g.z_faces, [-0.6, -0.3, -0.1, 0.0])
    np.testing.assert_allclose(g.dz, [0.3, 0.2, 0.1])  # bottom-up
    np.testing.assert_allclose(g.z_centers, [-0.45, -0.2, -0.05])


def test_full_gaussian_grid_shape():
    g = tt.full_gaussian_grid(72)
    assert g.shape == (144, 288)
    assert g.lats[0] > 0 and g.lats[-1] < 0  # north to south
    assert abs(g.lats[0]) < 90


def test_full_healpix_grid_shape():
    g = tt.full_healpix_grid(16)
    assert g.nlat == 4 * 16 - 1
    assert g.nlon == 64
    assert np.all(np.diff(g.lats) < 0)


def test_mask_packing_roundtrip(rng):
    ring = tt.full_gaussian_grid(4)  # 8 x 16
    mask = rng.random(ring.shape) > 0.6
    grid = tt.ColumnRingGrid.create(ring, mask, spacing=tt.UniformSpacing(N=5),
                                    nf=np.float64, pad_multiple=8)
    assert grid.cells % 8 == 0
    assert grid.n_land == mask.sum()
    raster = rng.normal(size=ring.shape)
    packed = grid.gather(raster)
    assert packed.shape == (grid.cells,)
    back = grid.scatter(packed, fill=np.nan)
    np.testing.assert_allclose(back[mask], raster[mask])
    assert np.all(np.isnan(back[~mask]))
    # time-stacked gather
    stack = rng.normal(size=(3,) + ring.shape)
    packed3 = grid.gather(stack)
    assert packed3.shape == (3, grid.cells)
    np.testing.assert_allclose(packed3[1][: grid.n_land],
                               stack[1].ravel()[grid.idx])


@pytest.mark.skipif(not os.path.exists(N72_MASK), reason="mask file not present")
def test_load_era5_n72_mask():
    """The shipped ERA5-land N72 mask matches the FullGaussianGrid(72) shape."""
    mask, lats, lons = tt.load_land_mask(N72_MASK)
    ring = tt.full_gaussian_grid(72)
    assert mask.shape == ring.shape
    np.testing.assert_allclose(lats, ring.lats, atol=0.05)
    assert 0.2 < mask.mean() < 0.5  # plausible land fraction


@pytest.mark.skipif(not os.path.exists(N72_MASK), reason="mask file not present")
def test_global_soil_model_run():
    """Global SoilModel on the masked N72 grid runs finite for a day and the
    clock semantics hold (reference `run_simulation.jl:8-43`, with the real
    ERA5 mask instead of HEALPix)."""
    mask, _, _ = tt.load_land_mask(N72_MASK)
    ring = tt.full_gaussian_grid(72)
    grid = tt.ColumnRingGrid.create(ring, mask,
                                    spacing=tt.ExponentialSpacing(N=20),
                                    nf=np.float32, pad_multiple=8)
    model = tt.SoilModel(grid=grid)
    # latitude-dependent initial temperature via packed cell coordinates
    lat = grid.cell_lats
    T0 = 25.0 - 0.6 * np.abs(lat)
    sim = tt.initialize(
        model, tt.ForwardEuler(),
        initializers={"temperature": lambda x, z: np.broadcast_to(T0, (1, len(T0))),
                      "saturation_water_ice": 0.5},
        boundary_conditions=tt.PrescribedSurfaceTemperature(
            np.asarray(T0, dtype=np.float32)))
    sim.run(period=86400.0, dt=900.0)
    T = np.asarray(sim.state.temperature)
    assert np.all(np.isfinite(T))
    assert sim.iteration == 96
    assert sim.current_time == 86400.0
    # scatter a diagnostic back to the raster
    raster = grid.scatter(np.asarray(sim.state.ground_temperature))
    assert raster.shape == ring.shape
    assert np.isfinite(raster[mask]).all()


def test_healpix_global_run():
    """All-land FullHEALPixGrid(16) run (the reference integration test grid,
    `run_simulation.jl:8-16`)."""
    ring = tt.full_healpix_grid(16)
    mask = np.ones(ring.shape, dtype=bool)
    grid = tt.ColumnRingGrid.create(ring, mask, spacing=tt.ExponentialSpacing(N=10),
                                    nf=np.float32)
    model = tt.SoilModel(grid=grid)
    sim = tt.initialize(model, tt.ForwardEuler(),
                        initializers={"temperature": 1.0,
                                      "saturation_water_ice": 0.5})
    sim.run(steps=10, dt=300.0)
    assert np.all(np.isfinite(np.asarray(sim.state.temperature)))


def test_raster_input_source(tmp_path, rng):
    """NetCDF-backed time-varying input with linear interpolation and flat
    extrapolation (reference `test/inputs/raster_inputs.jl:15-193`)."""
    import h5py

    ring = tt.full_gaussian_grid(2)  # 4 x 8
    mask = np.ones(ring.shape, dtype=bool)
    grid = tt.ColumnRingGrid.create(ring, mask, spacing=tt.UniformSpacing(N=3),
                                    nf=np.float64)
    # write a NetCDF-like HDF5 fixture: tair(time, lat, lon)
    path = str(tmp_path / "forcing.nc")
    times_h = np.array([0.0, 1.0, 2.0])  # hours
    tair = rng.normal(size=(3,) + ring.shape)
    with h5py.File(path, "w") as f:
        t = f.create_dataset("time", data=times_h)
        t.attrs["units"] = np.bytes_(b"hours since 1900-01-01 00:00:0.0")
        t.attrs["CLASS"] = np.bytes_(b"DIMENSION_SCALE")
        la = f.create_dataset("lat", data=ring.lats)
        la.attrs["CLASS"] = np.bytes_(b"DIMENSION_SCALE")
        lo = f.create_dataset("lon", data=ring.lons)
        lo.attrs["CLASS"] = np.bytes_(b"DIMENSION_SCALE")
        d = f.create_dataset("tair", data=tair)
        d.dims[0].attach_scale(t)
        d.dims[1].attach_scale(la)
        d.dims[2].attach_scale(lo)

    src = tt.raster_input_source(grid, path, {"air_temperature": "tair"})
    assert isinstance(src, tt.TimeSeriesInputSource)
    # build a dummy state carrying the input var
    from terrarium_tpu.state import build_state, Clock
    from terrarium_tpu.variables import Variables
    import jax.numpy as jnp

    v = Variables.of(src.variables())
    state = build_state(v, grid)
    state = src.initialize_inputs(state)
    np.testing.assert_allclose(state.inputs["air_temperature"],
                               tair[0].ravel()[grid.idx], rtol=1e-6)
    # halfway between slices 0 and 1
    state = state.with_clock(Clock(jnp.asarray(1800.0), jnp.asarray(1)))
    state = src.update_inputs(state)
    np.testing.assert_allclose(state.inputs["air_temperature"],
                               0.5 * (tair[0] + tair[1]).ravel()[grid.idx], rtol=1e-6)
    # flat extrapolation past the end
    state = state.with_clock(Clock(jnp.asarray(10 * 3600.0), jnp.asarray(2)))
    state = src.update_inputs(state)
    np.testing.assert_allclose(state.inputs["air_temperature"],
                               tair[2].ravel()[grid.idx], rtol=1e-6)
