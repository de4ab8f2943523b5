"""Reference-trajectory parity harness (BASELINE.md target #2).

Runs THIS framework under the reference's global soil heat+hydrology protocol
(`/root/reference/test/benchmarks/gpu/soil_heat_hydrology_global.jl:39-103`:
SoilModel, heat conduction + RichardsEq, Nz=30 ExponentialSpacing, annual-
cycle surface temperature BC ``30*sin(2*pi*t/(365*24*3600))`` degC, dt=60 s,
Float32 by default) and compares the prognostic fields against a
reference-produced NetCDF trajectory, reporting per-field allclose.

Julia is not installed in this environment, so the reference side cannot be
executed here; this harness is runnable the day reference output exists.
Produce it with the reference by writing NetCDF output containing any of:

* ``temperature`` / ``soil_temperature``  [degC]        dims (..., z[, cell])
* ``saturation_water_ice`` / ``saturation``             same dims
* ``internal_energy``                      [J/m^3]      same dims
* ``surface_excess_water``                 [m]          dims (..., cell)

Cell dim may be either the packed land-cell axis (length = mask land count,
reference ring-grid order) or the full ring-grid point axis (masked here).
The LAST time index is compared if a time dim is present. z order may be
surface-down (reference writes k=1 at the surface via Oceananigans' reversed
z) or bottom-up; set ``--z-order``.

Usage:
  python parity_vs_reference.py REF.nc --mask /root/reference/inputs/era5-land_land_sea_mask_N72.nc \
      --period-days 365 [--dt 60] [--rtol 1e-4] [--atol 1e-5] [--z-order surface-down]
  python parity_vs_reference.py --selftest   # fixture-driven self-check
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np

#: field -> (accepted reference names, expected packed ndim: 2=XYZ, 1=XY)
FIELD_ALIASES = {
    "temperature": (("temperature", "soil_temperature", "T"), 2),
    "saturation_water_ice": (("saturation_water_ice", "saturation",
                              "theta_wi"), 2),
    "internal_energy": (("internal_energy", "U"), 2),
    "surface_excess_water": (("surface_excess_water",), 1),
}


def build_sim(mask_path: str, nf=np.float32, dt: float = 60.0,
              deficit_pool: bool = False):
    """The reference benchmark configuration on the masked ring grid.
    ``deficit_pool`` opts into the corrected saturation-clamp mode (NOT
    parity; used by the exact-budget year assessment)."""
    import jax.numpy as jnp

    import terrarium_tpu as tt
    from terrarium_tpu.io.netcdf import load_land_mask

    mask, lats, _ = load_land_mask(mask_path)
    ring = tt.full_gaussian_grid(lats.shape[0] // 2)
    grid = tt.ColumnRingGrid.create(ring, mask,
                                    spacing=tt.ExponentialSpacing(N=30), nf=nf)
    hydrology = tt.SoilHydrology(vertical_flow=tt.RichardsEq(),
                                 deficit_pool=deficit_pool)
    soil = tt.SoilEnergyWaterCarbon(hydrology=hydrology)
    # the protocol sets the coupled SoilInitializer explicitly
    # (`soil_heat_hydrology_global.jl:41`): QuasiThermalSteadyState T +
    # SaturationWaterTable water (`soil_model_init.jl:6-152`)
    model = tt.SoilModel(grid=grid, soil=soil, initializer=tt.SoilInitializer())
    sim = tt.initialize(
        model, tt.ForwardEuler(dt=dt),
        boundary_conditions=tt.PrescribedSurfaceTemperature(
            lambda t: 30.0 * jnp.sin(2 * jnp.pi * t / (24 * 3600 * 365.0))))
    return sim, grid


def _find(ncvars, aliases):
    for name in aliases:
        if name in ncvars:
            return ncvars[name]
    return None


def _normalize(arr, grid, z_order: str, ndim: int):
    """Bring a reference array to packed land-cell form:
    (nz, n_land) for XYZ fields, (n_land,) for XY fields."""
    a = np.asarray(arr, dtype=np.float64)
    # full lat-lon raster layout: mask-gather the trailing two dims
    if a.ndim >= 2 and a.shape[-2:] == grid.ring.shape:
        a = grid.gather(a, fill=np.nan)
    # leading time (or sample) dims: take the final snapshot
    while a.ndim > ndim:
        a = a[-1]
    if ndim == 2 and a.shape[0] not in (grid.nz, grid.nz + 1):
        a = a.T  # (points, z) layout
    if ndim == 2 and z_order == "surface-down":
        a = a[::-1]
    # drop any pad cells (this framework) / compare land cells only
    return a[..., : grid.n_land]


def compare(ref_path: str, mask_path: str, period_days: float, dt: float,
            rtol: float, atol: float, z_order: str):
    from terrarium_tpu.io.netcdf import read_netcdf

    ncvars = {k: v.data for k, v in read_netcdf(ref_path).items()}
    sim, grid = build_sim(mask_path, dt=dt)
    steps = int(round(period_days * 86400.0 / dt))
    sim.run(steps=steps)

    report, ok = {}, True
    for field, (aliases, ndim) in FIELD_ALIASES.items():
        ref = _find(ncvars, aliases)
        if ref is None:
            continue
        ref = _normalize(ref, grid, z_order, ndim)
        ours = np.asarray(sim.state[field])[..., : grid.n_land]
        if ref.shape != ours.shape:
            report[field] = {"status": "shape_mismatch",
                             "ref": list(ref.shape), "ours": list(ours.shape)}
            ok = False
            continue
        close = np.allclose(ours, ref, rtol=rtol, atol=atol)
        report[field] = {
            "status": "allclose" if close else "MISMATCH",
            "max_abs_err": float(np.max(np.abs(ours - ref))),
            "max_rel_err": float(np.max(np.abs(ours - ref)
                                        / (np.abs(ref) + atol))),
        }
        ok = ok and close
    if not report:
        report["error"] = ("no comparable fields found in the reference file; "
                           f"expected any of {FIELD_ALIASES}")
        ok = False
    print(json.dumps({"ok": ok, "steps": steps, "rtol": rtol, "atol": atol,
                      "fields": report}, indent=2))
    return ok


def selftest(tmpdir: str = "/tmp/parity_selftest") -> bool:
    """Fixture-driven self-check: write a short trajectory of THIS framework
    as the 'reference' NetCDF (full ring-grid layout, surface-down z, with a
    time axis) and verify the harness reports allclose for every field."""
    import os

    from terrarium_tpu.io.netcdf import NCVariable, write_netcdf

    os.makedirs(tmpdir, exist_ok=True)
    mask_path = "/root/reference/inputs/era5-land_land_sea_mask_N72.nc"
    dt, period_days = 60.0, 1.0 / 24.0  # one simulated hour
    sim, grid = build_sim(mask_path, dt=dt)
    steps = int(round(period_days * 86400.0 / dt))
    sim.run(steps=steps)

    # write in the most adversarial layout the harness accepts
    def scatter_all(packed):  # (nz, cells) -> (t=1, z surface-down, points)
        pts = np.stack([grid.scatter(row) for row in np.asarray(packed)])
        return pts[::-1][None]

    path = os.path.join(tmpdir, "ref_fixture.nc")
    write_netcdf(path, {
        "soil_temperature": NCVariable(
            "soil_temperature", scatter_all(sim.state.temperature),
            ("time", "z", "lat", "lon"), {}),
        "saturation": NCVariable(
            "saturation", scatter_all(sim.state.saturation_water_ice),
            ("time", "z", "lat", "lon"), {}),
        "surface_excess_water": NCVariable(
            "surface_excess_water",
            np.asarray(grid.scatter(
                np.asarray(sim.state.surface_excess_water)))[None],
            ("time", "lat", "lon"), {}),
    })
    return compare(path, mask_path, period_days, dt, rtol=1e-6, atol=1e-7,
                   z_order="surface-down")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ref", nargs="?", help="reference-produced NetCDF")
    ap.add_argument("--mask", default="/root/reference/inputs/"
                                      "era5-land_land_sea_mask_N145.nc")
    ap.add_argument("--period-days", type=float, default=365.0)
    ap.add_argument("--dt", type=float, default=60.0)
    ap.add_argument("--rtol", type=float, default=1e-4)
    ap.add_argument("--atol", type=float, default=1e-5)
    ap.add_argument("--z-order", choices=("surface-down", "bottom-up"),
                    default="surface-down")
    ap.add_argument("--selftest", action="store_true")
    args = ap.parse_args()
    if args.selftest:
        sys.exit(0 if selftest() else 1)
    if not args.ref:
        ap.error("provide a reference NetCDF path or --selftest")
    ok = compare(args.ref, args.mask, args.period_days, args.dt, args.rtol,
                 args.atol, args.z_order)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
