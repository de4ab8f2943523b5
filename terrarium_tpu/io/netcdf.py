"""Minimal NetCDF4/HDF5 reader built on h5py.

Replaces the reference's Rasters.jl/NCDatasets backend
(`ext/TerrariumRastersExt`). netCDF4/xarray are not available in this
environment; NetCDF4 files are HDF5 containers, so h5py covers the shipped
ERA5-land masks and typical forcing files. Handles dimension resolution,
_FillValue/missing_value masking, and scale_factor/add_offset unpacking.
NetCDF3 files fall back to `scipy.io.netcdf_file`.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

__all__ = ["NCVariable", "read_netcdf", "write_netcdf", "load_land_mask"]


@dataclasses.dataclass
class NCVariable:
    name: str
    data: np.ndarray
    dims: List[str]
    attrs: Dict


def _decode(data: np.ndarray, attrs: Dict) -> np.ndarray:
    out = np.asarray(data)
    fill = attrs.get("_FillValue", attrs.get("missing_value"))
    scale = attrs.get("scale_factor")
    offset = attrs.get("add_offset")
    if fill is not None or scale is not None or offset is not None:
        out = out.astype(np.float64)
        if fill is not None:
            out = np.where(np.isclose(out, np.ravel(fill)[0]), np.nan, out)
        if scale is not None:
            out = out * np.ravel(scale)[0]
        if offset is not None:
            out = out + np.ravel(offset)[0]
    return out


def read_netcdf(path: str, variables: Optional[List[str]] = None) -> Dict[str, NCVariable]:
    """Read variables (all by default) from a NetCDF file into numpy arrays."""
    try:
        return _read_hdf5(path, variables)
    except OSError:
        return _read_netcdf3(path, variables)


def _read_hdf5(path, variables):
    import h5py

    out: Dict[str, NCVariable] = {}
    with h5py.File(path, "r") as f:
        dim_names: Dict[int, str] = {}

        def is_dim(ds):
            return ds.attrs.get("CLASS", b"") == b"DIMENSION_SCALE"

        names = []

        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                names.append(name)

        f.visititems(visit)
        for name in names:
            ds = f[name]
            if variables is not None and name.split("/")[-1] not in variables \
                    and name not in variables:
                # dimensions are always loaded (cheap, needed for coords)
                if not is_dim(ds):
                    continue
            attrs = {k: v for k, v in ds.attrs.items()
                     if not k.startswith(("DIMENSION", "REFERENCE", "CLASS", "NAME",
                                          "_Netcdf4"))}
            dims = []
            if "DIMENSION_LIST" in ds.attrs:
                for ref_list in ds.attrs["DIMENSION_LIST"]:
                    ref = ref_list[0]
                    dims.append(f[ref].name.lstrip("/"))
            elif is_dim(ds):
                dims = [name]
            out[name.split("/")[-1]] = NCVariable(
                name=name, data=_decode(ds[()], attrs), dims=dims, attrs=attrs)
    return out


def _read_netcdf3(path, variables):
    from scipy.io import netcdf_file

    out: Dict[str, NCVariable] = {}
    with netcdf_file(path, "r", mmap=False) as f:
        for name, var in f.variables.items():
            if variables is not None and name not in variables and \
                    name not in f.dimensions:
                continue
            attrs = {k: v for k, v in var._attributes.items()}
            out[name] = NCVariable(name=name, data=_decode(var[:], attrs),
                                   dims=list(var.dimensions), attrs=attrs)
    return out


def write_netcdf(path: str, variables: Dict[str, NCVariable],
                 coords: Optional[Dict[str, np.ndarray]] = None,
                 global_attrs: Optional[Dict] = None) -> str:
    """Write a NetCDF4-compatible HDF5 file (h5py with HDF5 dimension
    scales, the on-disk convention NetCDF4 uses). The output round-trips
    through :func:`read_netcdf` and is readable by standard NetCDF tooling.

    The reference writes simulation output through Oceananigans writers
    (NetCDF/JLD2, `docs/src/running/time_stepping.md:97-138`); this is the
    writing half of the Rasters/NCDatasets equivalence.

    ``coords`` maps dimension name -> 1-D coordinate array; every dim named
    in a variable's ``dims`` must either appear in ``coords`` or be sized
    from the data (written as a bare index dimension).
    """
    import h5py

    coords = dict(coords or {})
    # a 1-D variable named after its own (sole) dimension IS that dim's
    # coordinate (the NetCDF "coordinate variable" convention) — promote it
    # so its data/attrs are written as the scale instead of being dropped
    coord_attrs: Dict[str, Dict] = {}
    plain = {}
    for name, var in variables.items():
        data = np.asarray(var.data)
        if data.ndim == 1 and list(var.dims) == [name]:
            if name in coords and not np.array_equal(np.asarray(coords[name]),
                                                     data):
                raise ValueError(
                    f"coordinate variable {name!r} conflicts with coords[{name!r}]")
            coords[name] = data
            coord_attrs[name] = dict(var.attrs or {})
        else:
            plain[name] = var

    with h5py.File(path, "w") as f:
        # collect dimension sizes from coords + variable shapes; a size
        # mismatch between a coordinate and a variable's dimension is an
        # error (silently attaching a wrong-length scale misaligns levels)
        dim_sizes: Dict[str, int] = {k: len(np.asarray(v))
                                     for k, v in coords.items()}
        for name, var in plain.items():
            shape = np.asarray(var.data).shape
            if len(var.dims) != len(shape):
                raise ValueError(
                    f"variable {name!r}: {len(var.dims)} dims for "
                    f"{len(shape)}-d data")
            for d, size in zip(var.dims, shape):
                if dim_sizes.setdefault(d, size) != size:
                    raise ValueError(
                        f"variable {name!r}: dimension {d!r} has size {size} "
                        f"but coords/other variables give {dim_sizes[d]}")

        scales = {}
        for dname, size in dim_sizes.items():
            cdata = np.asarray(coords.get(dname, np.arange(size)))
            ds = f.create_dataset(dname, data=cdata)
            ds.make_scale(dname)
            for k, v in coord_attrs.get(dname, {}).items():
                ds.attrs[k] = v
            scales[dname] = ds

        for name, var in plain.items():
            data = np.asarray(var.data)
            ds = f.create_dataset(name, data=data)
            for i, d in enumerate(var.dims):
                ds.dims[i].attach_scale(scales[d])
            for k, v in (var.attrs or {}).items():
                ds.attrs[k] = v
        for k, v in (global_attrs or {}).items():
            f.attrs[k] = v
    return path


def load_land_mask(path: str, var: str = "lsm", threshold: float = 0.5):
    """Load an ERA5-style land-sea mask raster -> (mask bool (nlat, nlon),
    lats, lons). Mirrors the mask usage in the reference examples
    (`examples/simulations/soil_heat_global.jl`, `inputs/*.nc`)."""
    data = read_netcdf(path, [var, "lat", "lon", "latitude", "longitude"])
    lsm = data[var].data
    lsm = lsm[0] if lsm.ndim == 3 else lsm
    lats = data["lat"].data if "lat" in data else data["latitude"].data
    lons = data["lon"].data if "lon" in data else data["longitude"].data
    mask = np.nan_to_num(lsm, nan=0.0) > threshold
    # orient north-to-south to match RingGrid convention
    if lats[0] < lats[-1]:
        lats = lats[::-1]
        mask = mask[::-1]
    return mask, lats, lons
