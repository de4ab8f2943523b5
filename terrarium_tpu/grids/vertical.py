"""Vertical finite-volume grid.

Replaces the z-axis machinery of the Oceananigans `RectilinearGrid` used by the
reference (`src/grids/column_grid.jl:20-38`). Coordinates follow the
reference's positive-up convention: the surface is at ``z = 0`` and the soil
extends to negative ``z``. Arrays are stored **bottom-up**: index ``0`` is the
deepest layer, index ``Nz - 1`` the surface layer.

The ghost-spacing convention matches Oceananigans halos on a bounded stretched
axis: the face spacing at the boundary faces equals the thickness of the
adjacent boundary cell.
"""
from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["VerticalGrid"]


@dataclasses.dataclass(frozen=True)
class VerticalGrid:
    """Vertical coordinate arrays (all numpy, bottom-up order).

    Attributes:
        z_faces: ``(Nz + 1,)`` face elevations, ``z_faces[-1] == 0`` (surface).
        z_centers: ``(Nz,)`` cell-center elevations.
        dz: ``(Nz,)`` cell thicknesses ``z_faces[k+1] - z_faces[k]``.
        dz_faces: ``(Nz + 1,)`` center-to-center spacings at faces; boundary
            faces use the adjacent cell thickness (halo mirror convention).
    """

    z_faces: np.ndarray
    z_centers: np.ndarray
    dz: np.ndarray
    dz_faces: np.ndarray

    @staticmethod
    def from_spacing(spacing) -> "VerticalGrid":
        """Build from a spacing object whose thicknesses are listed top-down
        (surface layer first), as in the reference (`column_grid.jl:20-38`
        builds ``z = cumsum(-dz)``)."""
        dz_topdown = np.asarray(spacing.thicknesses(), dtype=np.float64)
        dz = dz_topdown[::-1].copy()  # bottom-up
        nz = dz.shape[0]
        z_faces = np.zeros(nz + 1, dtype=np.float64)
        # accumulate downward from the surface: z_face[-1] = 0
        z_faces[:-1] = -np.cumsum(dz[::-1])[::-1]
        z_centers = 0.5 * (z_faces[:-1] + z_faces[1:])
        dz_faces = np.empty(nz + 1, dtype=np.float64)
        dz_faces[1:-1] = z_centers[1:] - z_centers[:-1]
        dz_faces[0] = dz[0]
        dz_faces[-1] = dz[-1]
        return VerticalGrid(z_faces, z_centers, dz, dz_faces)

    @property
    def nz(self) -> int:
        return self.dz.shape[0]

    @property
    def depth(self) -> float:
        return float(-self.z_faces[0])

    def __eq__(self, other):
        return (isinstance(other, VerticalGrid)
                and np.array_equal(self.z_faces, other.z_faces))

    def __hash__(self):
        return hash(self.z_faces.tobytes())
