from .spacing import ExponentialSpacing, PrescribedSpacing, UniformSpacing, get_spacing
from .vertical import VerticalGrid
from .column import ColumnGrid
from .ring import ColumnRingGrid, RingGrid, full_gaussian_grid, full_healpix_grid
