from .spacing import ExponentialSpacing, PrescribedSpacing, UniformSpacing, get_spacing
from .vertical import VerticalGrid
from .column import ColumnGrid
