from .input_sources import FieldInputSource, TimeSeriesInputSource
from .netcdf import load_land_mask, read_netcdf
from .raster import RasterInputSource, raster_input_source
