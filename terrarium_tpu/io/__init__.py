from .input_sources import FieldInputSource, TimeSeriesInputSource
from .netcdf import load_land_mask, read_netcdf, write_netcdf
from .raster import RasterInputSource, raster_input_source
from .output import (AveragedTimeInterval, FieldTimeSeriesWriter,
                     NetCDFRasterWriter, IterationInterval, ProgressLogger, TimeInterval,
                     load_field_time_series)
from .checkpoint import load_checkpoint, save_checkpoint
from .forcing_pipeline import ChunkedForcingPipeline
