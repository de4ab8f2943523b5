from .input_sources import FieldInputSource, TimeSeriesInputSource
