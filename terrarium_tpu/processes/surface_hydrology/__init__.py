from .surface_hydrology import (BareGroundEvaporation,
                                ConstantEvaporationResistanceFactor,
                                DirectSurfaceRunoff, NoCanopyInterception,
                                PALADYNCanopyEvapotranspiration,
                                PALADYNCanopyInterception,
                                SoilMoistureResistanceFactor, SurfaceHydrology)
