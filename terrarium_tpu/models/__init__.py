from .boundary_conditions import (FreeDrainage, GeothermalHeatFlux,
                                  GroundHeatFlux, ImpermeableBoundary,
                                  InfiltrationFlux, PrescribedBottomTemperature,
                                  PrescribedSurfaceTemperature)
from .initializers import (ConstantSaturation, ConstantSoilTemperature,
                           DefaultInitializer,
                           PiecewiseLinearInitialSoilTemperature,
                           QuasiThermalSteadyState, SaturationWaterTable,
                           SoilInitializer, apply_field_initializers)
from .soil_model import SoilModel
from .land_model import LandModel
from .vegetation_model import SurfaceEnergyModel, VegetationModel
