from .stratigraphy import (ConstantSoilCarbonDensity, ConstantSoilPorosity,
                           HomogeneousStratigraphy, SoilPorositySURFEX,
                           SoilTexture, SoilVolume, volumetric_fractions)
from .thermal import (FreeWater, InverseQuadratic, SoilHeatCapacities,
                      SoilThermalConductivities, SoilThermalProperties)
from .swrc import BrooksCorey, VanGenuchten
from .hydraulics import (ConstantSoilHydraulics, SoilHydraulicsSURFEX,
                         UnsatKLinear, UnsatKVanGenuchten)
from .energy import SoilEnergyBalance, SoilEnergyTemperatureClosure
from .hydrology import (NoFlow, RichardsEq, SoilHydrology,
                        SoilSaturationPressureClosure)
from .soil_coupled import SoilEnergyWaterCarbon
