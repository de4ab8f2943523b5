from .vegetation import (FieldCapacityLimitedPAW, LUEPhotosynthesis,
                         MedlynStomatalConductance,
                         PALADYNAutotrophicRespiration, PALADYNCarbonDynamics,
                         PALADYNPhenology, PALADYNVegetationDynamics,
                         StaticExponentialRootDistribution, VegetationCarbon)
