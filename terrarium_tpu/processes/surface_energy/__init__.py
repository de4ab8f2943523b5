from .seb import (ConstantAlbedo, DiagnosedRadiativeFluxes,
                  DiagnosedTurbulentFluxes, ImplicitSkinTemperature,
                  PrescribedAlbedo, PrescribedRadiativeFluxes,
                  PrescribedSkinTemperature, PrescribedTurbulentFluxes,
                  SurfaceEnergyBalance)
