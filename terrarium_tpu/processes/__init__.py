from .base import Context, Process
from .atmosphere import (AmbientCO2, ConstantAerodynamics,
                         LongShortWaveRadiation, MoninObukhovAerodynamics,
                         PrescribedAtmosphere, RainSnow, SpecificHumidity,
                         TracerGas)
from .snow import SnowCoverAlbedo, Snowpack
