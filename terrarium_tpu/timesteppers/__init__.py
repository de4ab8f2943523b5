from .stepping import ForwardEuler, Heun, explicit_step, update_state
from .integrator import Simulation, initialize
