from .stepping import ForwardEuler, Heun, explicit_step, update_state
from .implicit import ImplicitEuler
from .integrator import Simulation, initialize
