from .budget import BudgetTracker, energy_column, energy_rates, water_column, water_rates
from .debug import DEBUG, debug_callback, enable_debug, nancheck
from .profiling import compile_seconds, profile_rollout, step_timings, trace
