from .debug import DEBUG, debug_callback, enable_debug, nancheck
from .profiling import compile_seconds, profile_rollout, step_timings, trace
