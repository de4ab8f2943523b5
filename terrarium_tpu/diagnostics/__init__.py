from .debug import DEBUG, debug_callback, enable_debug, nancheck
