from .base import Context, Process
