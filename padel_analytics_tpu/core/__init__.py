from .profiling import StageTimer, device_trace, log
from .checkpoint import load_checkpoint, save_checkpoint

__all__ = [
    "StageTimer",
    "device_trace",
    "log",
    "load_checkpoint",
    "save_checkpoint",
]
