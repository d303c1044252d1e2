from moonsuperresolution_tpu.utils.checkpoint import (
    save_checkpoint,
    restore_checkpoint,
    save_params,
    restore_params,
)
from moonsuperresolution_tpu.utils.colorize import colorize

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "save_params",
    "restore_params",
    "colorize",
]
