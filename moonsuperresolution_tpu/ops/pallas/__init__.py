from moonsuperresolution_tpu.ops.pallas.patches import (
    extract_normalize_patches,
    extract_normalize_patches_reference,
)

__all__ = [
    "extract_normalize_patches",
    "extract_normalize_patches_reference",
]
