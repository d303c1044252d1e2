from moonsuperresolution_tpu.ops.resize import (
    resize_nearest,
    resize_separable,
    resize_bilinear,
    resize_cubic,
    area_downscale,
    synthesize_lowres_dem,
)
from moonsuperresolution_tpu.ops.gradients import image_gradients
from moonsuperresolution_tpu.ops.blend import (
    gaussian_blend_kernel,
    fold_weighted_moments,
)

__all__ = [
    "resize_nearest",
    "resize_separable",
    "resize_bilinear",
    "resize_cubic",
    "area_downscale",
    "synthesize_lowres_dem",
    "image_gradients",
    "gaussian_blend_kernel",
    "fold_weighted_moments",
]
