from moonsuperresolution_tpu.infer.engine import DEMSuperResolution, load_model_fn
from moonsuperresolution_tpu.infer.fill import fill_nodata, interpolate_missing_values

__all__ = [
    "DEMSuperResolution",
    "load_model_fn",
    "fill_nodata",
    "interpolate_missing_values",
]
