from moonsuperresolution_tpu.data.sampler import (
    TileSampler,
    SyntheticSampler,
    BatchPrefetcher,
    augment_batch,
)
from moonsuperresolution_tpu.data.h5_builder import build_h5_dataset
from moonsuperresolution_tpu.data.wac_tiler import tile_wac_mosaic

__all__ = [
    "TileSampler",
    "SyntheticSampler",
    "BatchPrefetcher",
    "augment_batch",
    "build_h5_dataset",
    "tile_wac_mosaic",
]
