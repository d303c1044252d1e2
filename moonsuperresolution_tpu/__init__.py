"""moonsuperresolution_tpu — a TPU-native (JAX/XLA/pjit/Pallas) lunar DEM
super-resolution framework.

A from-scratch rebuild of the capabilities of AntoineRichard/MoonSuperResolution
(TensorFlow 2.x research code) as an idiomatic JAX framework:

- ``models``   : SPADE GauGAN family + pix2pix U-Net, as flax.linen modules
                 (reference: spade/models/*.py, pix2pix.py)
- ``ops``      : resize / image-gradient / patch-fold primitives tuned for XLA:TPU,
                 with Pallas kernels for the hot blend path
- ``losses``   : the full 9-loss library (reference: spade/losses.py)
- ``data``     : WAC/SLDEM tiling, HDF5 tile store, host sampler + augmentations
                 (reference: make_h5.py, sampler.py, missing tile_WAC_MOS.py)
- ``train``    : jitted train steps, recipes for the six reference training CLIs,
                 Orbax checkpoint/resume, TensorBoard logging
- ``infer``    : the large-raster sliding-window SR engine with on-device
                 Gaussian-weighted uncertainty blending
                 (reference: process_full_tiles.py)
- ``geo``      : GeoTIFF I/O without GDAL (pure Python + C++ LZW codec)
- ``parallel`` : device-mesh / sharding utilities (DP + TP + spatial sharding)
"""

__version__ = "0.1.0"
