"""Typed configuration tree with per-recipe presets.

The reference hardcodes hyperparameters in six near-identical training
scripts (train_spade_256.py:23-24, train_spade_512.py:21-22,
train_spade_no_kl_512.py:21-22, train_cnn_256.py:21-22, train_cnn_512.py:20-21,
train_pix2pix.py:24-48) and an argparse dataclass for inference
(process_full_tiles.py:53-127).  Here everything is one dataclass tree with
named presets mirroring those six scripts.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    variant: str = "gaugan"  # gaugan | gaugan_no_kl | cnn_spade | pix2pix
    image_size: int = 256
    latent_dim: int = 256
    alpha: float = 0.2
    # SPADE statistics: "batch" reproduces the reference's tf.nn.moments over
    # (0,1,2); "instance" is the published-SPADE per-sample choice.
    spade_stats: str = "batch"
    # Loss coefficients (reference defaults per variant are set by presets).
    feature_loss_coeff: float = 10.0
    vgg_feature_loss_coeff: float = 0.1
    kl_divergence_loss_coeff: float = 0.1
    consistency_loss_coeff: float = 2.0
    mse_loss_coeff: float = 1.0
    normal_loss_coeff: float = 1.0
    gradient_loss_coeff: float = 1.0
    l1_lambda: float = 100.0  # pix2pix
    pix2pix_depth: int = 8    # U-Net depth (8 = reference; lower for tests)
    # The reference is inconsistent here (sampler uses 16, GauGAN's
    # ConsistencyLoss defaults to 10 — SURVEY.md §0.6).  We standardize on 16.
    upscaling_factor: int = 16
    # Generator SPADE-resblock channel plan (reference: networks.py:44-50)
    # and encoder/discriminator base widths (networks.py:8-34, 60-76).
    # Defaults reproduce the reference; smaller plans give scaled-down
    # variants (and fast-compiling models for multi-process tests).
    channel_plan: tuple = (1024, 1024, 1024, 512, 256, 128)
    encoder_filters: int = 64
    disc_filters: int = 64
    # Compute dtype for conv/matmul activations ("float32" or "bfloat16").
    compute_dtype: str = "float32"
    # Dtype for SPADE normalization statistics; float32 for training,
    # bfloat16 is an inference-speed option.
    stats_dtype: str = "float32"
    # Fuse each SPADE's gamma/beta convs into one 2F-channel conv (single-
    # chip HBM win, bitwise identical).  Set False for tensor-parallel
    # meshes: the fused output's channel halves land on different shards,
    # so slicing gamma/beta forces cross-device collective-permutes; the
    # unfused convs partition communication-free.  The param tree is
    # identical in both modes (checkpoints interchange freely).
    fuse_spade_gb: bool = True
    # Compute the generator's final upsample + 4x4 head conv as an exactly-
    # equivalent subpixel conv at pre-upsample resolution (networks.py::
    # collapse_head_kernel) — the full-resolution 128-channel activation
    # never materializes.  Param tree identical; False restores the literal
    # reference structure.
    subpixel_head: bool = True


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    gen_lr: float = 1e-4
    disc_lr: float = 5e-5
    beta1: float = 0.0
    beta2: float = 0.999
    eps: float = 1e-7  # Keras Adam default epsilon


@dataclasses.dataclass(frozen=True)
class DataConfig:
    h5_path: str = ""
    train_pkl: str = ""
    val_pkl: str = ""
    crop_min: int = 500   # random crop range from the 1000px tiles
    crop_max: int = 997   # (reference: sampler.py:40)
    tile_size: int = 1000
    tile_offset: int = 500
    prefetch: int = 32
    num_workers: int = 2


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    recipe: str = "spade_256"
    model: ModelConfig = ModelConfig()
    optimizer: OptimizerConfig = OptimizerConfig()
    data: DataConfig = DataConfig()
    batch_size: int = 16
    # Gradient accumulation: optimizer updates apply every ``grad_accum``
    # micro-steps with mean-accumulated gradients (effective batch =
    # grad_accum * batch_size).  Lets the 512 recipes (reference bs2,
    # train_spade_512.py:21-22) train at larger effective batch without
    # exceeding HBM.
    grad_accum: int = 1
    epochs: int = 300
    seed: int = 0
    output_path: str = "."
    log_every_frac: float = 0.1     # TB logging every 10% of an epoch
    checkpoint_every_epochs: int = 1
    keep_checkpoints: int = 3
    vgg_weights_path: Optional[str] = None
    mesh_shape: Optional[tuple] = None  # (data, model); None = all-data


def _preset(recipe: str, **kw) -> TrainConfig:
    return TrainConfig(recipe=recipe, **kw)


RECIPES = {
    # train_spade_256.py:23-24 — GauGAN @256, bs16, 300 epochs
    "spade_256": _preset(
        "spade_256",
        model=ModelConfig(variant="gaugan", image_size=256),
        batch_size=16, epochs=300,
    ),
    # train_spade_512.py:21-22 — GauGAN @512, bs2, 300 epochs
    "spade_512": _preset(
        "spade_512",
        model=ModelConfig(variant="gaugan", image_size=512),
        batch_size=2, epochs=300,
    ),
    # train_spade_no_kl_512.py:21-22 — GauGAN_no_KL @512 (feature 5, normal 1,
    # gradient 1, consistency 2, upscaling 16; model.py:27-59)
    "spade_no_kl_512": _preset(
        "spade_no_kl_512",
        model=ModelConfig(variant="gaugan_no_kl", image_size=512,
                          feature_loss_coeff=5.0),
        batch_size=2, epochs=300,
    ),
    # train_cnn_256.py:21-22 — CNNSpade @256, bs32, 100 epochs (model.py:646-650)
    "cnn_256": _preset(
        "cnn_256",
        model=ModelConfig(variant="cnn_spade", image_size=256,
                          vgg_feature_loss_coeff=1e-4,
                          normal_loss_coeff=0.5, gradient_loss_coeff=0.5),
        batch_size=32, epochs=100,
    ),
    # train_cnn_512.py:20-21 — CNNSpade @512, bs2, 100 epochs
    "cnn_512": _preset(
        "cnn_512",
        model=ModelConfig(variant="cnn_spade", image_size=512,
                          vgg_feature_loss_coeff=1e-4,
                          normal_loss_coeff=0.5, gradient_loss_coeff=0.5),
        batch_size=2, epochs=100,
    ),
    # train_pix2pix.py:24-48 — pix2pix @256, bs64, 300 epochs, Adam(2e-4, b1=0.5)
    "pix2pix": _preset(
        "pix2pix",
        model=ModelConfig(variant="pix2pix", image_size=256),
        optimizer=OptimizerConfig(gen_lr=2e-4, disc_lr=2e-4, beta1=0.5),
        batch_size=64, epochs=300,
    ),
}


@dataclasses.dataclass
class DSRConfig:
    """Large-raster inference configuration (reference:
    process_full_tiles.py:53-66)."""

    image_size: int = 256
    stride: int = 32
    batch_size: int = 16
    tile_size: int = 1024
    no_value: float = -32768.0
    upsample_factor: float = 1.0  # reserved, unused (parity with reference)
    map_name: Optional[str] = None
    save_path: Optional[str] = None
    source_folder_path: Optional[str] = None
    ortho_image_name: str = "run-DRG.tif"
    dem_name: str = "run-DEM.tif"
    model_path: Optional[str] = None
    model_kind: str = "gaugan"  # gaugan | cnn_spade | identity
    # TPU-specific knobs (new in this framework):
    compute_dtype: str = "bfloat16"
    # "int8": dynamically-quantized generator convs (2x MXU rate on v5e);
    # opt-in speed mode with a small measured output deviation (models/quant).
    quantize: str = "none"
    # Process-pool size for nodata hole filling (0 = one per CPU).
    fill_workers: int = 0
    # Unroll factor for the chunk scan in the tile program (trades compile
    # time/code size for cross-chunk overlap).
    scan_unroll: int = 1
    save_tiles: bool = False  # reference writes per-tile .tifs; we keep in RAM
    # Use the fused Pallas patch-prep kernel (ops/pallas/patches.py) instead
    # of the XLA extract+normalize path: +6% end-to-end at 512/64 on v5e
    # (BENCH r2: 172.7 vs 162.6 patches/s).  Auto-falls-back to the XLA path
    # when stride % 8 != 0.
    use_pallas_patches: bool = True
    # Pack only *valid* patches (densely, grid order) into generator batches,
    # exactly the reference's batch composition (process_full_tiles.py:
    # 449-474).  Matters because SPADE's batch-coupled moments make outputs
    # depend on batch membership; False runs fixed grid-order chunks in which
    # invalid patches participate in the moments.
    pack_valid: bool = True
    # Seed for the per-patch latent draws (Monte-Carlo uncertainty source);
    # per-tile keys are derived deterministically from it.
    seed: int = 0
