"""Pallas TPU kernel: fused patch extraction + normalization + validity.

The inference engine's patch preparation (reference semantics:
process_full_tiles.py:449-491 getPatch + normalize) is, in pure XLA, four
passes over the 64x-amplified patch data: gather-extract, min-reduce,
max-reduce, and the normalize map.  This kernel fuses them into a single
HBM traversal: for each patch the kernel DMAs its slab window into VMEM
once, computes per-channel min/max and the any-nodata validity flag, and
writes the zero-centered normalized patch plus its (min, max) denorm stats.

Layout notes (pallas_guide.md): the slabs stay in HBM (`pltpu.ANY`), patch
windows are DMA'd with double buffering so the next patch's copy overlaps
the current patch's VPU work; patch offsets arrive via scalar prefetch
(`PrefetchScalarGridSpec`) because they index the DMA source.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(rows_ref, cols_ref,            # scalar prefetch
            img_hbm, dem_hbm,              # HBM slabs
            out_ref, stats_ref,            # outputs (blocked)
            img_buf, dem_buf, sems,        # scratch
            *, size: int, no_value: float, stride: int):
    n = pl.num_programs(0)
    i = pl.program_id(0)

    # DMA slices must be tile-aligned: rows to the f32 sublane (8 — the
    # engine requires stride % 8 == 0), cols to the lane width (128).  The
    # copy therefore grabs a 128-aligned window at least one lane-tile wider
    # than the patch (width itself 128-aligned), and the kernel realigns
    # with a static slice selected by predication.
    width = -(-(size + 128) // 128) * 128

    def aligned(idx):
        r = pl.multiple_of(rows_ref[idx], 8)
        c = cols_ref[idx]
        c0 = pl.multiple_of((c // 128) * 128, 128)
        return r, c0, c - c0

    def start_copy(slot, idx):
        r, c0, _ = aligned(idx)
        pltpu.make_async_copy(
            img_hbm.at[pl.ds(r, size), pl.ds(c0, width)],
            img_buf.at[slot], sems.at[slot, 0],
        ).start()
        pltpu.make_async_copy(
            dem_hbm.at[pl.ds(r, size), pl.ds(c0, width)],
            dem_buf.at[slot], sems.at[slot, 1],
        ).start()

    def wait_copy(slot, idx):
        r, c0, _ = aligned(idx)
        pltpu.make_async_copy(
            img_hbm.at[pl.ds(r, size), pl.ds(c0, width)],
            img_buf.at[slot], sems.at[slot, 0],
        ).wait()
        pltpu.make_async_copy(
            dem_hbm.at[pl.ds(r, size), pl.ds(c0, width)],
            dem_buf.at[slot], sems.at[slot, 1],
        ).wait()

    slot = jax.lax.rem(i, 2)

    # Warm up the pipeline on the first grid step.
    @pl.when(i == 0)
    def _():
        start_copy(0, 0)

    # Prefetch the next patch while this one computes.
    @pl.when(i + 1 < n)
    def _():
        start_copy(jax.lax.rem(i + 1, 2), i + 1)

    wait_copy(slot, i)

    _, _, off = aligned(i)

    # The lane misalignment off = col % 128 takes only 128/stride distinct
    # values, so realignment is a small set of static slices selected by
    # predication — no dynamic lane indexing needed.
    for k in range(0, 128, stride if stride < 128 else 128):
        @pl.when(off == k)
        def _(k=k):
            img = img_buf[slot, :, k : k + size]
            dem = dem_buf[slot, :, k : k + size]
            imin = jnp.min(img)
            imax = jnp.max(img)
            dmin = jnp.min(dem)
            dmax = jnp.max(dem)
            valid = jnp.logical_and(imin > no_value, dmin > no_value)
            img_n = (img - imin) / jnp.maximum(imax - imin, 1e-12) - 0.5
            dem_n = (dem - dmin) / jnp.maximum(dmax - dmin, 1e-12) - 0.5
            # Channel-FIRST block: a trailing 2-channel dim would be padded
            # to 128 lanes by the (8,128) tiling — 64x VMEM amplification.
            out_ref[0, 0] = img_n
            out_ref[0, 1] = dem_n
            # Per-patch stats go out as one (8, 128) min-tile plane per step
            # (scalar/SMEM outputs would force unblocked staging): lanes
            # 0/1/2 carry valid/dmin/dmax.
            lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            stats = jnp.where(lane == 0, valid.astype(jnp.float32),
                              jnp.where(lane == 1, dmin, dmax))
            stats_ref[0] = stats


@functools.partial(
    jax.jit,
    static_argnames=("grid_hw", "stride", "size", "no_value", "interpret"),
)
def extract_normalize_patches(
    img_slab: jnp.ndarray,
    dem_slab: jnp.ndarray,
    grid_hw: tuple[int, int],
    stride: int,
    size: int,
    no_value: float,
    interpret: bool = False,
):
    """Fused patch preparation.

    Args:
      img_slab, dem_slab: ``[L, L]`` float32 tile slabs (HBM-resident).
      grid_hw: (Gy, Gx) patch grid.
      stride, size: window geometry.
      no_value: nodata sentinel.

    Returns:
      (x_norm ``[Gy*Gx, size, size, 2]``, valid ``[Gy*Gx]`` float32 0/1,
       dmin ``[Gy*Gx]``, dmax ``[Gy*Gx]``) — exactly what the generator
      forward and the denormalizing fold consume.
    """
    gy, gx = grid_hw
    n = gy * gx
    rows = (np.arange(gy)[:, None] * stride).repeat(gx, 1).reshape(-1)
    cols = (np.arange(gx)[None, :] * stride).repeat(gy, 0).reshape(-1)
    rows = jnp.asarray(rows, jnp.int32)
    cols = jnp.asarray(cols, jnp.int32)
    # The kernel DMAs 128-aligned windows wider than the patch.
    extra = -(-(size + 128) // 128) * 128 - size + 128
    img_slab = jnp.pad(img_slab, ((0, 0), (0, extra)))
    dem_slab = jnp.pad(dem_slab, ((0, 0), (0, extra)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 2, size, size), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, size, -(-(size + 128) // 128) * 128), jnp.float32),
            pltpu.VMEM((2, size, -(-(size + 128) // 128) * 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    if stride % 8:
        raise ValueError(f"stride {stride} must be a multiple of 8")
    out, stats = pl.pallas_call(
        functools.partial(_kernel, size=size, no_value=no_value,
                          stride=stride),
        grid_spec=grid_spec,
        interpret=interpret,
        # The default scoped-VMEM budget is the full 16M; cap it so the
        # explicit double-buffer scratch fits alongside.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=12 * 1024 * 1024
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n, 2, size, size), jnp.float32),
            jax.ShapeDtypeStruct((n, 8, 128), jnp.float32),
        ],
    )(rows, cols, img_slab, dem_slab)
    out = jnp.moveaxis(out, 1, -1)  # -> [n, size, size, 2] (NHWC consumers)
    return out, stats[:, 0, 0], stats[:, 0, 1], stats[:, 0, 2]


def extract_normalize_patches_reference(
    img_slab, dem_slab, grid_hw, stride, size, no_value
):
    """Pure-XLA reference implementation (used by tests and as the fallback
    on platforms without Pallas TPU support)."""
    from moonsuperresolution_tpu.ops.blend import extract_patches

    gy, gx = grid_hw
    n = gy * gx
    pi = extract_patches(img_slab, grid_hw, stride, size).reshape(n, size, size)
    pd = extract_patches(dem_slab, grid_hw, stride, size).reshape(n, size, size)
    valid = (
        (jnp.min(pi, axis=(1, 2)) > no_value)
        & (jnp.min(pd, axis=(1, 2)) > no_value)
    ).astype(jnp.float32)
    imin = jnp.min(pi, axis=(1, 2), keepdims=True)
    imax = jnp.max(pi, axis=(1, 2), keepdims=True)
    dmin = jnp.min(pd, axis=(1, 2), keepdims=True)
    dmax = jnp.max(pd, axis=(1, 2), keepdims=True)
    pi_n = (pi - imin) / jnp.maximum(imax - imin, 1e-12) - 0.5
    pd_n = (pd - dmin) / jnp.maximum(dmax - dmin, 1e-12) - 0.5
    x = jnp.stack([pi_n, pd_n], axis=-1)
    return x, valid, dmin[:, 0, 0], dmax[:, 0, 0]
