"""Host-side training data pipeline.

The reference streams samples from an HDF5 tile store through a Python
generator (reference: sampler.py:11-61) into tf.data.  Here the pipeline is a
plain numpy producer plus a background-thread batch prefetcher that keeps the
TPU fed via ``jax.device_put`` double-buffering; all heavy per-pixel work
(resizes) uses OpenCV on the host exactly like the reference, so training
distributions match.

Per-sample recipe (reference: sampler.py:40-59):
1. random square crop of 500..997 px from the 1000-px tile pair
2. per-crop min-max normalization of the DEM
3. resize both to ``hw`` (the reference passes INTER_CUBIC *positionally* to
   cv2.resize — which is the ``dst`` argument, so it actually runs the
   default bilinear; we use genuine cubic, the stated intent, and keep a knob)
4. random planar tilt augmentation: add random x/y ramps, then renormalize
5. re-normalize DEM to [-0.5, 0.5]
6. synthesize the low-res DEM: INTER_AREA down /16, INTER_CUBIC back up
7. ortho / 255 - 0.5; input = concat([ortho, lr_dem], -1), label = dem

Batch augmentations (reference: sampler.py:63-93): random 90-degree
rotations, random lr/ud flips, random brightness/contrast on the ortho
channel only.
"""

from __future__ import annotations

import pickle
import queue
import threading
from typing import Iterator, Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in CI
    cv2 = None


def _resize(img: np.ndarray, hw: int, interpolation: str) -> np.ndarray:
    inter = {
        "cubic": cv2.INTER_CUBIC,
        "linear": cv2.INTER_LINEAR,
        "area": cv2.INTER_AREA,
    }[interpolation]
    return cv2.resize(img, (hw, hw), interpolation=inter)


class TileSampler:
    """Sample (source, target) training pairs from the HDF5 tile store.

    Reads the same artifact formats the reference produces (MoonORTO2DEM.hdf5
    plus train/val key-dict pickles, make_h5.py:70-93) so existing datasets
    drop in unchanged.
    """

    def __init__(
        self,
        h5_path: str,
        pkl_path: str,
        hw: int = 256,
        upscaling: int = 16,
        interpolation: str = "cubic",
        seed: Optional[int] = None,
        process_index: int = 0,
        process_count: int = 1,
    ):
        import h5py

        self.hw = hw
        self.us = upscaling
        self.interpolation = interpolation
        with open(pkl_path, "rb") as f:
            self.dataset = pickle.load(f)
        self.keys = list(self.dataset.keys())
        self.global_num_samples = len(self.keys)
        self.process_count = process_count
        if process_count > 1:
            # Multi-host data parallelism: each process samples a disjoint
            # slice of the key space (the reference is single-process and
            # has no analog; SURVEY §2.2 comm-backend row).
            self.keys = self.keys[process_index::process_count]
        self.num_samples = len(self.keys)
        self.h5 = h5py.File(h5_path, "r")
        self.rng = np.random.default_rng(seed)

    def sample(self, key: str) -> tuple[np.ndarray, np.ndarray]:
        dem_key, ort_key = self.dataset[key]
        hw_crop = 500 + int(self.rng.random() * 498)
        res = 1000 - hw_crop
        plx = int(self.rng.random() * res)
        ply = int(self.rng.random() * res)
        sl = np.s_[plx : plx + hw_crop, ply : ply + hw_crop]
        raw_ort = np.asarray(self.h5[ort_key][sl], dtype=np.float32)
        raw_dem = np.asarray(self.h5[dem_key][sl], dtype=np.float32)

        rng_span = raw_dem.max() - raw_dem.min()
        raw_dem = (raw_dem - raw_dem.min()) / max(rng_span, 1e-12)
        raw_ort = _resize(raw_ort, self.hw, self.interpolation)
        raw_dem = _resize(raw_dem, self.hw, self.interpolation)

        # Random planar tilt: random x and y ramps (sampler.py:51-52).
        ramp = np.arange(self.hw, dtype=np.float32) / (self.hw / 2.0)
        raw_dem = raw_dem + self.rng.random() * ramp[:, None]
        raw_dem = raw_dem + self.rng.random() * ramp[None, :]
        span = raw_dem.max() - raw_dem.min()
        raw_dem = (raw_dem - raw_dem.min()) / max(span, 1e-12) - 0.5

        lo = cv2.resize(
            raw_dem,
            (self.hw // self.us, self.hw // self.us),
            interpolation=cv2.INTER_AREA,
        )
        smt_dem = cv2.resize(lo, (self.hw, self.hw), interpolation=cv2.INTER_CUBIC)
        raw_ort = raw_ort / 255.0 - 0.5

        source = np.stack([raw_ort, smt_dem], axis=-1)
        target = raw_dem[:, :, None]
        assert not np.any(np.isnan(source)) and not np.any(np.isnan(target))
        return source.astype(np.float32), target.astype(np.float32)

    def epoch(self, shuffle: bool = True) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        keys = list(self.keys)
        if shuffle:
            self.rng.shuffle(keys)
        for key in keys:
            yield self.sample(key)

    def batches(
        self,
        batch_size: int,
        shuffle: bool = True,
        augment: bool = False,
        drop_remainder: bool = True,
    ) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        """Yield batched (source [B,H,W,2], target [B,H,W,1]) numpy arrays.
        The reference drops ragged final batches (train_spade_256.py:73-74)."""
        srcs, tgts = [], []
        for s, t in self.epoch(shuffle):
            srcs.append(s)
            tgts.append(t)
            if len(srcs) == batch_size:
                x, y = np.stack(srcs), np.stack(tgts)
                if augment:
                    x, y = augment_batch(x, y, self.rng)
                yield x, y
                srcs, tgts = [], []
        if srcs and not drop_remainder:
            yield np.stack(srcs), np.stack(tgts)


class SyntheticSampler:
    """Synthetic fractal-ish terrain generator for tests and benchmarks.

    Produces pairs with the exact I/O contract of ``TileSampler`` without any
    dataset on disk — the TPU-era analog of the reference's identity-model
    dry-run philosophy (process_full_tiles.py:139-143).
    """

    def __init__(self, hw: int = 256, upscaling: int = 16, seed: int = 0,
                 num_samples: int = 64):
        self.hw = hw
        self.us = upscaling
        self.num_samples = num_samples
        self.rng = np.random.default_rng(seed)

    def _terrain(self) -> np.ndarray:
        hw = self.hw
        out = np.zeros((hw, hw), np.float32)
        for scale in (4, 8, 16, 32):
            bumps = self.rng.standard_normal((scale, scale)).astype(np.float32)
            if cv2 is not None:
                up = cv2.resize(bumps, (hw, hw), interpolation=cv2.INTER_CUBIC)
            else:
                up = np.kron(bumps, np.ones((hw // scale, hw // scale), np.float32))
            out += up / scale
        return out

    def sample(self) -> tuple[np.ndarray, np.ndarray]:
        dem = self._terrain()
        span = dem.max() - dem.min()
        dem = (dem - dem.min()) / max(span, 1e-12) - 0.5
        # Shaded-relief style fake ortho: gradient-lit terrain + noise.
        gy, gx = np.gradient(dem)
        ort = np.clip(0.5 + 3.0 * gx + 0.05 * self.rng.standard_normal(dem.shape),
                      0, 1).astype(np.float32) - 0.5
        if cv2 is not None:
            lo = cv2.resize(dem, (self.hw // self.us,) * 2,
                            interpolation=cv2.INTER_AREA)
            smt = cv2.resize(lo, (self.hw,) * 2, interpolation=cv2.INTER_CUBIC)
        else:
            f = self.us
            lo = dem.reshape(self.hw // f, f, self.hw // f, f).mean((1, 3))
            smt = np.kron(lo, np.ones((f, f), np.float32))
        src = np.stack([ort, smt], -1).astype(np.float32)
        return src, dem[:, :, None].astype(np.float32)

    def batches(self, batch_size: int, num_batches: int):
        for _ in range(num_batches):
            pairs = [self.sample() for _ in range(batch_size)]
            yield (np.stack([p[0] for p in pairs]),
                   np.stack([p[1] for p in pairs]))


def augment_batch(x: np.ndarray, y: np.ndarray, rng: np.random.Generator):
    """Batch augmentation matching the reference's per-sample tf ops
    (sampler.py:63-93): per-sample k*90 rotation, lr/ud flips, and
    brightness/contrast jitter on the ortho channel only."""
    b = x.shape[0]
    xo = np.empty_like(x)
    yo = np.empty_like(y)
    for i in range(b):
        xi, yi = x[i], y[i]
        k = int(rng.integers(0, 4))
        xi = np.rot90(xi, k, axes=(0, 1))
        yi = np.rot90(yi, k, axes=(0, 1))
        if rng.random() > 0.5:
            xi = xi[:, ::-1]
            yi = yi[:, ::-1]
        if rng.random() > 0.5:
            xi = xi[::-1]
            yi = yi[::-1]
        # brightness/contrast on the ortho channel (sampler.py:70-76)
        alpha = rng.random() * 0.2 - 0.1
        beta = rng.random() * 0.3 - 0.15
        xi = xi.copy()
        xi[:, :, 0] = xi[:, :, 0] * (1 + alpha) + beta
        xo[i] = xi
        yo[i] = yi
    return xo, yo


class BatchPrefetcher:
    """Background-thread prefetcher: overlaps host sample synthesis with
    device compute (replaces tf.data prefetch/map, train_spade_256.py:40-43)."""

    _DONE = object()

    def __init__(self, iterator, depth: int = 4):
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self.thread = threading.Thread(
            target=self._worker, args=(iterator,), daemon=True
        )
        self.thread.start()

    def _worker(self, iterator):
        try:
            for item in iterator:
                self.q.put(item)
        finally:
            self.q.put(self._DONE)

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is self._DONE:
                return
            yield item
