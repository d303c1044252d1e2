"""Incremental /16 low-res DEM synthesis for the streaming engine.

The sequential streaming pipeline (phase A of infer/streaming.py) must finish
the whole quarter-res build — stream the DEM, fill nodata, downscale again —
before the first tile runs; on the production raster that is minutes of host
time the device spends idle (reference shape: the strictly sequential
load -> preprocess -> tiles phases of process_full_tiles.py:568-587).

This module runs the same computation on a *producer thread* that publishes
``s16`` (the /16 DEM) rows as soon as they are final, so tile-row bands start
processing while the tail of the raster is still being read:

- raw DEM rows stream in chunks; each chunk's /4 INTER_AREA quarter rows are
  appended (integer box mean, so chunked == full-raster bitwise);
- the quarter-res nodata fill is the same bordered 256-px tile sweep as
  ``fill_nodata`` (every fill tile reads *raw* quarter rows, exactly like the
  full-raster sweep, so per-tile results are bit-exact); a fill-tile row at
  ``y`` runs as soon as quarter rows ``< y + 256`` are loaded;
- a quarter row is final once no pending fill tile can still write it
  (pending head ``y_next`` first writes at ``y_next + border``); final rows
  convert to s16 rows in aligned 4-row groups (the possibly-partial last
  group is produced with the same clipped-box normalization cv2 uses —
  pinned by tests/test_streaming_overlap.py).

``wait_rows(q)`` blocks until s16 rows ``[0, q)`` are published (re-raising
any producer error); rows beyond the watermark are undefined.
"""

from __future__ import annotations

import threading

import numpy as np


def _clipped_box_row(tail: np.ndarray, out_w: int) -> np.ndarray:
    """One /4 INTER_AREA output row from a partial (<4-row) input band:
    4-wide column boxes (plus a clipped last box when out_w rounds up),
    each normalized by the covered element count — cv2's area-fast
    boundary semantics.  NaN propagates like cv2's weighted sum."""
    r, wq = tail.shape
    nfc = min(out_w, wq // 4)
    body = tail[:, : nfc * 4].reshape(r, nfc, 4).sum(
        axis=(0, 2), dtype=np.float32) / np.float32(4 * r)
    if out_w > nfc:
        rem = tail[:, nfc * 4 :]
        last = rem.sum(dtype=np.float32) / np.float32(rem.size)
        body = np.concatenate([body, np.float32([last])])
    return body[None, :]


class IncrementalLrSynth:
    """Producer-thread /16 DEM synthesizer, bit-exact with the sequential
    phase-A build."""

    TILE = 256
    BORDER = 32
    MAX_FILL_AREA = 24

    def __init__(self, dem_reader, h: int, w: int, no_value: float,
                 fill_method: str = "fast", workers: int = 1,
                 chunk_rows: int = 4096):
        assert h % 4 == 0 and w % 4 == 0, (h, w)
        assert chunk_rows % 4 == 0
        self.h, self.w = h, w
        self.hq, self.wq = h // 4, w // 4
        # cv2.resize(fx=0.25) output geometry (cvRound == round-half-even)
        self.h16 = int(round(self.hq * 0.25))
        self.w16 = int(round(self.wq * 0.25))
        self.no_value = no_value
        self.fill_method = fill_method
        self.workers = workers
        self.chunk_rows = chunk_rows
        self._dem_reader = dem_reader

        # raw quarter (fill-tile inputs) and filled quarter (s16 source)
        self._q_raw = np.empty((self.hq, self.wq), np.float32)
        self._q_out = np.empty((self.hq, self.wq), np.float32)
        self.s16 = np.empty((self.h16, self.w16), np.float32)

        self._cond = threading.Condition()
        self._ready16 = 0          # published s16 rows
        self._error = None
        stride = self.TILE - 2 * self.BORDER
        self._fill_rows = list(range(0, self.hq, stride))  # pending tile rows
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    # ---------------------------------------------------------------- public

    def wait_rows(self, q1: int) -> None:
        """Block until s16 rows [0, min(q1, h16)) are published."""
        q1 = min(q1, self.h16)
        with self._cond:
            while self._ready16 < q1 and self._error is None:
                self._cond.wait(timeout=1.0)
            if self._error is not None:
                raise self._error

    def join(self) -> None:
        self._thread.join()
        with self._cond:
            if self._error is not None:
                raise self._error

    # -------------------------------------------------------------- producer

    def _produce(self) -> None:
        try:
            self._produce_inner()
        except BaseException as e:  # re-raised in the consumer thread
            with self._cond:
                self._error = e
                self._cond.notify_all()

    def _produce_inner(self) -> None:
        import cv2

        nv = self.no_value
        for y in range(0, self.h, self.chunk_rows):
            y1 = min(self.h, y + self.chunk_rows)
            raw = self._dem_reader.read_rows(y, y1).astype(np.float32)
            raw[raw <= nv] = np.nan
            q = cv2.resize(raw, (self.wq, (y1 - y) // 4),
                           interpolation=cv2.INTER_AREA)
            q[np.isnan(q)] = nv
            self._q_raw[y // 4 : y1 // 4] = q
            self._q_out[y // 4 : y1 // 4] = q
            self._step(loaded_q=y1 // 4, final=y1 == self.h)

    def _step(self, loaded_q: int, final: bool) -> None:
        """Run runnable fill tiles, then publish newly-final s16 rows."""
        t, b = self.TILE, self.BORDER
        stride = t - 2 * b
        jobs = []
        while self._fill_rows and (
            final or self._fill_rows[0] + t <= loaded_q
        ):
            y = self._fill_rows.pop(0)
            ymax = min(y + t - b, self.hq - b)
            for x in range(0, self.wq, stride):
                xmax = min(x + t - b, self.wq - b)
                tile = self._q_raw[y : y + t, x : x + t]
                if (tile <= self.no_value).any():
                    jobs.append((y, ymax, x, xmax, tile.copy()))
        if jobs:
            filled = self._fill_tiles([j[-1] for j in jobs])
            for (y, ymax, x, xmax, _), ftile in zip(jobs, filled):
                self._q_out[y + b : ymax, x + b : xmax] = ftile[
                    b : b + max(0, ymax - y - b),
                    b : b + max(0, xmax - x - b),
                ]
        if self._fill_rows:
            final_q = min(self._fill_rows[0] + b, loaded_q)
        else:
            final_q = self.hq if final else min(loaded_q, self.hq)
        self._publish(final_q, flush=final)

    def _fill_tiles(self, tiles):
        from moonsuperresolution_tpu.infer.fill import (
            _fill_one,
            interpolate_missing_values,
        )

        if self.workers > 1 and len(tiles) > 1:
            import concurrent.futures

            with concurrent.futures.ProcessPoolExecutor(
                max_workers=min(self.workers, len(tiles))
            ) as pool:
                return list(pool.map(
                    _fill_one,
                    [(tile, self.no_value, self.MAX_FILL_AREA,
                      self.fill_method) for tile in tiles],
                ))
        return [
            interpolate_missing_values(
                tile, self.no_value, max_fill_area=self.MAX_FILL_AREA,
                method=self.fill_method)
            for tile in tiles
        ]

    def _publish(self, final_q: int, flush: bool) -> None:
        """Convert final quarter rows to s16 rows with cv2.resize(fx=0.25)
        on 4-aligned row bands — bitwise identical to the single global call
        (same fx-derived scale, so identical row/column boxes incl. the
        clipped right edge; pinned by tests/test_streaming_overlap.py).  A
        partial tail group (hq % 4 of 2 or 3 when h16 rounds up -> one
        clipped output row) is emitted on flush via _clipped_box_row."""
        import cv2

        q1 = final_q // 4          # publishable *full* output rows
        a = self._ready16
        if q1 > a:
            band = self._q_out[4 * a : 4 * q1].copy()
            band[band <= self.no_value] = np.nan
            self.s16[a:q1] = cv2.resize(
                band, (0, 0), fx=0.25, fy=0.25,
                interpolation=cv2.INTER_AREA)
            with self._cond:
                self._ready16 = q1
                self._cond.notify_all()
        if flush and self.h16 > self._ready16:
            # Partial tail group: fewer than 4 quarter rows left (hq % 4 of
            # 2 or 3 — e.g. the production raster, hq=3750).  cv2.resize
            # with fx=0.25 would compute the output height as
            # round(rows * 0.25) == 0 for a 2-row band (empty dsize error),
            # so build the clipped boxes directly: cv2's area-fast path
            # normalizes boundary boxes by the ACTUAL covered count
            # (verified empirically; within 1 ulp of the global call —
            # tests/test_streaming_overlap.py pins the deviation bound).
            a = self._ready16
            tail = self._q_out[4 * a :].astype(np.float32)
            tail[tail <= self.no_value] = np.nan
            self.s16[a:] = _clipped_box_row(tail, self.w16)
            with self._cond:
                self._ready16 = self.h16
                self._cond.notify_all()
