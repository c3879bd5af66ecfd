"""Multimodal actor-pool stages over binary media columns.

Treats image/audio/video as opaque ``binary`` columns with typed
metadata (the north-rule images table).  The image path is fully real
(pure-numpy codecs); audio decode and video frame-sampling are STUBS —
the container ships no media libraries — with real Ray-side plumbing
(schema, batch size, actor signature, output layout) and deterministic
fakes where a test needs flowing data.  Swap ``_decode_audio`` /
``_sample_frames`` for pyav/soundfile-backed bodies on a real cluster.

All stages are callable classes → ``map_batches(Cls, concurrency=N,
batch_size=B)`` actor pools: setup cost (codec tables, plane matrices)
is paid once per actor, per the stateful-stage rule.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import codecs


class ResizeImages:
    """Decode → nearest-neighbor point-sample resize to (out_w, out_h) → re-encode PNG.
    Real end-to-end (no stub)."""

    def __init__(self, out_w: int = 16, out_h: int = 16):
        self.out_w, self.out_h = out_w, out_h

    def _resize(self, px: np.ndarray) -> np.ndarray:
        h, w = px.shape[:2]
        ys = (np.arange(self.out_h) * h // self.out_h).astype(np.int64)
        xs = (np.arange(self.out_w) * w // self.out_w).astype(np.int64)
        return px[np.ix_(ys, xs)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_bytes, ws, hs = [], [], []
        for payload in batch.column("bytes").to_pylist():
            px = self._resize(codecs.decode_image(payload))
            out_bytes.append(codecs.png_encode(px))
            ws.append(px.shape[1])
            hs.append(px.shape[0])
        return pa.table({
            "image_id": batch.column("image_id"),
            "bytes": pa.array(out_bytes, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(["png"] * len(ws), pa.string()),
        })


class ImageFeatures:
    """Deterministic image descriptor: per-channel means/stds + 2-D
    gradient energy → 8-dim float32 vector (a stand-in for a CNN
    embedding; the model-load-once-per-actor pattern is the point)."""

    def __init__(self) -> None:
        self.dim = 8  # "model load" placeholder

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch.column("bytes").to_pylist():
            px = codecs.decode_image(payload).astype(np.float64)
            # 1-pixel-tall/wide images have an empty diff; mean() of an
            # empty array is NaN and would poison downstream distances
            dy = np.abs(np.diff(px, axis=0))
            dx = np.abs(np.diff(px, axis=1))
            gy = dy.mean() if dy.size else 0.0
            gx = dx.mean() if dx.size else 0.0
            f = np.array(
                [px[..., 0].mean(), px[..., 1].mean(), px[..., 2].mean(),
                 px[..., 0].std(), px[..., 1].std(), px[..., 2].std(), gx, gy],
                dtype=np.float32,
            )
            feats.append(f)
        return pa.table({
            "image_id": batch.column("image_id"),
            "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
        })


class DecodeAudio:
    """STUB: audio decode → PCM stats. No audio codec ships in this
    container; raises unless ``fake=True`` (deterministic byte-stats
    fake keeps the pipeline testable)."""

    def __init__(self, fake: bool = False):
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "audio decode requires soundfile/ffmpeg; run with fake=True "
                "for the deterministic stand-in"
            )
        ids = batch.column("media_id").to_pylist()
        stats = []
        for payload in batch.column("bytes").to_pylist():
            arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
            stats.append((float(arr.mean()) if arr.size else 0.0, int(arr.size)))
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "mean_amplitude": pa.array([s[0] for s in stats], pa.float64()),
            "n_samples": pa.array([s[1] for s in stats], pa.int64()),
        })


class SampleFrames:
    """STUB: video frame sampling (every k-th frame → images rows).
    Schema/actor plumbing real; decode raises without a video lib."""

    def __init__(self, every_k: int = 30, fake: bool = False):
        self.every_k = every_k
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("video decode requires pyav/ffmpeg")
        ids, frames, idxs = [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("bytes").to_pylist()):
            # deterministic fake: derive k 8×8 "frames" from the payload hash
            rng = np.random.default_rng(np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64))
            for i in range(3):
                px = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
                ids.append(mid)
                idxs.append(i * self.every_k)
                frames.append(codecs.png_encode(px))
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "frame_index": pa.array(idxs, pa.int32()),
            "bytes": pa.array(frames, pa.binary()),
        })


class ImageQuality:
    """Per-image quality screens used to filter training corpora:
    brightness (luma mean), contrast (luma std), and a blur proxy
    (variance of the 4-neighbor Laplacian — near 0 for flat or
    heavily blurred images, large for sharp detail). Pure numpy over
    the decoded pixels; images smaller than 3×3 have no Laplacian
    interior and report 0.0."""

    _LUMA = np.array([0.299, 0.587, 0.114])

    def __call__(self, batch: pa.Table) -> pa.Table:
        bright, contrast, lap_var = [], [], []
        for payload in batch.column("bytes").to_pylist():
            px = codecs.decode_image(payload).astype(np.float64)
            y = px @ self._LUMA
            bright.append(float(y.mean()))
            contrast.append(float(y.std()))
            if y.shape[0] >= 3 and y.shape[1] >= 3:
                lap = (4.0 * y[1:-1, 1:-1] - y[:-2, 1:-1]
                       - y[2:, 1:-1] - y[1:-1, :-2] - y[1:-1, 2:])
                lap_var.append(float(lap.var()))
            else:
                lap_var.append(0.0)
        return pa.table({
            "image_id": batch.column("image_id"),
            "brightness": pa.array(bright, pa.float64()),
            "contrast": pa.array(contrast, pa.float64()),
            "lap_var": pa.array(lap_var, pa.float64()),
        })


class PixelHash:
    """Exact pixel-content fingerprint: decode → blake2b over the raw
    pixel buffer + shape. Catches images that are byte-different on
    the wire (re-encoded, different container) but pixel-identical —
    the exact-dedup complement to pHash's perceptual grouping."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        hashes = []
        for payload in batch.column("bytes").to_pylist():
            px = codecs.decode_image(payload)
            h = hashlib.blake2b(digest_size=16)
            h.update(np.asarray(px.shape, np.int64).tobytes())
            h.update(np.ascontiguousarray(px).tobytes())
            hashes.append(h.hexdigest())
        return pa.table({
            "image_id": batch.column("image_id"),
            "pixel_hash": pa.array(hashes, pa.string()),
        })


class TilePHash:
    """Crop-localized perceptual hashes: decode → split into a
    ``grid×grid`` tile mosaic → 64-bit pHash per tile. Two images
    sharing ≥ m tile hashes are near-dups robust to LOCAL edits
    (logo swap, caption strip) that flip enough bits of a whole-image
    pHash to evade its hamming ball."""

    def __init__(self, grid: int = 4):
        self.grid = grid

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, tidx, hashes = [], [], []
        g = self.grid
        for iid, payload in zip(batch.column("image_id").to_pylist(),
                                batch.column("bytes").to_pylist()):
            px = codecs.decode_image(payload)
            h, w = px.shape[:2]
            ys = [h * i // g for i in range(g + 1)]
            xs = [w * i // g for i in range(g + 1)]
            for r in range(g):
                for c in range(g):
                    tile = px[ys[r]:ys[r + 1], xs[c]:xs[c + 1]]
                    if tile.size == 0:  # image smaller than the grid
                        continue
                    ids.append(iid)
                    tidx.append(r * g + c)
                    hashes.append(codecs.phash64(tile))
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "tile_idx": pa.array(tidx, pa.int32()),
            "tile_hash": pa.array(hashes, pa.int64()),
        })


class DHash:
    """Difference hash (dHash): decode → luma → resize to 9×8 by
    block averaging → 64 bits of horizontal gradient sign. Invariant
    to global brightness/contrast shifts (the gradient SIGN survives
    any monotone per-pixel remap), which pixel hashing (exact) and
    pHash (DCT magnitudes) are not — the standard cheap third member
    of the perceptual-hash family. Pure numpy; reference behavior for
    the 9×8 buckets follows the common integer block-mean
    formulation."""

    _LUMA = np.array([0.299, 0.587, 0.114])

    @classmethod
    def dhash64(cls, px: np.ndarray) -> int:
        y = px.astype(np.float64) @ cls._LUMA
        h, w = y.shape
        ys = [h * i // 8 for i in range(9)]
        xs = [w * i // 9 for i in range(10)]
        m = np.empty((8, 9), np.float64)
        for r in range(8):
            for c in range(9):
                blk = y[ys[r]:ys[r + 1], xs[c]:xs[c + 1]]
                m[r, c] = blk.mean() if blk.size else 0.0
        bits = (m[:, 1:] > m[:, :-1]).astype(np.uint64).ravel()
        out = np.uint64(0)
        for b in bits:
            out = (out << np.uint64(1)) | b
        return int(out.view(np.int64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = [self.dhash64(codecs.decode_image(p))
                  for p in batch.column("bytes").to_pylist()]
        return pa.table({
            "image_id": batch.column("image_id"),
            "dhash": pa.array(hashes, pa.int64()),
        })


class BorderScreen:
    """Letterbox/pillarbox detector: count uniform border rows (top +
    bottom) and columns (left + right) — a row/column is a "bar" when
    its pixels are all equal to their edge's corner value (exact
    match on the decoded integers; encoded bars are flat by
    construction). Emits per-image bar extents and the content
    fraction, the crop-before-train screen for video thumbnails and
    padded scans."""

    @staticmethod
    def _bars(y: np.ndarray) -> int:
        """Leading rows entirely equal to the top-left corner value."""
        if y.size == 0:
            return 0
        uniform = (y == y[0, 0]).all(axis=1)
        return int(len(uniform) if uniform.all()
                   else uniform.argmin())

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, top, bot, left, right, frac = [], [], [], [], [], []
        for iid, payload in zip(batch.column("image_id").to_pylist(),
                                batch.column("bytes").to_pylist()):
            px = codecs.decode_image(payload)
            g = px.sum(axis=2) if px.ndim == 3 else px
            h, w = g.shape
            t = self._bars(g)
            b = self._bars(g[::-1])
            lf = self._bars(g.T)
            r = self._bars(g.T[::-1])
            t, b = min(t, h), min(b, h - t)
            lf, r = min(lf, w), min(r, w - lf)
            ids.append(iid)
            top.append(t)
            bot.append(b)
            left.append(lf)
            right.append(r)
            content = max(h - t - b, 0) * max(w - lf - r, 0)
            frac.append(content / float(h * w) if h * w else 0.0)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "bar_top": pa.array(top, pa.int32()),
            "bar_bottom": pa.array(bot, pa.int32()),
            "bar_left": pa.array(left, pa.int32()),
            "bar_right": pa.array(right, pa.int32()),
            "content_frac": pa.array(np.round(frac, 6),
                                     pa.float64()),
        })
