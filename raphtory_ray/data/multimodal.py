"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

Container has no codec libraries, so the *decode* kernels are stubbed: each
stage is a real actor-pool ``map_batches`` class with real schema handling,
batch sizing and output layout; only the innermost bytes→pixels/samples call
is replaced. Two modes per stage:

- ``fake=True``  (default): deterministic fake decode derived from the
  payload bytes (blake2 seeded) — lets the full pipeline run and be tested
  end-to-end with stable outputs.
- ``fake=False``: raises NotImplementedError at the decode call, marking
  exactly where `PIL.Image.open` / `soundfile.read` / `av.open` would go.

Scale notes: binary payloads are large → callers should pass a SMALL
``batch_size`` to map_batches (e.g. 16-64) so batch × concurrency fits the
worker heap; payload columns ride in the object store zero-copy.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _seed_from_bytes(buf: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(buf, digest_size=8).digest(), "little")


def _binary_rows(col) -> list[bytes]:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_pylist()


class DecodeImageStage:
    """binary `image` column → fixed (h, w, 3) uint8 tensor column `pixels`
    + (height, width) metadata. Stub decode; resize is real numpy."""

    def __init__(self, height: int = 32, width: int = 32, fake: bool = True):
        self.h, self.w, self.fake = height, width, fake

    def _decode(self, buf: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image codec not available in this container; "
                "plug PIL.Image.open(io.BytesIO(buf)) here")
        rng = np.random.default_rng(_seed_from_bytes(buf))
        return rng.integers(0, 256, (self.h, self.w, 3), dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        pix = [self._decode(b) for b in _binary_rows(batch["image"])]
        flat = np.stack(pix).reshape(len(pix), -1)
        return pa.table({
            "item_id": batch["item_id"],
            "pixels": pa.FixedSizeListArray.from_arrays(
                pa.array(flat.reshape(-1), pa.uint8()), flat.shape[1]),
            "height": pa.array([self.h] * len(pix), pa.int32()),
            "width": pa.array([self.w] * len(pix), pa.int32()),
        })


class ImageFeatureStage:
    """pixels tensor column → small feature vector (channel means/stds +
    16-bin grey histogram). Fully vectorized; a model-based encoder would
    load its weights in __init__ (once per actor) and batch-infer here."""

    def __init__(self, height: int = 32, width: int = 32):
        self.h, self.w = height, width

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["pixels"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = np.asarray(col.values, dtype=np.float64).reshape(
            len(col), self.h, self.w, 3)
        mean = flat.mean(axis=(1, 2))
        std = flat.std(axis=(1, 2))
        grey = flat.mean(axis=3)
        hist = np.stack([np.histogram(g, bins=16, range=(0, 256))[0]
                         for g in grey]).astype(np.float64)
        feats = np.concatenate([mean, std, hist], axis=1)
        return pa.table({
            "item_id": batch["item_id"],
            "features": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1), pa.float64()), feats.shape[1]),
        })


class DecodeAudioStage:
    """binary `audio` column → mono float32 samples (fixed-rate stub) +
    duration metadata."""

    def __init__(self, sample_rate: int = 16000, max_seconds: float = 1.0,
                 fake: bool = True):
        self.sr, self.max_s, self.fake = sample_rate, max_seconds, fake

    def _decode(self, buf: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "audio codec not available; plug soundfile.read here")
        rng = np.random.default_rng(_seed_from_bytes(buf))
        n = int(self.sr * self.max_s * (0.25 + 0.75 * rng.random()))
        return rng.standard_normal(n).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        waves = [self._decode(b) for b in _binary_rows(batch["audio"])]
        lens = np.array([len(w) for w in waves], dtype=np.int64)
        values = np.concatenate(waves) if waves else np.empty(0, np.float32)
        offsets = np.r_[0, np.cumsum(lens)].astype(np.int32)
        return pa.table({
            "item_id": batch["item_id"],
            "samples": pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(values, pa.float32())),
            "duration_s": pa.array(lens / self.sr, pa.float64()),
        })


class FrameSampleStage:
    """binary `video` column → every Nth frame as fake (h, w, 3) tensors,
    one output ROW PER FRAME (flat_map layout: downstream stages see frames
    as first-class rows)."""

    def __init__(self, every_n: int = 10, n_frames: int = 30,
                 height: int = 16, width: int = 16, fake: bool = True):
        self.every_n, self.n_frames = every_n, n_frames
        self.h, self.w, self.fake = height, width, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, fidx = [], [], []
        for item, buf in zip(batch["item_id"].to_pylist(),
                             _binary_rows(batch["video"])):
            if not self.fake:
                raise NotImplementedError(
                    "video codec not available; plug av.open here")
            rng = np.random.default_rng(_seed_from_bytes(buf))
            for f in range(0, self.n_frames, self.every_n):
                ids.append(item)
                fidx.append(f)
                frames.append(rng.integers(
                    0, 256, (self.h, self.w, 3), dtype=np.uint8))
        if not frames:
            return pa.table({"item_id": pa.array([], pa.int64()),
                             "frame_idx": pa.array([], pa.int32()),
                             "pixels": pa.array([], pa.list_(pa.uint8()))})
        flat = np.stack(frames).reshape(len(frames), -1)
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int32()),
            "pixels": pa.FixedSizeListArray.from_arrays(
                pa.array(flat.reshape(-1), pa.uint8()), flat.shape[1]),
        })


def decode_images(ds, height=32, width=32, batch_size: int = 64,
                  concurrency=(2, 8)):
    return ds.map_batches(DecodeImageStage,
                          fn_constructor_kwargs={"height": height,
                                                 "width": width},
                          batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size, concurrency=concurrency)


def image_features(ds, height=32, width=32, batch_size: int = 256,
                   concurrency=(2, 8)):
    return ds.map_batches(ImageFeatureStage,
                          fn_constructor_kwargs={"height": height,
                                                 "width": width},
                          batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size, concurrency=concurrency)


def decode_audio(ds, batch_size: int = 64, concurrency=(2, 8)):
    return ds.map_batches(DecodeAudioStage, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size,
                          concurrency=concurrency)


def sample_frames(ds, every_n=10, batch_size: int = 16, concurrency=(2, 8)):
    return ds.map_batches(FrameSampleStage,
                          fn_constructor_kwargs={"every_n": every_n},
                          batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size, concurrency=concurrency)
