"""Multimodal (image/audio/video) actor-pool stages — plumbing-first.

A training-data pipeline at 100 TB carries media as opaque ``binary``
columns with typed metadata, decoded/feature-extracted inside actor-pool
``map_batches`` stages (decoder state built once per actor).  This
container ships no codec libraries (no PIL/libav — see repo environment
constraints), so the decode kernels are gated: if a real library imports it
is used, otherwise a clearly-marked deterministic fallback keeps the
Ray-side plumbing (schemas, batch sizing, actor lifecycle, output layout)
real and testable.  Swapping in a real decoder changes ONE method.

Batch-size guidance: media rows are large (MBs); callers should pass small
``batch_size`` (8-64) so ``batch_size × concurrency`` payloads fit in a
worker heap, and let the object store spill cold blocks.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

try:  # real decoder if present (not in this container)
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def _fake_meta(blob: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in decode: metadata derived from a stable digest
    of the payload bytes (NOT a real image parse — see module docstring)."""
    h = hashlib.blake2b(blob, digest_size=8).digest()
    w = 64 + h[0] % 192
    return w, 64 + h[1] % 192, ["rgb", "rgba", "gray"][h[2] % 3]


class DecodeImage:
    """``(id, payload:binary)`` → + ``(width, height, mode, decode_ok)``.

    Real pixel decoding raises ``NotImplementedError`` without PIL; rows
    that fail to decode are flagged, not dropped (quarantine-filter
    downstream — the reference's unreadable-file policy, Files.pm:229-233).
    """

    def __init__(self, *, payload_col: str = "payload", strict: bool = False):
        self.payload_col = payload_col
        self.strict = strict

    def decode_pixels(self, blob: bytes) -> np.ndarray:
        if not _HAVE_PIL:
            raise NotImplementedError(
                "pixel decode requires an image library; this container "
                "ships none (stub per repo constraints)"
            )
        raise NotImplementedError("wire PIL here when available")

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.payload_col].to_pylist()
        w, h, m, ok = [], [], [], []
        for b in blobs:
            try:
                if self.strict:
                    self.decode_pixels(b or b"")
                wi, hi, mi = _fake_meta(b or b"")
                w.append(wi)
                h.append(hi)
                m.append(mi)
                ok.append(True)
            except (NotImplementedError, ValueError):
                w.append(0)
                h.append(0)
                m.append("")
                ok.append(False)
        return (
            batch.append_column("width", pa.array(w, type=pa.int32()))
            .append_column("height", pa.array(h, type=pa.int32()))
            .append_column("mode", pa.array(m, type=pa.string()))
            .append_column("decode_ok", pa.array(ok))
        )


class ImageFeatures:
    """``(id, payload)`` → + ``embedding: list<float32>[dim]``.

    Feature extractor = seeded random projection of the payload's byte
    histogram (deterministic fake standing in for a vision model; the
    projection matrix is built ONCE per actor in ``__init__`` — the part a
    real model-loading stage must get right)."""

    def __init__(self, *, payload_col: str = "payload", dim: int = 64,
                 seed: int = 42):
        self.payload_col = payload_col
        self.dim = dim
        rng = np.random.default_rng(seed)
        self.proj = rng.standard_normal((256, dim)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.payload_col].to_pylist()
        hist = np.zeros((len(blobs), 256), dtype=np.float32)
        for i, b in enumerate(blobs):
            if b:
                hist[i] = np.bincount(
                    np.frombuffer(b, dtype=np.uint8), minlength=256
                ).astype(np.float32)
        norm = np.linalg.norm(hist, axis=1, keepdims=True)
        emb = (hist / np.maximum(norm, 1e-9)) @ self.proj
        return batch.append_column(
            "embedding",
            pa.array(list(emb), type=pa.list_(pa.float32())),
        )


class ResizeImage:
    """``(id, payload)`` → + ``(payload_resized:binary, out_width, out_height)``.

    Stand-in for a decode→resize→re-encode kernel: without a codec library
    the "resize" is a deterministic byte-level downsample to a size
    proportional to ``(target_w × target_h) / (fake_w × fake_h)`` of the
    original payload — preserving the real stage's contract that output
    rows are smaller, schema-stable, and computed per-batch in an actor
    (resize kernels/LUTs built once per actor in a real implementation)."""

    def __init__(self, *, payload_col: str = "payload",
                 target_w: int = 224, target_h: int = 224):
        self.payload_col = payload_col
        self.target_w = target_w
        self.target_h = target_h

    def resize_pixels(self, blob: bytes) -> bytes:
        if not _HAVE_PIL:
            raise NotImplementedError(
                "real resize requires an image library; this container "
                "ships none (stub per repo constraints)"
            )
        raise NotImplementedError("wire PIL here when available")

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.payload_col].to_pylist()
        out, ow, oh = [], [], []
        for b in blobs:
            b = b or b""
            w, h, _ = _fake_meta(b)
            scale = min(1.0, (self.target_w * self.target_h) / (w * h))
            stride = max(1, int(round(1 / max(scale, 1e-9))))
            out.append(b[::stride])
            ow.append(min(w, self.target_w))
            oh.append(min(h, self.target_h))
        return (
            batch.append_column("payload_resized", pa.array(out, type=pa.binary()))
            .append_column("out_width", pa.array(ow, type=pa.int32()))
            .append_column("out_height", pa.array(oh, type=pa.int32()))
        )


class AudioFeatures:
    """``(id, payload)`` → + ``(n_windows, mfcc:list<float32>[dim])``.

    Stand-in for an audio feature extractor (MFCC / fbank): payload bytes
    are framed into fixed-size windows, each window reduced to a per-byte
    energy histogram and projected through a seeded matrix built ONCE per
    actor — the exact lifecycle a real torchaudio/librosa stage needs.
    Window framing mirrors real hop-length semantics so batch sizing and
    output fan-in are representative."""

    def __init__(self, *, payload_col: str = "payload", dim: int = 13,
                 window: int = 2048, seed: int = 42):
        self.payload_col = payload_col
        self.dim = dim
        self.window = window
        rng = np.random.default_rng(seed)
        self.proj = rng.standard_normal((256, dim)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.payload_col].to_pylist()
        n_win, feats = [], []
        for b in blobs:
            b = b or b""
            nw = max(0, len(b) // self.window)
            n_win.append(nw)
            if nw == 0:
                feats.append(np.zeros(self.dim, dtype=np.float32))
                continue
            arr = np.frombuffer(b[: nw * self.window], dtype=np.uint8)
            hist = np.bincount(arr, minlength=256).astype(np.float32)
            hist /= max(np.linalg.norm(hist), 1e-9)
            feats.append(hist @ self.proj)
        return (
            batch.append_column("n_windows", pa.array(n_win, type=pa.int32()))
            .append_column(
                "mfcc", pa.array([f.tolist() for f in feats],
                                 type=pa.list_(pa.float32())),
            )
        )


class FrameSample:
    """``(id, payload)`` → one row per sampled "frame" chunk.

    Stand-in for video frame sampling: the payload is split into
    ``n_frames`` equal byte chunks (a real codec would seek keyframes —
    same fan-out row layout either way)."""

    def __init__(self, *, payload_col: str = "payload", id_col: str = "url",
                 n_frames: int = 4):
        self.payload_col = payload_col
        self.id_col = id_col
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, frame_idx, frames = [], [], []
        ids = batch[self.id_col].to_pylist()
        for uid, b in zip(ids, batch[self.payload_col].to_pylist()):
            b = b or b""
            step = max(1, len(b) // self.n_frames)
            for i in range(self.n_frames):
                ids_out.append(uid)
                frame_idx.append(i)
                frames.append(b[i * step: (i + 1) * step])
        return pa.table(
            {
                self.id_col: pa.array(ids_out, type=pa.string()),
                "frame_idx": pa.array(frame_idx, type=pa.int32()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )
