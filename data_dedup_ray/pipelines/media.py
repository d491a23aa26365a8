"""Multimodal pipelines over binary payload columns.

Uses the ``html:binary`` column of the web_pages corpus as the payload
stand-in (the plumbing — schema, actor pools, small batches for large
rows, fan-out layouts — is identical for real image/audio bytes; see
stages/multimodal.py for the decode-stub contract).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from data_dedup_ray.stages.multimodal import (AudioFeatures, DecodeImage,
                                              FrameSample, ImageFeatures,
                                              ResizeImage)
from data_dedup_ray.util import autoscale_pool


def _payload(ds: ray.data.Dataset, payload_col: str) -> ray.data.Dataset:
    return ds.map_batches(
        lambda t: pa.table({"url": t["url"], "payload": t[payload_col]}),
        batch_format="pyarrow",
    )


def image_meta(
    ds: ray.data.Dataset, *, payload_col: str = "html",
    batch_size: int = 64, concurrency: int | tuple | None = None,
) -> ray.data.Dataset:
    """(url, width, height, mode, decode_ok) per payload row."""
    return _payload(ds, payload_col).map_batches(
        DecodeImage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or autoscale_pool(),
    ).select_columns(["url", "width", "height", "mode", "decode_ok"])


def image_features(
    ds: ray.data.Dataset, *, payload_col: str = "html", dim: int = 64,
    batch_size: int = 64, concurrency: int | tuple | None = None,
) -> ray.data.Dataset:
    """(url, embedding list<float32>[dim]) per payload row."""
    return _payload(ds, payload_col).map_batches(
        ImageFeatures,
        fn_constructor_kwargs=dict(dim=dim),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or autoscale_pool(),
    ).select_columns(["url", "embedding"])


def image_resized(
    ds: ray.data.Dataset, *, payload_col: str = "html",
    target_w: int = 224, target_h: int = 224,
    batch_size: int = 32, concurrency: int | tuple | None = None,
) -> ray.data.Dataset:
    """(url, out_width, out_height, resized_bytes) per payload row."""
    res = _payload(ds, payload_col).map_batches(
        ResizeImage,
        fn_constructor_kwargs=dict(target_w=target_w, target_h=target_h),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or autoscale_pool(),
    )
    return res.map_batches(
        lambda t: pa.table({
            "url": t["url"],
            "out_width": t["out_width"],
            "out_height": t["out_height"],
            "resized_bytes": pa.array(
                [len(b) for b in t["payload_resized"].to_pylist()],
                type=pa.int64(),
            ),
        }),
        batch_format="pyarrow",
    )


def audio_features(
    ds: ray.data.Dataset, *, payload_col: str = "html", dim: int = 13,
    window: int = 2048, batch_size: int = 32,
    concurrency: int | tuple | None = None,
) -> ray.data.Dataset:
    """(url, n_windows, mfcc list<float32>[dim]) per payload row."""
    return _payload(ds, payload_col).map_batches(
        AudioFeatures,
        fn_constructor_kwargs=dict(dim=dim, window=window),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or autoscale_pool(),
    ).select_columns(["url", "n_windows", "mfcc"])


def frame_samples(
    ds: ray.data.Dataset, *, payload_col: str = "html", n_frames: int = 4,
    batch_size: int = 32, concurrency: int | tuple | None = None,
) -> ray.data.Dataset:
    """(url, frame_idx, frame:binary) — n_frames rows per payload."""
    return _payload(ds, payload_col).map_batches(
        FrameSample,
        fn_constructor_kwargs=dict(n_frames=n_frames),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or autoscale_pool(),
    )
