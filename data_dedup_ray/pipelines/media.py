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
                                              DecodeImagePixels, FrameSample,
                                              ImageFeatures, ResizeImage)
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


# --------------------------------------------------------------------------
# Oracle-checkable real-decoder pipelines: synthetic BMP / PCM-WAV payloads
# derived deterministically from the documents table — the decode stage
# must INVERT the construction, so DuckDB can state the expected metadata
# in closed form (VERDICT r1 §next-round 9).
# --------------------------------------------------------------------------


def bmp_pages(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, payload): one 24bpp BMP per document, width/height encoded
    from doc_id (width = 1 + doc_id % 64, height = 1 + doc_id % 48)."""
    from data_dedup_ray.stages.multimodal import encode_bmp

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def mk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table({
            "doc_id": t["doc_id"].combine_chunks(),
            "payload": pa.array(
                [encode_bmp(1 + int(i) % 64, 1 + int(i) % 48, seed=int(i))
                 for i in ids], pa.binary()),
        })

    return ds.map_batches(mk, batch_format="pyarrow", batch_size=256)


def image_meta_bmp(
    sf_dir: str, *, batch_size: int = 64,
    concurrency: int | tuple | None = None,
) -> ray.data.Dataset:
    """(doc_id, width, height, mode, decode_ok) via the REAL BMP header
    parse — SQL-oracle-checkable because the parse inverts ``bmp_pages``'s
    construction."""
    return bmp_pages(sf_dir).map_batches(
        DecodeImage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or autoscale_pool(),
    ).select_columns(["doc_id", "width", "height", "mode", "decode_ok"])


def image_meta_bmp_sql() -> str:
    return """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(1 + doc_id % 64 AS BIGINT) AS width,
       CAST(1 + doc_id % 48 AS BIGINT) AS height,
       'rgb' AS mode,
       true AS decode_ok
FROM documents"""


def png_pages(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, payload): one 8-bit PNG per document.  Dimensions encode
    from doc_id (width = 1 + doc_id % 64, height = 1 + doc_id % 48),
    channels cycle gray/rgb/rgba with doc_id % 3, pixel bytes are
    ``(31*i + 7*doc_id) % 256`` in scan order, and the per-row PNG filter
    type cycles ``(row + doc_id) % 5`` — every corpus exercises all five
    unfilter kernels (see ``encode_png``)."""
    from data_dedup_ray.stages.multimodal import encode_png

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def mk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table({
            "doc_id": t["doc_id"].combine_chunks(),
            "payload": pa.array(
                [encode_png(1 + int(i) % 64, 1 + int(i) % 48, seed=int(i))
                 for i in ids], pa.binary()),
        })

    return ds.map_batches(mk, batch_format="pyarrow", batch_size=256)


def image_meta_png(
    sf_dir: str, *, batch_size: int = 64,
    concurrency: int | tuple | None = None,
) -> ray.data.Dataset:
    """(doc_id, width, height, mode, decode_ok, pixel_sum) via the REAL
    PNG decoder (stdlib zlib inflate + numpy unfilter, all 5 filter
    types).  ``pixel_sum`` totals every decoded pixel byte, so the SQL
    twin proves the inflate/unfilter path byte-exact — not just the
    header parse."""
    return png_pages(sf_dir).map_batches(
        DecodeImagePixels,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or autoscale_pool(),
    ).select_columns(
        ["doc_id", "width", "height", "mode", "decode_ok", "pixel_sum"])


def image_meta_png_sql() -> str:
    """DuckDB twin of ``image_meta_png``: dimensions/mode in closed form.
    pixel_sum restates the generator's ``sum_i (31*i + 7*doc_id) % 256``:
    gcd(31, 256) = 1, so every 256 consecutive pixels contribute exactly
    0+1+...+255 = 32640, and because 31*256k ≡ 0 (mod 256) the tail of
    ``npix % 256`` pixels reduces to ``(31*j + 7*doc_id) % 256`` for
    j < npix % 256 — an uncorrelated range(256) cross join."""
    return """
WITH dims AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(1 + doc_id % 64 AS BIGINT) AS width,
         CAST(1 + doc_id % 48 AS BIGINT) AS height,
         CAST(CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END
              AS BIGINT) AS ch
  FROM documents)
SELECT d.doc_id, d.width, d.height,
       CASE d.ch WHEN 1 THEN 'gray' WHEN 3 THEN 'rgb' ELSE 'rgba' END
         AS mode,
       true AS decode_ok,
       CAST((d.width * d.height * d.ch // 256) * 32640
            + COALESCE(SUM(CASE
                WHEN t.range < (d.width * d.height * d.ch) % 256
                THEN (31 * t.range + 7 * d.doc_id) % 256 END), 0)
            AS BIGINT) AS pixel_sum
FROM dims d CROSS JOIN range(256) t
GROUP BY d.doc_id, d.width, d.height, d.ch"""


def jpeg_pages(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, payload): one baseline grayscale JPEG per document.
    Dimensions encode from doc_id (width = 8*(1 + doc_id % 8), height =
    8*(1 + doc_id % 6)); every 8x8 block b (raster order) is the constant
    value ``128 + 2*(((31*b + 7*doc_id) % 65) - 32)`` — DC-only with even
    offsets, which survives Annex-K quantization EXACTLY, so the decoded
    pixels equal the construction bit-for-bit (see stages/jpeg.py)."""
    from data_dedup_ray.stages.jpeg import encode_jpeg

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def mk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table({
            "doc_id": t["doc_id"].combine_chunks(),
            "payload": pa.array(
                [encode_jpeg(8 * (1 + int(i) % 8), 8 * (1 + int(i) % 6),
                             seed=int(i))
                 for i in ids], pa.binary()),
        })

    return ds.map_batches(mk, batch_format="pyarrow", batch_size=256)


def image_meta_jpeg(
    sf_dir: str, *, batch_size: int = 64,
    concurrency: int | tuple | None = None,
) -> ray.data.Dataset:
    """(doc_id, width, height, mode, decode_ok, pixel_sum) via the REAL
    baseline-JPEG decoder — marker stream, Huffman entropy decode,
    dequantize, exact IDCT.  The DC-only construction makes the lossy
    format losslessly round-trippable, so ``pixel_sum`` is SQL-provable
    end-to-end."""
    return jpeg_pages(sf_dir).map_batches(
        DecodeImagePixels,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or autoscale_pool(),
    ).select_columns(
        ["doc_id", "width", "height", "mode", "decode_ok", "pixel_sum"])


def image_meta_jpeg_sql() -> str:
    """DuckDB twin of ``image_meta_jpeg``: per document, 48 candidate
    block slots (uncorrelated range(48) cross join — max 8x6 blocks),
    each live block contributing 64 copies of its constant value."""
    return """
WITH dims AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(8 * (1 + doc_id % 8) AS BIGINT) AS width,
         CAST(8 * (1 + doc_id % 6) AS BIGINT) AS height,
         CAST((1 + doc_id % 8) * (1 + doc_id % 6) AS BIGINT) AS nblocks
  FROM documents)
SELECT d.doc_id, d.width, d.height,
       'gray' AS mode,
       true AS decode_ok,
       CAST(SUM(CASE WHEN t.range < d.nblocks
                THEN 64 * (128 + 2 * (((31 * t.range + 7 * d.doc_id) % 65)
                                      - 32)) END) AS BIGINT) AS pixel_sum
FROM dims d CROSS JOIN range(48) t
GROUP BY d.doc_id, d.width, d.height, d.nblocks"""


def wav_pages(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, payload): one 16-bit mono PCM WAV per document with
    n_samples = 1000 + doc_id % 5000."""
    from data_dedup_ray.stages.multimodal import encode_wav

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def mk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table({
            "doc_id": t["doc_id"].combine_chunks(),
            "payload": pa.array(
                [encode_wav(1000 + int(i) % 5000, seed=int(i))
                 for i in ids], pa.binary()),
        })

    return ds.map_batches(mk, batch_format="pyarrow", batch_size=256)


def audio_windows_wav(
    sf_dir: str, *, window: int = 512, batch_size: int = 64,
    concurrency: int | tuple | None = None,
) -> ray.data.Dataset:
    """(doc_id, n_windows) via the REAL RIFF/WAVE chunk walk: windows
    count decoded SAMPLES (block_align from the fmt chunk), so the SQL
    twin is (1000 + doc_id % 5000) // window."""
    return wav_pages(sf_dir).map_batches(
        AudioFeatures,
        fn_constructor_kwargs=dict(window=window),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or autoscale_pool(),
    ).select_columns(["doc_id", "n_windows"])


def audio_windows_wav_sql(window: int = 512) -> str:
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST((1000 + doc_id % 5000) // {window} AS BIGINT) AS n_windows
FROM documents"""


def gif_pages(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, payload): one 256-gray-palette GIF87a per document.
    Dimensions encode from doc_id (width = 1 + doc_id % 64, height =
    1 + doc_id % 48); pixel INDICES are ``(31*i + 7*doc_id) % 256`` in
    scan order (the PNG generator's closed form), LZW-compressed for
    real (variable-width codes, CLEAR resets — see
    stages/multimodal._lzw_compress_gif)."""
    from data_dedup_ray.stages.multimodal import encode_gif

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def mk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table({
            "doc_id": t["doc_id"].combine_chunks(),
            "payload": pa.array(
                [encode_gif(1 + int(i) % 64, 1 + int(i) % 48, seed=int(i))
                 for i in ids], pa.binary()),
        })

    return ds.map_batches(mk, batch_format="pyarrow", batch_size=256)


def image_meta_gif(
    sf_dir: str, *, batch_size: int = 64,
    concurrency: int | tuple | None = None,
) -> ray.data.Dataset:
    """(doc_id, width, height, mode, decode_ok, pixel_sum) via the REAL
    GIF decoder (block walk → sub-block concat → full variable-width LZW
    → palette map).  pixel_sum totals the decoded RGB bytes, so the SQL
    twin proves the LZW path bit-exact."""
    from data_dedup_ray.stages.multimodal import DecodeImagePixels

    return gif_pages(sf_dir).map_batches(
        DecodeImagePixels,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or autoscale_pool(),
    ).select_columns(
        ["doc_id", "width", "height", "mode", "decode_ok", "pixel_sum"])


def image_meta_gif_sql() -> str:
    """DuckDB twin of ``image_meta_gif``: the gray palette maps index i
    to (i,i,i), so the RGB pixel sum is 3× the PNG oracle's closed form
    over npix = width·height indices."""
    return """
WITH dims AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(1 + doc_id % 64 AS BIGINT) AS width,
         CAST(1 + doc_id % 48 AS BIGINT) AS height
  FROM documents)
SELECT d.doc_id, d.width, d.height,
       'pal' AS mode,
       true AS decode_ok,
       CAST(3 * ((d.width * d.height // 256) * 32640
            + COALESCE(SUM(CASE
                WHEN t.range < (d.width * d.height) % 256
                THEN (31 * t.range + 7 * d.doc_id) % 256 END), 0))
            AS BIGINT) AS pixel_sum
FROM dims d CROSS JOIN range(256) t
GROUP BY d.doc_id, d.width, d.height"""
