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
import re
import struct
import zlib

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


# --------------------------------------------------------------------------
# REAL dependency-free decoders: PNG (stdlib zlib inflate + numpy
# unfiltering of all five filter types), baseline JPEG (stages/jpeg.py —
# marker parse, canonical-Huffman entropy decode, dequant + exact 8x8
# IDCT, JFIF color transform), BMP / binary-PPM image headers+pixels, and
# PCM-WAV framing — everything parseable with the standard library alone,
# proving the decode seam end-to-end (and giving the driver SQL-checkable
# oracles); unknown byte payloads still fall back to the documented
# deterministic stand-ins.
# --------------------------------------------------------------------------

_PPM_HEADER_RE = re.compile(rb"^P([56])\s+(\d+)\s+(\d+)\s+(\d+)\s")


def parse_image_header(blob: bytes):
    """``(width, height, mode, codec)`` for BMP (BITMAPINFOHEADER) and
    binary PPM/PGM payloads; ``None`` when the bytes are neither."""
    if len(blob) >= 54 and blob[:2] == b"BM":
        width, height = struct.unpack_from("<ii", blob, 18)
        bpp = struct.unpack_from("<H", blob, 28)[0]
        mode = {8: "gray", 24: "rgb", 32: "rgba"}.get(bpp)
        if mode is None or width <= 0:
            return None
        return width, abs(height), mode, "bmp"
    m = _PPM_HEADER_RE.match(blob)
    if m:
        mode = "rgb" if m.group(1) == b"6" else "gray"
        return (int(m.group(2)), int(m.group(3)), mode,
                "ppm" if mode == "rgb" else "pgm")
    hdr = parse_png_header(blob)
    if hdr is not None:
        return hdr
    hdr = parse_gif_header(blob)
    if hdr is not None:
        return hdr
    from data_dedup_ray.stages.jpeg import parse_jpeg_header

    return parse_jpeg_header(blob)


def decode_bmp_pixels(blob: bytes) -> np.ndarray:
    """(h, w, 3) uint8 array from a 24bpp BITMAPINFOHEADER BMP (rows are
    stored bottom-up, BGR, padded to 4-byte boundaries)."""
    width, height = struct.unpack_from("<ii", blob, 18)
    bpp = struct.unpack_from("<H", blob, 28)[0]
    if bpp != 24:
        raise ValueError(f"only 24bpp BMP supported, got {bpp}")
    offset = struct.unpack_from("<I", blob, 10)[0]
    flip = height > 0
    height = abs(height)
    stride = ((24 * width + 31) // 32) * 4
    rows = np.frombuffer(
        blob, dtype=np.uint8, count=height * stride, offset=offset
    ).reshape(height, stride)
    px = rows[:, : width * 3].reshape(height, width, 3)[..., ::-1]  # BGR→RGB
    return px[::-1] if flip else px


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> (mode string, channels); palette (3) and 16-bit depths are
# recognized in metadata but not pixel-decoded
_PNG_MODES = {0: ("gray", 1), 2: ("rgb", 3), 4: ("graya", 2), 6: ("rgba", 4)}


def parse_png_header(blob: bytes):
    """``(width, height, mode, codec)`` from a PNG IHDR chunk; ``None``
    when the bytes are not a PNG (or an unsupported color type)."""
    if len(blob) < 33 or blob[:8] != _PNG_SIG or blob[12:16] != b"IHDR":
        return None
    width, height = struct.unpack_from(">II", blob, 16)
    ctype = blob[25]
    mode = _PNG_MODES.get(ctype, (None, 0))[0]
    if mode is None or width <= 0 or height <= 0:
        return None
    return width, height, mode, "png"


def decode_png_pixels(blob: bytes) -> np.ndarray:
    """(h, w, c) uint8 array from an 8-bit non-interlaced PNG (color types
    0/2/4/6) — a REAL decoder on the stdlib alone: chunk walk, zlib
    inflate, and per-scanline unfiltering of all five PNG filter types
    (None/Sub/Up/Average/Paeth).  Sub is a per-lane cumulative sum;
    Average/Paeth carry their left-neighbor dependency in a per-pixel loop
    vectorized across channels."""
    hdr = parse_png_header(blob)
    if hdr is None:
        raise ValueError("not a PNG")
    w, h = hdr[0], hdr[1]
    depth, ctype, _comp, _filt, interlace = struct.unpack_from(
        ">BBBBB", blob, 24)
    if depth != 8:
        raise ValueError(f"only 8-bit PNG supported, got depth {depth}")
    if interlace:
        raise ValueError("interlaced PNG not supported")
    ch = _PNG_MODES[ctype][1]
    pos, idat = 8, []
    while pos + 8 <= len(blob):
        (size,) = struct.unpack_from(">I", blob, pos)
        cid = blob[pos + 4: pos + 8]
        if cid == b"IDAT":
            idat.append(blob[pos + 8: pos + 8 + size])
        elif cid == b"IEND":
            break
        pos += 12 + size  # length + type + data + crc
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as ex:  # corrupt IDAT quarantines, never crashes
        raise ValueError(f"corrupt PNG stream: {ex}") from ex
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    lines = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, w, ch), np.int32)
    zero_row = np.zeros((w, ch), np.int32)
    for y in range(h):
        f = lines[y, 0]
        cur = lines[y, 1:].astype(np.int32).reshape(w, ch)
        prior = out[y - 1] if y else zero_row
        if f == 0:
            rec = cur
        elif f == 1:  # Sub: recon[x] = filt[x] + recon[x-1] per lane
            rec = cur.cumsum(axis=0) % 256
        elif f == 2:  # Up
            rec = (cur + prior) % 256
        elif f == 3:  # Average
            rec = np.empty((w, ch), np.int32)
            left = np.zeros(ch, np.int32)
            for x in range(w):
                left = (cur[x] + ((left + prior[x]) >> 1)) % 256
                rec[x] = left
        elif f == 4:  # Paeth
            rec = np.empty((w, ch), np.int32)
            left = np.zeros(ch, np.int32)
            ul = np.zeros(ch, np.int32)
            for x in range(w):
                up = prior[x]
                p = left + up - ul
                pa_, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                                np.where(pb <= pc, up, ul))
                left = (cur[x] + pred) % 256
                rec[x] = left
                ul = up
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec
    return out.astype(np.uint8)


def _png_chunk(cid: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + cid + body
            + struct.pack(">I", zlib.crc32(cid + body) & 0xFFFFFFFF))


def encode_png_from_pixels(px: np.ndarray, *, filters=0,
                           level: int = 6) -> bytes:
    """(h, w, c) or (h, w) uint8 array → 8-bit non-interlaced PNG bytes.
    ``filters`` is a single filter type (0-4) or a per-row sequence; the
    encoder side is fully vectorized (filters predict from true pixel
    values, so no sequential dependency exists when encoding)."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    px = px.astype(np.int32)
    rows = []
    zero_row = np.zeros((w, ch), np.int32)
    for y in range(h):
        cur = px[y]
        prior = px[y - 1] if y else zero_row
        f = int(filters) if np.isscalar(filters) else int(filters[y])
        left = np.zeros((w, ch), np.int32)
        left[1:] = cur[:-1]
        if f == 0:
            flt = cur
        elif f == 1:
            flt = (cur - left) % 256
        elif f == 2:
            flt = (cur - prior) % 256
        elif f == 3:
            flt = (cur - ((left + prior) >> 1)) % 256
        elif f == 4:
            ul = np.zeros((w, ch), np.int32)
            ul[1:] = prior[:-1]
            p = left + prior - ul
            pa_, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
            pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                            np.where(pb <= pc, prior, ul))
            flt = (cur - pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {f}")
        rows.append(bytes([f]) + flt.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    idat = zlib.compress(b"".join(rows), level)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))


def encode_png(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic PNG payload generator (the test/bench/oracle twin of
    ``encode_bmp``): channels cycle gray/rgb/rgba with ``seed % 3``, pixel
    bytes are ``(31*i + 7*seed) % 256`` in scan order, and the per-row
    filter type cycles ``(row + seed) % 5`` so every unfilter kernel is
    exercised by every corpus."""
    ch = (1, 3, 4)[seed % 3]
    npix = width * height * ch
    px = ((np.arange(npix, dtype=np.int64) * 31 + seed * 7) % 256) \
        .astype(np.uint8).reshape(height, width, ch)
    filters = [(y + seed) % 5 for y in range(height)]
    return encode_png_from_pixels(px, filters=filters)


def parse_wav(blob: bytes):
    """``(n_channels, sample_rate, bits, n_samples, data_off, data_len)``
    for a RIFF/WAVE PCM payload; ``None`` for anything else.  Walks the
    chunk list like any real reader (fmt and data chunks may be preceded
    by LIST/fact chunks)."""
    if len(blob) < 44 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos: pos + 4]
        size = struct.unpack_from("<I", blob, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt " and size >= 16:
            fmt = struct.unpack_from("<HHIIHH", blob, body)
        elif cid == b"data":
            data = (body, min(size, len(blob) - body))
        pos = body + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None or fmt[0] != 1:  # PCM only
        return None
    channels, rate = fmt[1], fmt[2]
    block_align, bits = fmt[4], fmt[5]
    if block_align == 0:
        return None
    return channels, rate, bits, data[1] // block_align, data[0], data[1]


def encode_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """Minimal valid 24bpp BITMAPINFOHEADER BMP with deterministic pixel
    bytes — the test/bench payload generator for the real decode seam."""
    stride = ((24 * width + 31) // 32) * 4
    npix = height * stride
    pix = ((np.arange(npix, dtype=np.int64) * 31 + seed * 7) % 256) \
        .astype(np.uint8).tobytes()
    header = (b"BM" + struct.pack("<IHHI", 54 + npix, 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                            npix, 2835, 2835, 0, 0))
    return header + pix


def encode_bmp_from_pixels(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB array → 24bpp BITMAPINFOHEADER BMP bytes
    (bottom-up rows, BGR, 4-byte row padding) — the exact inverse of
    ``decode_bmp_pixels``."""
    h, w, _ = px.shape
    stride = ((24 * w + 31) // 32) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # flip + RGB→BGR
    pix = rows.tobytes()
    header = (b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(pix), 2835, 2835, 0, 0))
    return header + pix


def resize_nearest(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample of an (h, w, c) array — the real resize
    kernel (pure index arithmetic, no codec library)."""
    h, w = px.shape[:2]
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    return px[yi][:, xi]


def encode_wav(n_samples: int, sample_rate: int = 16000,
               seed: int = 0) -> bytes:
    """Minimal 16-bit mono PCM RIFF/WAVE with deterministic samples."""
    samples = (((np.arange(n_samples, dtype=np.int64) * 131 + seed * 17)
                % 65536) - 32768).astype(np.int16).tobytes()
    dlen = len(samples)
    return (b"RIFF" + struct.pack("<I", 36 + dlen) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                    sample_rate * 2, 2, 16)
            + b"data" + struct.pack("<I", dlen) + samples)


class DecodeImage:
    """``(id, payload:binary)`` → + ``(width, height, mode, codec,
    decode_ok)``.

    BMP and binary-PPM/PGM payloads are parsed for REAL
    (``parse_image_header`` — header fields, no codec library needed);
    other byte payloads fall back to the documented deterministic
    stand-in with ``codec='fake'`` (a PIL import upgrades them in one
    method).  Rows that fail to decode are flagged, not dropped
    (quarantine-filter downstream — the reference's unreadable-file
    policy, Files.pm:229-233)."""

    def __init__(self, *, payload_col: str = "payload", strict: bool = False):
        self.payload_col = payload_col
        self.strict = strict

    def decode_pixels(self, blob: bytes) -> np.ndarray:
        hdr = parse_image_header(blob or b"")
        if hdr is not None and hdr[3] == "bmp":
            return decode_bmp_pixels(blob)
        if hdr is not None and hdr[3] == "png":
            return decode_png_pixels(blob)
        if hdr is not None and hdr[3] == "gif":
            return decode_gif_pixels(blob)
        if hdr is not None and hdr[3] == "jpeg":
            from data_dedup_ray.stages.jpeg import decode_jpeg_pixels

            return decode_jpeg_pixels(blob)
        if hdr is not None and hdr[3] in ("ppm", "pgm"):
            m = _PPM_HEADER_RE.match(blob)
            w_, h_ = int(m.group(2)), int(m.group(3))
            ch = 3 if hdr[3] == "ppm" else 1
            return np.frombuffer(
                blob, np.uint8, count=w_ * h_ * ch, offset=m.end()
            ).reshape(h_, w_, ch)
        if not _HAVE_PIL:
            raise NotImplementedError(
                "pixel decode beyond BMP/PPM requires an image library; "
                "this container ships none (stub per repo constraints)"
            )
        raise NotImplementedError("wire PIL here when available")

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.payload_col].to_pylist()
        w, h, m, cod, ok = [], [], [], [], []
        for b in blobs:
            b = b or b""
            hdr = parse_image_header(b)
            try:
                if hdr is not None:
                    wi, hi, mi, ci = hdr
                elif self.strict:
                    self.decode_pixels(b)
                    raise AssertionError("unreachable")
                else:
                    wi, hi, mi = _fake_meta(b)
                    ci = "fake"
                w.append(wi)
                h.append(hi)
                m.append(mi)
                cod.append(ci)
                ok.append(True)
            except (NotImplementedError, ValueError):
                w.append(0)
                h.append(0)
                m.append("")
                cod.append("")
                ok.append(False)
        return (
            batch.append_column("width", pa.array(w, type=pa.int32()))
            .append_column("height", pa.array(h, type=pa.int32()))
            .append_column("mode", pa.array(m, type=pa.string()))
            .append_column("codec", pa.array(cod, type=pa.string()))
            .append_column("decode_ok", pa.array(ok))
        )


class DecodeImagePixels(DecodeImage):
    """``DecodeImage`` + ``pixel_sum:int64`` — the sum of every decoded
    pixel byte.  For PNG this exercises the full chunk-walk → inflate →
    unfilter path per row, so a SQL oracle stating the expected sum proves
    the decode is byte-exact (not just header-deep).  Payloads without a
    real pixel decoder (codec='fake') report sum 0."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = super().__call__(batch)
        sums = []
        for b in batch[self.payload_col].to_pylist():
            try:
                sums.append(int(
                    self.decode_pixels(b or b"").astype(np.int64).sum()))
            except (NotImplementedError, ValueError):
                sums.append(0)
        return out.append_column("pixel_sum", pa.array(sums, pa.int64()))


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
        """REAL decode→resize→re-encode for 24bpp BMP payloads (no codec
        library needed); other formats need PIL."""
        hdr = parse_image_header(blob or b"")
        if hdr is not None and hdr[3] == "bmp":
            px = decode_bmp_pixels(blob)
            return encode_bmp_from_pixels(
                resize_nearest(px, self.target_w, self.target_h))
        if hdr is not None and hdr[3] == "png":
            px = decode_png_pixels(blob)
            return encode_png_from_pixels(
                resize_nearest(px, self.target_w, self.target_h))
        if hdr is not None and hdr[3] == "jpeg":
            from data_dedup_ray.stages.jpeg import (decode_jpeg_pixels,
                                                    encode_jpeg_from_pixels)

            px = decode_jpeg_pixels(blob)
            return encode_jpeg_from_pixels(
                resize_nearest(px, self.target_w, self.target_h))
        if not _HAVE_PIL:
            raise NotImplementedError(
                "resize beyond BMP requires an image library; this "
                "container ships none (stub per repo constraints)"
            )
        raise NotImplementedError("wire PIL here when available")

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.payload_col].to_pylist()
        out, ow, oh = [], [], []
        for b in blobs:
            b = b or b""
            hdr = parse_image_header(b)
            if hdr is not None and (
                (hdr[3] == "bmp"
                 and struct.unpack_from("<H", b, 28)[0] == 24)
                or hdr[3] in ("png", "jpeg")
            ):
                try:
                    out.append(self.resize_pixels(b))
                    ow.append(self.target_w)
                    oh.append(self.target_h)
                    continue
                except ValueError:
                    pass  # 16-bit/interlaced PNG, progressive JPEG:
                    #       metadata-only formats
            # deterministic stand-in for undecodable payloads (see
            # module docstring): byte-level downsample
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
            wav = parse_wav(b)
            if wav is not None:
                # REAL RIFF/WAVE framing: windows count SAMPLES (via the
                # parsed block_align), and features are computed over the
                # decoded data chunk only — headers never leak into them
                _, _, _, n_samples, off, dlen = wav
                nw = n_samples // self.window
                n_win.append(nw)
                payload = b[off: off + dlen]
            else:
                nw = max(0, len(b) // self.window)
                n_win.append(nw)
                payload = b[: nw * self.window]
            if nw == 0:
                feats.append(np.zeros(self.dim, dtype=np.float32))
                continue
            arr = np.frombuffer(payload, dtype=np.uint8)
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


# --------------------------------------------------------------------------
# GIF87a — real dependency-free codec (full variable-width LZW both ways)
# --------------------------------------------------------------------------

_GIF_MAGICS = (b"GIF87a", b"GIF89a")


def parse_gif_header(blob: bytes):
    """``(width, height, 'pal', 'gif')`` from the logical screen
    descriptor; ``None`` for non-GIF bytes."""
    if len(blob) < 13 or blob[:6] not in _GIF_MAGICS:
        return None
    width, height = struct.unpack_from("<HH", blob, 6)
    if width <= 0 or height <= 0:
        return None
    return width, height, "pal", "gif"


def _lzw_compress_gif(data: bytes, min_code_size: int = 8) -> bytes:
    """GIF-variant LZW: variable code width (min+1 .. 12 bits, LSB-first
    packing), CLEAR emitted first and again whenever the table fills."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    cur = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal cur, nbits
        cur |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            nbits -= 8

    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear, width)
    if data:
        w = data[0:1]
        for ch in data[1:]:
            wc = w + bytes([ch])
            if wc in table:
                w = wc
                continue
            emit(table[w], width)
            if next_code < 4096:
                table[wc] = next_code
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            else:
                emit(clear, width)
                table = {bytes([i]): i for i in range(clear)}
                width = min_code_size + 1
                next_code = end + 1
            w = bytes([ch])
        emit(table[w], width)
    emit(end, width)
    if nbits:
        out.append(cur & 0xFF)
    return bytes(out)


def _lzw_decompress_gif(data: bytes, min_code_size: int = 8) -> bytes:
    """Inverse of ``_lzw_compress_gif`` (handles the KwKwK case and mid-
    stream CLEAR resets)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    pos = 0  # bit cursor

    def read(width: int) -> int:
        nonlocal pos
        byte, bit = pos >> 3, pos & 7
        val = 0
        got = 0
        while got < width:
            if byte >= len(data):
                return end  # truncated stream: treat as end
            take = min(8 - bit, width - got)
            val |= ((data[byte] >> bit) & ((1 << take) - 1)) << got
            got += take
            bit += take
            if bit == 8:
                byte += 1
                bit = 0
        pos += width
        return val

    width = min_code_size + 1
    table: list = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == clear:
            width = min_code_size + 1
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[0:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[0:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt LZW stream: code {code} beyond "
                             f"table size {len(table)}")
        out += entry
        # the decoder's table lags the encoder's by one entry at read
        # time, so the width grows one slot EARLY relative to table size
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
        prev = entry
    return bytes(out)


def encode_gif(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic GIF87a payload generator (the oracle twin of
    ``encode_png``): 256-entry gray global palette (palette[i] = (i,i,i))
    and pixel INDICES ``(31*i + 7*seed) % 256`` in scan order — so the
    decoded RGB pixel sum is exactly 3× the PNG generator's closed form."""
    npix = width * height
    idx = ((np.arange(npix, dtype=np.int64) * 31 + seed * 7) % 256) \
        .astype(np.uint8)
    parts = [b"GIF87a", struct.pack("<HH", width, height),
             bytes([0xF7, 0, 0])]
    parts.append(bytes(bytearray(
        v for i in range(256) for v in (i, i, i))))
    parts.append(b"\x2C" + struct.pack("<HHHH", 0, 0, width, height)
                 + b"\x00")
    parts.append(bytes([8]))  # LZW min code size
    comp = _lzw_compress_gif(idx.tobytes())
    for i in range(0, len(comp), 255):
        sub = comp[i: i + 255]
        parts.append(bytes([len(sub)]) + sub)
    parts.append(b"\x00\x3B")
    return b"".join(parts)


def decode_gif_pixels(blob: bytes) -> np.ndarray:
    """(h, w, 3) uint8 array from a GIF87a/89a payload: block walk →
    sub-block concat → full LZW decompress → palette map."""
    hdr = parse_gif_header(blob)
    if hdr is None:
        raise ValueError("not a GIF payload")
    pos = 10
    packed, _bg, _aspect = blob[pos], blob[pos + 1], blob[pos + 2]
    pos += 3
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = np.frombuffer(
            blob, np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(blob):
        b = blob[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while blob[pos]:
                pos += 1 + blob[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        _l, _t, w, h = struct.unpack_from("<HHHH", blob, pos + 1)
        ipacked = blob[pos + 9]
        pos += 10
        if ipacked & 0x80:  # local color table wins
            n = 2 << (ipacked & 0x07)
            palette = np.frombuffer(
                blob, np.uint8, count=3 * n, offset=pos).reshape(n, 3)
            pos += 3 * n
        if ipacked & 0x40:
            raise ValueError("interlaced GIF not supported")
        mcs = blob[pos]
        pos += 1
        chunks = []
        while blob[pos]:
            ln = blob[pos]
            chunks.append(blob[pos + 1: pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            _lzw_decompress_gif(b"".join(chunks), mcs), np.uint8)
        if len(idx) < w * h:
            raise ValueError(
                f"GIF pixel data truncated: {len(idx)} < {w * h}")
        if palette is None:
            raise ValueError("GIF image without a color table")
        return palette[idx[: w * h]].reshape(h, w, 3)
    raise ValueError("GIF contains no image block")
