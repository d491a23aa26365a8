"""Baseline JPEG (ITU-T T.81 / JFIF) codec on the standard library +
numpy alone — closing the last "environment-blocked" decode seam.

The container ships no codec library, but baseline sequential JPEG needs
none: the decoder below parses the marker stream (SOI/APPn/DQT/DHT/
SOF0/DRI/SOS/EOI), entropy-decodes the interleaved MCU scan with
table-driven canonical Huffman codes (byte-unstuffing 0xFF00, honoring
restart markers), dequantizes, inverse-zigzags, applies an exact 8x8
IDCT-II as two matrix multiplies against the orthonormal DCT basis, and
reassembles component planes with x2 nearest upsampling and the JFIF
YCbCr->RGB transform.  The encoder emits standards-compliant grayscale or
4:4:4 color baseline JPEGs (any external decoder can read them) using
single-length canonical Huffman tables declared in DHT.

Correctness evidence strategy (see pipelines/media.py):
- random-image roundtrips bound reconstruction error through the full
  DCT/quantize/Huffman path (lossy, so tolerance-based);
- DC-only images (each 8x8 block constant, even offset from 128) survive
  quantization EXACTLY — round(8a/16) with a even is lossless, every AC
  coefficient is zero — so decoded pixels equal the construction
  bit-for-bit and a DuckDB oracle can state per-document pixel sums in
  closed form, proving the marker/Huffman/dequant/IDCT path end-to-end.

Reference semantics (unreadable-payload quarantine policy) follow
Data-Dedup Files.pm:229-233 as elsewhere in stages/multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np


def _zigzag_order() -> np.ndarray:
    order, r, c = [], 0, 0
    for _ in range(64):
        order.append(r * 8 + c)
        if (r + c) % 2 == 0:  # heading up-right
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:  # heading down-left
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag_order()          # scan position -> linear block index
UNZIGZAG = np.argsort(ZIGZAG)     # linear block index -> scan position


def _dct_basis() -> np.ndarray:
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    C = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    C[0] *= np.sqrt(0.5)
    return C  # orthonormal: forward F = C A C^T, inverse A = C^T F C


_C = _dct_basis()

# ITU-T T.81 Annex K.1 example quantization tables (the de-facto
# standard), scaled by the usual libjpeg quality formula in the encoder.
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)


def _scale_quant(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * s + 50) // 100, 1, 255)


# --------------------------------------------------------------------------
# Huffman tables.  The encoder uses single-length canonical tables (all DC
# categories at 4 bits, all 162 AC symbols at 8 bits) — valid JPEG tables
# declared in DHT, chosen so code assembly is pure arithmetic.  The
# decoder is fully table-driven and accepts ANY canonical table (Annex K
# included).
# --------------------------------------------------------------------------

_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)]


def _canonical_codes(bits: list[int], huffval: list[int]) -> dict:
    """BITS/HUFFVAL (as stored in DHT) -> {(length, code): symbol}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _fixed_table(symbols: list[int], length: int):
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    enc = {sym: (length, i) for i, sym in enumerate(symbols)}
    return bits, list(symbols), enc


_DC_BITS, _DC_VALS, _DC_ENC = _fixed_table(list(range(12)), 4)
_AC_BITS, _AC_VALS, _AC_ENC = _fixed_table(_AC_SYMBOLS, 8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int):
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _amplitude(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1  # one's complement


def encode_jpeg_from_pixels(px: np.ndarray, *, quality: int = 90) -> bytes:
    """(h, w) or (h, w, 1|3) uint8 array -> baseline JFIF bytes.
    Grayscale single-component or 4:4:4 YCbCr; blocks padded by edge
    replication."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nc = px.shape
    if nc == 3:
        rgb = px.astype(np.float64)
        y = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
             + 0.114 * rgb[..., 2])
        cb = (-0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1]
              + 0.5 * rgb[..., 2] + 128.0)
        cr = (0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1]
              - 0.081312 * rgb[..., 2] + 128.0)
        planes = [y, cb, cr]
        qids = [0, 1, 1]
    elif nc == 1:
        planes = [px[..., 0].astype(np.float64)]
        qids = [0]
    else:
        raise ValueError(f"JPEG encode supports 1 or 3 channels, got {nc}")
    qtables = [_scale_quant(QUANT_LUMA, quality),
               _scale_quant(QUANT_CHROMA, quality)]

    bh, bw = (h + 7) // 8, (w + 7) // 8
    blocks_per_comp = []
    for plane, qid in zip(planes, qids):
        pad = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
        shifted = pad - 128.0
        q = qtables[qid].reshape(8, 8).astype(np.float64)
        comp_blocks = np.empty((bh * bw, 64), dtype=np.int64)
        i = 0
        for by in range(bh):
            for bx in range(bw):
                blk = shifted[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                coef = _C @ blk @ _C.T
                comp_blocks[i] = np.round(coef / q).astype(np.int64) \
                    .reshape(64)[ZIGZAG]
                i += 1
        blocks_per_comp.append(comp_blocks)

    bitw = _BitWriter()
    dc_prev = [0] * len(planes)
    for b in range(bh * bw):  # 4:4:4 MCU = one block per component
        for ci, comp_blocks in enumerate(blocks_per_comp):
            zz = comp_blocks[b]
            diff = int(zz[0]) - dc_prev[ci]
            dc_prev[ci] = int(zz[0])
            size = _category(diff)
            length, code = _DC_ENC[size]
            bitw.write(code, length)
            if size:
                bitw.write(_amplitude(diff, size), size)
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    length, code = _AC_ENC[0xF0]
                    bitw.write(code, length)
                    run -= 16
                size = _category(v)
                length, code = _AC_ENC[(run << 4) | size]
                bitw.write(code, length)
                bitw.write(_amplitude(v, size), size)
                run = 0
            if run:
                length, code = _AC_ENC[0x00]  # EOB
                bitw.write(code, length)
    bitw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for qid in sorted(set(qids)):
        out += seg(0xFFDB, bytes([qid])
                   + bytes(int(v) for v in qtables[qid][ZIGZAG]))
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, qids[ci]])  # h=v=1 (4:4:4)
    out += seg(0xFFC0, sof)
    out += seg(0xFFC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += seg(0xFFC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0 / AC table 0
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bitw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic DC-only grayscale JPEG generator (the oracle twin):
    dimensions are rounded up to 8-pixel multiples by the caller's
    contract; each 8x8 block b (raster order) is the constant value
    ``128 + 2*(((31*b + 7*seed) % 65) - 32)`` — an even offset from 128,
    so quantization by the Annex K DC step (16 at quality 50) is exact
    and the decoded image equals the construction bit-for-bit."""
    if width % 8 or height % 8:
        raise ValueError("oracle generator requires 8-multiple dims")
    bw, bh = width // 8, height // 8
    b = np.arange(bh * bw, dtype=np.int64)
    vals = 128 + 2 * (((31 * b + 7 * seed) % 65) - 32)
    px = np.repeat(np.repeat(vals.reshape(bh, bw), 8, axis=0), 8, axis=1) \
        .astype(np.uint8)
    return encode_jpeg_from_pixels(px, quality=50)


class _BitReader:
    """Reads the entropy-coded scan: 0xFF00 unstuffed, RSTn resets bit
    alignment (predictor reset is the caller's job), any other marker
    ends the scan."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None

    def _fill(self):
        d, p = self.data, self.pos
        if p >= len(d):
            raise ValueError("truncated JPEG scan")
        byte = d[p]
        if byte == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos = p + 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn
                self.marker = nxt
                self.pos = p + 2
                self.acc = 0
                self.nbits = 0
                self._fill()
                return
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def take_marker(self):
        m, self.marker = self.marker, None
        return m

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, table: dict) -> int:
        length, code = 0, 0
        for _ in range(16):
            code = (code << 1) | self.read(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def parse_jpeg_header(blob: bytes):
    """``(width, height, mode, codec)`` from the SOF0/SOF2 segment;
    ``None`` when the bytes are not a JPEG — including streams truncated
    mid-segment (a partial download must quarantine, not raise)."""
    if len(blob) < 4 or blob[:2] != b"\xff\xd8":
        return None
    pos = 2
    try:
        while pos + 4 <= len(blob):
            if blob[pos] != 0xFF:
                return None
            marker = blob[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker == 0xD9:
                return None
            (size,) = struct.unpack_from(">H", blob, pos + 2)
            if marker in (0xC0, 0xC1, 0xC2):
                _prec, h, w, nc = struct.unpack_from(">BHHB", blob, pos + 4)
                mode = {1: "gray", 3: "rgb", 4: "cmyk"}.get(nc)
                if mode is None or w <= 0 or h <= 0:
                    return None
                return w, h, mode, "jpeg"
            pos += 2 + size
    except struct.error:
        return None
    return None


def decode_jpeg_pixels(blob: bytes) -> np.ndarray:
    """(h, w, c) uint8 from a baseline sequential JPEG (SOF0, 8-bit,
    sampling factors 1 or 2, optional restart intervals).  Progressive
    (SOF2), arithmetic-coded, and CORRUPT streams all raise ValueError —
    internal failure modes (undefined table ids, truncated segments,
    malformed bodies) are normalized so callers need one except type."""
    try:
        return _decode_jpeg(blob)
    except (KeyError, IndexError, struct.error) as ex:
        raise ValueError(f"corrupt JPEG stream: {ex!r}") from ex


def _decode_jpeg(blob: bytes) -> np.ndarray:
    if len(blob) < 4 or blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart = 0
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = blob[pos + 1]
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        (size,) = struct.unpack_from(">H", blob, pos + 2)
        body = blob[pos + 4: pos + 2 + size]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                if pq:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(body, np.uint8, 64, off + 1) \
                    .astype(np.int64)
                qtables[tq] = zz[UNZIGZAG]
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1: off + 17])
                n = sum(bits)
                vals = list(body[off + 17: off + 17 + n])
                htables[(tc, th)] = _canonical_codes(bits, vals)
                off += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/1 (baseline/ext sequential)
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci: 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF marker 0xFF{marker:02X} "
                             "(baseline sequential only)")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            sel = {}
            for si in range(ns):
                cs, tt = body[1 + 2 * si: 3 + 2 * si]
                sel[cs] = (tt >> 4, tt & 0x0F)
            return _decode_scan(blob, pos + 2 + size, frame, sel,
                                qtables, htables, restart)
        pos += 2 + size
    raise ValueError("no scan data found")


def _decode_scan(blob, pos, frame, sel, qtables, htables, restart):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    reader = _BitReader(blob, pos)
    planes = []
    for cid, ch, cv, tq in comps:
        planes.append(np.zeros((mcuy * cv * 8, mcux * ch * 8)))
    dc_prev = [0] * len(comps)
    q = [qtables[c[3]].reshape(8, 8).astype(np.float64) for c in comps]
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                reader.nbits = 0  # discard pad bits before RSTn
                reader.acc = 0
                dc_prev = [0] * len(comps)
                reader.take_marker()
            mcu_count += 1
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                dct, act = htables[(0, sel[cid][0])], \
                    htables[(1, sel[cid][1])]
                for by in range(cv):
                    for bx in range(ch):
                        zz = np.zeros(64, np.int64)
                        size = reader.huff(dct)
                        diff = _extend(reader.read(size), size) if size \
                            else 0
                        dc_prev[ci] += diff
                        zz[0] = dc_prev[ci]
                        k = 1
                        while k < 64:
                            sym = reader.huff(act)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += sym >> 4
                            size = sym & 0x0F
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(reader.read(size), size)
                            k += 1
                        coef = np.zeros(64)
                        coef[ZIGZAG] = zz  # inverse zigzag
                        blk = _C.T @ (coef.reshape(8, 8) * q[ci]) @ _C
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = blk
    out_planes = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        p = planes[ci] + 128.0
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0),
                          hmax // ch, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        px = out_planes[0][:, :, None]
    elif len(out_planes) == 3:
        y, cb, cr = out_planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        px = np.stack([r, g, b], axis=-1)
    else:
        raise ValueError(f"unsupported component count {len(out_planes)}")
    return np.clip(np.round(px), 0, 255).astype(np.uint8)
