"""Pure-stdlib PNG decoder (zlib inflate + per-scanline unfilter + struct).

The container has no Pillow/libpng, but PNG is decodable with nothing beyond
``zlib`` and ``struct`` — this gives the multimodal decode path a REAL codec
for the format the reference's upload intake accepts first
(reference src/routes/ads.ts:30-32, multer jpeg|jpg|png|webp allow-list);
baseline JPEG and lossless WebP/VP8L decode for real too (jpeg.py,
webp.py); only lossy WebP stays behind a loud unsupported-codec error.

Supported subset (raises ``PngError`` loudly on anything else):
- bit depth 8; color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
  6 (RGBA); no Adam7 interlace.
- all five scanline filters (None/Sub/Up/Average/Paeth).

Scale stance: the sequential filters (Sub/Average/Paeth) carry an intra-row
byte dependency, so rows decode in a Python loop — fine for the metadata/
fixture scale this runs at inside an Arrow batch; a production pixel
pipeline swaps ``decode_png`` for a native decoder behind the same
``mapInPandas`` worker without touching the Spark plumbing.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type -> raw samples per pixel (before palette expansion)
_SAMPLES = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    """Unsupported or malformed PNG payload (loud by design)."""


def _chunks(data: bytes):
    if data[:8] != PNG_MAGIC:
        raise PngError("not a PNG: bad signature")
    off = 8
    while off + 8 <= len(data):
        (length,) = struct.unpack(">I", data[off:off + 4])
        ctype = data[off + 4:off + 8]
        body = data[off + 8:off + 8 + length]
        if len(body) != length:
            raise PngError(f"truncated chunk {ctype!r}")
        yield ctype, body
        off += 12 + length  # length + type + body + crc
        if ctype == b"IEND":
            return
    raise PngError("missing IEND")


def parse_ihdr(data: bytes) -> tuple[int, int, int, int, int]:
    """(width, height, bit_depth, color_type, interlace) from the IHDR —
    the header-only fast path for dimension metadata (resize planning
    reads this without inflating any pixel data)."""
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            return w, h, depth, color, interlace
        break  # IHDR must be first
    raise PngError("missing IHDR")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """Full decode to a (height, width, channels) uint8 array. Palette
    images expand to RGB; gray+alpha / RGBA keep their alpha channel."""
    w = h = None
    depth = color = interlace = None
    idat = bytearray()
    palette: np.ndarray | None = None
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            w, h, depth, color, interlace = parse_ihdr(data)
            if depth != 8:
                raise PngError(f"unsupported bit depth {depth} (only 8)")
            if color not in _SAMPLES:
                raise PngError(f"unsupported color type {color}")
            if interlace:
                raise PngError("Adam7 interlace unsupported")
        elif ctype == b"PLTE":
            if len(body) % 3:
                raise PngError("PLTE length not a multiple of 3")
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
    if w is None:
        raise PngError("missing IHDR")
    if color == 3 and palette is None:
        raise PngError("palette image without PLTE")
    raw = zlib.decompress(bytes(idat))
    spp = _SAMPLES[color]
    stride = w * spp
    if len(raw) != h * (stride + 1):
        raise PngError(
            f"pixel data size mismatch: {len(raw)} != {h * (stride + 1)}"
        )
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = bytearray(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for i in range(spp, stride):
                row[i] = (row[i] + row[i - spp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - spp] if i >= spp else 0
                row[i] = (row[i] + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = row[i - spp] if i >= spp else 0
                up_left = int(prev[i - spp]) if i >= spp else 0
                row[i] = (row[i] + _paeth(left, int(prev[i]), up_left)) & 0xFF
        else:
            raise PngError(f"unknown filter type {ftype} at row {y}")
        out[y] = np.frombuffer(bytes(row), dtype=np.uint8)
        prev = out[y]
    px = out.reshape(h, w, spp)
    if color == 3:
        px = palette[px[:, :, 0]]  # (h, w) indices -> (h, w, 3) RGB
    return px


def encode_png(px: np.ndarray, color: int | None = None,
               filter_type: int = 0,
               palette: np.ndarray | None = None) -> bytes:
    """Minimal matching encoder (filter choice fixed per image) — exists so
    tests can construct REAL png bytes for every color type and filter
    without Pillow; also the write half of a png round-trip check."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, spp = px.shape
    if color is None:
        color = {1: 0, 2: 4, 3: 2, 4: 6}[spp]
    raw = bytearray()
    prev = np.zeros(w * spp, dtype=np.uint8)
    for y in range(h):
        row = px[y].reshape(-1)
        raw.append(filter_type)
        if filter_type == 0:
            raw += row.tobytes()
        elif filter_type == 1:  # Sub
            shifted = np.concatenate([np.zeros(spp, np.uint8), row[:-spp]])
            raw += ((row.astype(np.int16) - shifted) & 0xFF).astype(
                np.uint8).tobytes()
        elif filter_type == 2:  # Up
            raw += ((row.astype(np.int16) - prev) & 0xFF).astype(
                np.uint8).tobytes()
        else:
            raise PngError("encoder supports filters 0/1/2 only")
        prev = row

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(
            ">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    parts = [PNG_MAGIC, chunk(b"IHDR", ihdr)]
    if palette is not None:
        parts.append(chunk(b"PLTE", palette.astype(np.uint8).tobytes()))
    parts.append(chunk(b"IDAT", zlib.compress(bytes(raw))))
    parts.append(chunk(b"IEND", b""))
    return b"".join(parts)
