"""Pure-stdlib+numpy baseline JPEG codec (huffman + DCT, no Pillow).

The container has no libjpeg, but BASELINE sequential JPEG (the format the
reference's upload intake accepts — reference src/routes/ads.ts:30-32,
multer jpeg|jpg|png|webp allow-list) is decodable with nothing beyond
``struct`` and numpy: canonical huffman tables are rebuilt from the file's
own DHT segments, coefficients entropy-decode in a Python bit loop, and the
8x8 inverse DCT is one numpy matrix sandwich per block. This upgrades the
multimodal decode path's second real codec (PNG landed in round 5's first
half); webp stays behind a loud unsupported-codec error (VP8 is a full
video intra codec).

Supported subset (raises ``JpegError`` loudly on anything else):
- baseline sequential DCT (SOF0), 8-bit samples;
- 1 (grayscale) or 3 (YCbCr 4:4:4) components — no chroma subsampling;
- no restart markers (DRI interval 0), no progressive (SOF2), no
  arithmetic coding.

The matching encoder (Annex K quantization + huffman tables, quality-
scaled) exists so tests can construct real JPEG streams without Pillow and
so the round-trip error bound (quantization noise only) is assertable.

Scale stance: entropy decoding is sequential per scan, so one image decodes
on one core — exactly the mapInPandas batch-parallel shape the media path
already uses (multimodal/media.py); a production pipeline swaps
``decode_jpeg`` for a native decoder behind the same worker without
touching the Spark plumbing.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8\xff"


class JpegError(ValueError):
    """Unsupported or malformed JPEG payload (loud by design)."""


# ---------------------------------------------------------------- constants

# zigzag scan: ZIGZAG[k] = natural (row-major) index of zigzag position k
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# ITU-T T.81 Annex K.1/K.2 reference quantization tables (natural order)
_K1_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_K2_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 typical huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])

# orthonormal 8-point DCT-II basis: row k = c_k * cos((2n+1) k pi / 16)
_DCT = np.array([
    [(np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
     * np.cos((2 * n + 1) * k * np.pi / 16) for n in range(8)]
    for k in range(8)
])


# ----------------------------------------------------------------- huffman

def _canonical_codes(bits: list[int], values: list[int]):
    """(length, code) -> value map per T.81 C.2 canonical assignment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            k += 1
            code += 1
        code <<= 1
    if k != len(values):
        raise JpegError("DHT: BITS total != number of values")
    return table


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 byte
    unstuffing; any other post-0xFF byte is a marker (scan end)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise JpegError(
                    f"marker 0xFF{nxt:02X} inside entropy data "
                    "(truncated scan or unsupported restart interval)"
                )
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def decode(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            v = table.get((length, code))
            if v is not None:
                return v
        raise JpegError("invalid huffman code (corrupt scan)")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    return v - ((1 << t) - 1) if t and v < (1 << (t - 1)) else v


# ------------------------------------------------------------------ parse

def _segments(data: bytes):
    """Yield (marker, body, body_offset) for each header segment; stops at
    SOS (the caller takes over at the entropy-coded data)."""
    if data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG: missing SOI")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at offset {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            return
        (length,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + length]
        if len(body) != length - 2:
            raise JpegError(f"truncated segment 0xFF{marker:02X}")
        yield marker, body, pos + 4
        pos += 2 + length
        if marker == 0xDA:  # SOS: entropy data follows
            return
    raise JpegError("missing SOS")


def parse_sof(data: bytes) -> tuple[int, int, int]:
    """(width, height, n_components) from the frame header — the
    header-only fast path for dimension metadata (resize planning reads
    this without entropy-decoding anything)."""
    for marker, body, _off in _segments(data):
        if marker in (0xC0, 0xC1):
            _prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            return w, h, ncomp
        if marker == 0xC2:
            raise JpegError("progressive JPEG (SOF2) unsupported")
        if marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                      0xCD, 0xCE, 0xCF):
            raise JpegError(f"unsupported SOF marker 0xFF{marker:02X}")
    raise JpegError("missing SOF0 frame header")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Full decode to (height, width, channels) uint8 — grayscale keeps
    one channel, YCbCr converts to RGB."""
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id)
    frame = None  # (w, h, [(comp_id, qtable_id)])
    scan = None   # ([(comp_idx, dc_id, ac_id)], data_offset)
    for marker, body, off in _segments(data):
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                if pq != 0:
                    raise JpegError("16-bit quantization tables unsupported")
                q = np.frombuffer(body[p + 1:p + 65], dtype=np.uint8)
                if len(q) != 64:
                    raise JpegError("truncated DQT")
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = q  # DQT stores zigzag order
                qtables[tq] = nat
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 15
                bits = list(body[p + 1:p + 17])
                n = sum(bits)
                vals = list(body[p + 17:p + 17 + n])
                htables[(tc, th)] = _canonical_codes(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/1 (baseline / ext sequential)
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise JpegError(f"{prec}-bit precision unsupported (only 8)")
            if ncomp not in (1, 3):
                raise JpegError(f"{ncomp}-component JPEG unsupported")
            comps = []
            for i in range(ncomp):
                cid, sampling, tq = body[6 + 3 * i:9 + 3 * i]
                if sampling != 0x11:
                    raise JpegError(
                        "chroma subsampling unsupported (4:4:4 only; "
                        f"sampling byte 0x{sampling:02X})"
                    )
                comps.append((cid, tq))
            frame = (w, h, comps)
        elif marker == 0xC2:
            raise JpegError("progressive JPEG (SOF2) unsupported")
        elif marker == 0xDD:  # DRI
            (interval,) = struct.unpack(">H", body[:2])
            if interval != 0:
                raise JpegError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = body[0]
            if ns != len(frame[2]):
                raise JpegError("non-interleaved multi-scan unsupported")
            sel = []
            for i in range(ns):
                cs, tbl = body[1 + 2 * i], body[2 + 2 * i]
                idx = next(
                    (k for k, (cid, _q) in enumerate(frame[2]) if cid == cs),
                    None,
                )
                if idx is None:
                    raise JpegError(f"SOS references unknown component {cs}")
                sel.append((idx, tbl >> 4, tbl & 15))
            scan = (sel, off + len(body))
    if frame is None or scan is None:
        raise JpegError("missing SOF/SOS")

    w, h, comps = frame
    sel, data_off = scan
    reader = _BitReader(data, data_off)
    bw, bh = (w + 7) // 8, (h + 7) // 8
    planes = [np.zeros((bh * 8, bw * 8), dtype=np.float64) for _ in comps]
    dc_pred = [0] * len(comps)
    for by in range(bh):
        for bx in range(bw):
            for ci, dc_id, ac_id in sel:
                dc_tab = htables.get((0, dc_id))
                ac_tab = htables.get((1, ac_id))
                qt = qtables.get(comps[ci][1])
                if dc_tab is None or ac_tab is None or qt is None:
                    raise JpegError("scan references missing DHT/DQT table")
                coef = np.zeros(64, dtype=np.int64)
                t = reader.decode(dc_tab)
                dc_pred[ci] += _extend(reader.receive(t), t)
                coef[0] = dc_pred[ci]
                k = 1
                while k < 64:
                    rs = reader.decode(ac_tab)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:  # ZRL: 16 zeros
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise JpegError("AC run past end of block")
                    coef[ZIGZAG[k]] = _extend(reader.receive(s), s)
                    k += 1
                block = (coef * qt).reshape(8, 8).astype(np.float64)
                spatial = _DCT.T @ block @ _DCT + 128.0
                planes[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = spatial
    planes = [p[:h, :w] for p in planes]
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------------------------ encode

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


def _encode_codes(bits: list[int], values: list[int]):
    """value -> (code, length) for the encoder (inverse canonical map)."""
    return {
        v: (code, length)
        for (length, code), v in _canonical_codes(bits, values).items()
    }


def _magnitude(v: int) -> tuple[int, int]:
    """(category t, t-bit code) for a differential/AC value per F.1.2."""
    if v == 0:
        return 0, 0
    t = int(abs(v)).bit_length()
    return t, v if v >= 0 else v + (1 << t) - 1


def encode_jpeg(px: np.ndarray, quality: int = 90) -> bytes:
    """Minimal baseline 4:4:4 encoder (Annex K tables scaled by the
    libjpeg quality convention) — exists so tests can construct REAL jpeg
    streams without Pillow; also the write half of the round-trip bound."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    if ch not in (1, 3):
        raise JpegError(f"encoder supports 1 or 3 channels, got {ch}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qts = []
    for base in (_K1_LUMA, _K2_CHROMA)[: (2 if ch == 3 else 1)]:
        q = np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)
        qts.append(q)

    if ch == 3:
        rgb = px.astype(np.float64)
        y = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])
        cb = (-0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1]
              + 0.5 * rgb[..., 2] + 128.0)
        cr = (0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1]
              - 0.081312 * rgb[..., 2] + 128.0)
        planes = [y, cb, cr]
        qmap = [0, 1, 1]
        dc_enc = [_encode_codes(*_DC_LUMA), _encode_codes(*_DC_CHROMA)]
        ac_enc = [_encode_codes(*_AC_LUMA), _encode_codes(*_AC_CHROMA)]
        tmap = [0, 1, 1]
    else:
        planes = [px[..., 0].astype(np.float64)]
        qmap = [0]
        dc_enc = [_encode_codes(*_DC_LUMA)]
        ac_enc = [_encode_codes(*_AC_LUMA)]
        tmap = [0]

    bw, bh = (w + 7) // 8, (h + 7) // 8
    padded = []
    for p in planes:
        pp = np.empty((bh * 8, bw * 8), dtype=np.float64)
        pp[:h, :w] = p
        pp[h:, :w] = p[-1:, :]  # edge-replicate padding
        pp[:, w:] = pp[:, w - 1:w]
        padded.append(pp)

    writer = _BitWriter()
    dc_pred = [0] * len(planes)
    for by in range(bh):
        for bx in range(bw):
            for ci, plane in enumerate(padded):
                block = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                coefs = _DCT @ block @ _DCT.T
                q = np.round(coefs.reshape(64) / qts[qmap[ci]]).astype(
                    np.int64)
                zz = q[ZIGZAG]
                diff = int(zz[0]) - dc_pred[ci]
                dc_pred[ci] = int(zz[0])
                t, code = _magnitude(diff)
                hc, hl = dc_enc[tmap[ci]][t]
                writer.write(hc, hl)
                if t:
                    writer.write(code, t)
                run = 0
                last_nz = max(np.nonzero(zz)[0]) if np.any(zz) else 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        zc, zl = ac_enc[tmap[ci]][0xF0]  # ZRL
                        writer.write(zc, zl)
                        run -= 16
                    t, code = _magnitude(v)
                    hc, hl = ac_enc[tmap[ci]][(run << 4) | t]
                    writer.write(hc, hl)
                    writer.write(code, t)
                    run = 0
                if last_nz < 63:
                    ec, el = ac_enc[tmap[ci]][0x00]  # EOB
                    writer.write(ec, el)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, q in enumerate(qts):
        zz = q[ZIGZAG].astype(np.uint8)
        out += seg(0xDB, bytes([tq]) + zz.tobytes())
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(ncomp):
        sof += bytes([i + 1, 0x11, qmap[i]])
    out += seg(0xC0, sof)
    hts = [(0, 0, _DC_LUMA), (1, 0, _AC_LUMA)]
    if ncomp == 3:
        hts += [(0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)]
    for tc, th, (bits, vals) in hts:
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, (tmap[i] << 4) | tmap[i]])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += writer.flush()
    out += b"\xff\xd9"
    return bytes(out)
