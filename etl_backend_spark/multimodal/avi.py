"""Minimal RIFF-AVI (MJPEG) container codec — stdlib struct only.

The write half exists so the engine can synthesize REAL video payloads
without ffmpeg/PyAV (absent from this container); the read half is the
production parser behind ``frame_sample``: walk the RIFF chunk tree,
read the stream timing from ``avih``, and pull each ``00dc`` frame (a
complete baseline JPEG, decoded by ``multimodal/jpeg.py``).

Layout written (and the subset the parser understands — the standard
OpenDML core every MJPEG-AVI producer emits):

    RIFF <size> 'AVI '
      LIST 'hdrl'
        'avih' (56 bytes: usec/frame, total frames, streams, w, h, ...)
        LIST 'strl'
          'strh' (56 bytes: 'vids'/'MJPG', scale/rate, length)
          'strf' (40-byte BITMAPINFOHEADER, biCompression='MJPG')
      LIST 'movi'
        '00dc' <size> <jpeg bytes> [even padding]
      'idx1' (16 bytes/frame: fourcc, flags, offset, size)

Reference parity: the reference accepts uploaded media files and serves
them back by id (src/routes/ads.ts:12-39 multer intake); frame-level
access is the training-pipeline extension (SURVEY.md §2.11).
"""

from __future__ import annotations

import struct


class AviError(ValueError):
    pass


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(subtype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", subtype + body)


def build_mjpeg_avi(frames: list[bytes], width: int, height: int,
                    usec_per_frame: int = 100_000) -> bytes:
    """Assemble complete JPEG streams into a spec-valid MJPEG AVI."""
    n = len(frames)
    max_bytes = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<14I",
        usec_per_frame,            # dwMicroSecPerFrame
        max_bytes * 1_000_000 // max(usec_per_frame, 1),  # dwMaxBytesPerSec
        0,                         # dwPaddingGranularity
        0x10,                      # dwFlags: AVIF_HASINDEX
        n,                         # dwTotalFrames
        0, 1,                      # dwInitialFrames, dwStreams
        max_bytes,                 # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0,                # dwReserved
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG",
        0,                         # dwFlags
        0, 0,                      # wPriority, wLanguage
        0,                         # dwInitialFrames
        usec_per_frame, 1_000_000, # dwScale / dwRate = sec per frame
        0, n,                      # dwStart, dwLength (frames)
        max_bytes, 0xFFFFFFFF, 0,  # bufsize, quality, samplesize
        0, 0, width, height,       # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi_items, idx, off = [], [], 4  # offsets count from after 'movi'
    for f in frames:
        movi_items.append(_chunk(b"00dc", f))
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += len(movi_items[-1])
    movi = _list(b"movi", b"".join(movi_items))
    idx1 = _chunk(b"idx1", b"".join(idx))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def _walk(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_len) for chunks in data[pos:end]."""
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise AviError(f"chunk {fourcc!r} overruns container")
        yield fourcc, body, size
        pos = body + size + (size % 2)


def parse_avi(data: bytes) -> dict:
    """Parse an MJPEG AVI: returns {width, height, n_frames,
    usec_per_frame, frames: [jpeg bytes, ...]}. Raises AviError on
    anything that is not a RIFF/AVI with an avih header and a movi list
    — malformed media must fail loudly, never decode garbage."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviError("not a RIFF/AVI stream")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(8 + riff_size, len(data))
    meta, frames = None, []
    for fourcc, body, size in _walk(data, 12, end):
        if fourcc != b"LIST":
            continue
        subtype = data[body:body + 4]
        if subtype == b"hdrl":
            for f2, b2, s2 in _walk(data, body + 4, body + size):
                if f2 == b"avih":
                    v = struct.unpack_from("<10I", data, b2)
                    meta = {"usec_per_frame": v[0], "n_frames": v[4],
                            "width": v[8], "height": v[9]}
        elif subtype == b"movi":
            for f2, b2, s2 in _walk(data, body + 4, body + size):
                if f2 in (b"00dc", b"00db"):
                    frames.append(data[b2:b2 + s2])
    if meta is None:
        raise AviError("missing avih header")
    if len(frames) != meta["n_frames"]:
        raise AviError(
            f"movi has {len(frames)} frames, avih declares {meta['n_frames']}"
        )
    meta["frames"] = frames
    return meta
