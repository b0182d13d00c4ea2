"""Dependency-free MJPEG-in-AVI video writer.

The reference writes ``video.mp4``/``depthvideo.mp4`` with imageio-ffmpeg
(renderer.py:126-128); this image ships no ffmpeg, and an animated GIF
(the previous fallback) is palette-quantized and has no real frame rate.
AVI 1.0 with an 'MJPG' stream needs only a RIFF container around per-frame
JPEGs (PIL encodes those), is ~60 lines of struct packing, and plays in
every mainstream player — a real video artifact with the requested fps.

Layout (all little-endian):
  RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi'
  00dc... ) idx1)
"""

from __future__ import annotations

import io
import struct

import numpy as np

_AVIF_HASINDEX = 0x10
_AVIIF_KEYFRAME = 0x10


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def _encode_jpeg(frame: np.ndarray, quality: int) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(frame).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def write_mjpeg_avi(path: str, frames, fps: int = 30, quality: int = 9):
    """Write ``frames`` (iterable of (H, W, 3) uint8) as an MJPEG AVI.

    ``quality`` follows imageio's 0-10 scale (renderer.py:126 passes 9)
    and maps to JPEG quality ``min(95, quality * 10)``.
    """
    frames = [np.ascontiguousarray(f, np.uint8) for f in frames]
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    jq = max(1, min(95, int(round(quality * 10))))
    jpegs = [_encode_jpeg(f, jq) for f in frames]
    n = len(jpegs)
    max_size = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<14I",
        int(1e6 / max(fps, 1)),            # dwMicroSecPerFrame
        max_size * fps,                    # dwMaxBytesPerSec
        0,                                 # dwPaddingGranularity
        _AVIF_HASINDEX,                    # dwFlags
        n, 0, 1,                           # frames, initial, streams
        max_size,                          # dwSuggestedBufferSize
        w, h,
        0, 0, 0, 0,                        # dwReserved
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII",
            0, 0, 0,                       # flags, priority, language
            0,                             # initial frames
            1, max(fps, 1),                # scale, rate → fps
            0, n,                          # start, length
            max_size,                      # suggested buffer
            0xFFFFFFFF,                    # quality (-1: default)
            0,                             # sample size
        )
        + struct.pack("<4h", 0, 0, w, h)   # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    # list + join (not bytes +=): quadratic concatenation costs GBs of
    # memcpy on a 600-frame render video
    movi_parts, index_parts = [], []
    offset = 4  # idx1 offsets count from the 'movi' fourcc
    for j in jpegs:
        index_parts.append(
            b"00dc" + struct.pack("<III", _AVIIF_KEYFRAME, offset, len(j))
        )
        chunk = _chunk(b"00dc", j)
        movi_parts.append(chunk)
        offset += len(chunk)
    movi = _list(b"movi", b"".join(movi_parts))
    idx1 = _chunk(b"idx1", b"".join(index_parts))

    riff_payload = b"AVI " + hdrl + movi + idx1
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload)
    return path


def read_mjpeg_avi(path: str):
    """Decode the frames back (for tests / quick inspection): scans the
    movi list's 00dc chunks and JPEG-decodes each."""
    from PIL import Image

    with open(path, "rb") as f:
        data = f.read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI ", "not an AVI"
    frames = []
    pos = data.find(b"movi")
    assert pos > 0, "no movi list"
    pos += 4
    while pos + 8 <= len(data) and data[pos : pos + 4] == b"00dc":
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        jpeg = data[pos + 8 : pos + 8 + size]
        frames.append(np.asarray(Image.open(io.BytesIO(jpeg)).convert("RGB")))
        pos += 8 + size + (size % 2)
    return frames
