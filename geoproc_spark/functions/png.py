"""Minimal pure-stdlib PNG encoder — the actual byte format of the S5 tile
sink (reference geoproc/server/app.py:176-178 renders via rio-tiler/PIL;
this container has neither, and PNG is just zlib + CRC chunks).

Supports 8-bit grayscale and grayscale+alpha (the mask plane as alpha),
filter type 0 on every scanline — deterministic bytes for a given array
(zlib level pinned), so digests are stable across partitions and runs.
`decode_png` is the test-side inverse for the same subset.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_gray_png(data: np.ndarray, alpha: np.ndarray | None = None) -> bytes:
    """8-bit grayscale PNG (optionally with an alpha plane) from (H, W)
    uint8 arrays; filter 0 scanlines, zlib level 6 (pinned)."""
    img = np.asarray(data, dtype=np.uint8)
    h, w = img.shape
    if alpha is not None:
        a = np.asarray(alpha, dtype=np.uint8)
        assert a.shape == img.shape
        px = np.dstack([img, a]).reshape(h, w * 2)
        color_type = 4  # grayscale + alpha
    else:
        px = img
        color_type = 0  # grayscale
    return _assemble(px, w, h, color_type)


def encode_rgb_png(rgb: np.ndarray, alpha: np.ndarray | None = None) -> bytes:
    """8-bit truecolor PNG from (3, H, W) uint8 bands (+ optional (H, W)
    alpha) — the 3-band path of the reference's VisualizationParams
    (geoproc/models.py:8: bands must be 1 or 3)."""
    bands = np.asarray(rgb, dtype=np.uint8)
    assert bands.ndim == 3 and bands.shape[0] == 3, "need (3, H, W)"
    _, h, w = bands.shape
    planes = [bands[0], bands[1], bands[2]]
    color_type = 2  # truecolor
    if alpha is not None:
        planes.append(np.asarray(alpha, dtype=np.uint8))
        color_type = 6  # truecolor + alpha
    px = np.dstack(planes).reshape(h, w * len(planes))
    return _assemble(px, w, h, color_type)


def _assemble(px: np.ndarray, w: int, h: int, color_type: int) -> bytes:
    raw = b"".join(b"\x00" + px[r].tobytes() for r in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


_N_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(png: bytes):
    """Inverse for the encoder's subset: returns (data, alpha|None) —
    data is (H, W) for grayscale or (3, H, W) for truecolor. Only bit
    depth 8, color types 0/2/4/6, filter 0 scanlines."""
    assert png[:8] == _SIG, "not a PNG"
    pos = 8
    idat = b""
    w = h = color_type = None
    while pos < len(png):
        (length,) = struct.unpack(">I", png[pos : pos + 4])
        tag = png[pos + 4 : pos + 8]
        payload = png[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            assert depth == 8 and color_type in _N_CHANNELS and interlace == 0
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = zlib.decompress(idat)
    nch = _N_CHANNELS[color_type]
    stride = 1 + w * nch
    rows = []
    for r in range(h):
        line = raw[r * stride : (r + 1) * stride]
        assert line[0] == 0, "only filter 0 is emitted"
        rows.append(np.frombuffer(line[1:], dtype=np.uint8))
    px = np.stack(rows).reshape(h, w, nch)
    if color_type == 0:
        return px[:, :, 0], None
    if color_type == 4:
        return px[:, :, 0], px[:, :, 1]
    rgb = np.moveaxis(px[:, :, :3], 2, 0)
    return rgb, (px[:, :, 3] if color_type == 6 else None)
