"""Single-process numpy oracle for the image-algebra kernels.

Straight-line reimplementation of the reference server's pixel semantics
(the role /root/reference/geoproc/server/image.py plays for the client):
used by the kernel golden tests (SURVEY.md §5.2) to check the distributed
Image pipeline block-for-block. Deliberately naive — dict of tiles, no
Spark, no vectorization tricks — so it can be audited against the
reference's cited lines directly.
"""

from __future__ import annotations

import numpy as np

# tiles: dict[(z,x,y)] -> (data[bands,px] float64, mask[px] int)
Tiles = dict


def _align(a: Tiles, b: Tiles, n_bands_a: int, n_bands_b: int, n_px: int):
    keys = sorted(set(a) | set(b))
    za = (np.zeros((n_bands_a, n_px)), np.zeros(n_px, dtype=np.int64))
    zb = (np.zeros((n_bands_b, n_px)), np.zeros(n_px, dtype=np.int64))
    for k in keys:
        yield k, a.get(k, za), b.get(k, zb)


def binary(op, a: Tiles, b: Tiles, n_bands_a: int, n_bands_b: int, n_px: int) -> Tiles:
    """Reference _operator: ufunc on data, float64 promotion (:311),
    mask = np.maximum (:300)."""
    out = {}
    for k, (da, ma), (db, mb) in _align(a, b, n_bands_a, n_bands_b, n_px):
        with np.errstate(divide="ignore", invalid="ignore"):
            data = op(da, db).astype(np.float64)
        out[k] = (data, np.maximum(ma, mb))
    return out


def scalar_op(op, a: Tiles, scalar: float, reverse: bool = False) -> Tiles:
    """Image op boundless constant: result fully valid
    (/root/reference/geoproc/server/image.py:120-139 + :300)."""
    out = {}
    for k, (da, ma) in a.items():
        data = (op(scalar, da) if reverse else op(da, scalar)).astype(np.float64)
        out[k] = (data, np.full_like(ma, 255))
    return out


def abs_(a: Tiles) -> Tiles:
    return {k: (np.abs(d), m) for k, (d, m) in a.items()}


def rescale(a: Tiles, ranges) -> Tiles:
    """rio-tiler linear_rescale: CLIP to in_range, then scale to (0, 255) —
    the kernel behind the reference's img.rescale (app.py:162-168)."""
    out = {}
    for k, (d, m) in a.items():
        bands = [
            (np.clip(d[i], lo, hi) - lo) / (hi - lo) * 255.0
            for i, (lo, hi) in enumerate(ranges)
        ]
        out[k] = (np.stack(bands), m)
    return out


def build_overview(a: Tiles, n_bands: int, n_px: int) -> Tiles:
    """Pyramid twin of operators/tiles.build_parent_tiles: nearest-neighbor
    top-left 2x downsample, missing child quadrant = data 0 / mask 0."""
    side = int(n_px**0.5)
    half = side // 2
    parents = {}
    keys = {(z - 1, x // 2, y // 2) for (z, x, y) in a}
    for pz, px_, py in keys:
        data = np.zeros((n_bands, n_px))
        mask = np.zeros(n_px, dtype=np.int64)
        for dy in (0, 1):
            for dx in (0, 1):
                child = a.get((pz + 1, 2 * px_ + dx, 2 * py + dy))
                if child is None:
                    continue
                cd = child[0].reshape(n_bands, side, side)
                cm = child[1].reshape(side, side)
                sub_d = cd[:, ::2, ::2]  # (bands, half, half)
                sub_m = cm[::2, ::2]
                d2 = data.reshape(n_bands, side, side)
                m2 = mask.reshape(side, side)
                d2[:, dy * half : (dy + 1) * half, dx * half : (dx + 1) * half] = sub_d
                m2[dy * half : (dy + 1) * half, dx * half : (dx + 1) * half] = sub_m
        parents[(pz, px_, py)] = (data.reshape(n_bands, n_px), mask.reshape(n_px))
    return parents


def render_uint8(a: Tiles) -> Tiles:
    """PNG-encode dtype cast: float [0,255] -> uint8 truncation
    (/root/reference/geoproc/server/app.py:176-178 via rio-tiler render)."""
    return {k: (d.astype(np.uint8).astype(np.float64), m) for k, (d, m) in a.items()}


def opacity(a: Tiles, op_val: float) -> Tiles:
    """mask *= round((1-opacity)*255) in uint8 — wraparound pinned
    (/root/reference/geoproc/server/app.py:170-171)."""
    if op_val >= 1.0:
        return a
    k8 = round((1.0 - op_val) * 255)
    # uint8 in-place multiply wraps mod 256 — written as modulo for clarity
    return {k: (d, (m * k8) % 256) for k, (d, m) in a.items()}
