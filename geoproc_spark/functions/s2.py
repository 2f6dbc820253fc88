"""S2-style 64-bit Hilbert cell ids — pure vectorized numpy.

The public S2 construction (s2geometry.io): lat/lng -> unit-sphere xyz ->
cube face (0..5) + (u,v) face coordinates -> quadratic (s,t) reprojection
(area-uniformizing) -> 30-bit (i,j) leaf coordinates -> position along a
Hilbert space-filling curve on the face -> 64-bit id

    id = face << 61 | hilbert_pos << 1 | 1          (leaf, level 30)

with S2's trailing-marker-bit encoding for coarser levels: a level-l cell
zeroes the low bits and sets bit 2*(30-l). Containment is then a plain
BIGINT range check — which is what makes this a join/partition key: a
level-l prefix range covers exactly its subtree, so cell-prefix
partitioning and covering joins work on sorted id ranges.

No s2 library exists in this environment (SURVEY.md §7); this is an
independent implementation of the public math. It is "S2-style": the
curve layout inside each face is a standard Hilbert curve rather than
S2's table-driven orientation variant, so ids are NOT interchangeable
with Google's library — all invariants (bijectivity, nesting, locality)
hold and are property-tested.
"""

from __future__ import annotations

import numpy as np

# Real S2 packs 30 levels + face into an UNSIGNED 64-bit int; Spark/parquet
# BIGINT is signed, so we use 29 levels (face<<59 | pos<<1 | 1 <= 2^62) —
# still ~1.7 cm leaf cells. Documented deviation from the S2 layout.
LEVEL = 29
FACE_SHIFT = 59


def lat_lng_to_xyz(lat_deg: np.ndarray, lng_deg: np.ndarray):
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lng = np.radians(np.asarray(lng_deg, dtype=np.float64))
    cos_lat = np.cos(lat)
    return cos_lat * np.cos(lng), cos_lat * np.sin(lng), np.sin(lat)


def xyz_to_face_uv(x, y, z):
    """Cube face + (u,v) in [-1,1] — the standard S2 face projection."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    ).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve, de) in enumerate(
        [
            (lambda: y / x, lambda: z / x, lambda: x),     # face 0: +x
            (lambda: -x / y, lambda: z / y, lambda: y),    # face 1: +y
            (lambda: -x / z, lambda: -y / z, lambda: z),   # face 2: +z
            (lambda: z / x, lambda: y / x, lambda: -x),    # face 3: -x
            (lambda: z / y, lambda: -x / y, lambda: -y),   # face 4: -y
            (lambda: -y / z, lambda: -x / z, lambda: -z),  # face 5: -z
        ]
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ue()[m]
                v[m] = ve()[m]
    return face, u, v


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """S2's quadratic projection: equalizes cell areas across a face."""
    with np.errstate(invalid="ignore"):  # np.where evaluates both branches
        return np.where(
            u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def st_to_ij(s: np.ndarray) -> np.ndarray:
    n = 1 << LEVEL
    return np.clip(np.floor(s * n).astype(np.int64), 0, n - 1)


def hilbert_pos(i: np.ndarray, j: np.ndarray, order: int = LEVEL) -> np.ndarray:
    """Vectorized (x,y) -> distance along a 2^order Hilbert curve."""
    x = np.asarray(i, dtype=np.int64).copy()
    y = np.asarray(j, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        flip = ry == 0
        swap_flip = flip & (rx == 1)
        x_f = np.where(swap_flip, s - 1 - x, x)
        y_f = np.where(swap_flip, s - 1 - y, y)
        x, y = np.where(flip, y_f, x), np.where(flip, x_f, y)
        s >>= 1
    return d


def hilbert_xy(d: np.ndarray, order: int = LEVEL):
    """Inverse of hilbert_pos."""
    t = np.asarray(d, dtype=np.int64).copy()
    x = np.zeros_like(t)
    y = np.zeros_like(t)
    s = np.int64(1)
    while s < (np.int64(1) << order):
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        flip = ry == 0
        swap_flip = flip & (rx == 1)
        x_f = np.where(swap_flip, s - 1 - x, x)
        y_f = np.where(swap_flip, s - 1 - y, y)
        x, y = np.where(flip, y_f, x), np.where(flip, x_f, y)
        x = x + s * rx
        y = y + s * ry
        t //= 4
        s <<= 1
    return x, y


def cell_id(lat_deg, lng_deg, level: int = LEVEL) -> np.ndarray:
    """64-bit S2-style cell id at `level` (trailing-marker encoding)."""
    x, y, z = lat_lng_to_xyz(lat_deg, lng_deg)
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))
    pos = hilbert_pos(i, j)
    leaf = (face << FACE_SHIFT) | (pos << 1) | 1
    return parent(leaf, level)


def lsb_for_level(level: int) -> int:
    return 1 << (2 * (LEVEL - level))


def parent(cell: np.ndarray, level: int) -> np.ndarray:
    """Ancestor at `level` (trailing-marker arithmetic, no decode)."""
    lsb = np.int64(lsb_for_level(level))
    return (np.asarray(cell, dtype=np.int64) & ~((lsb << 1) - 1)) | lsb


def cell_level(cell: np.ndarray) -> np.ndarray:
    c = np.asarray(cell, dtype=np.int64)
    lsb = c & (-c)
    # log2 of a power of two is exact in float64
    return LEVEL - (np.log2(lsb.astype(np.float64)).astype(np.int64) // 2)


def range_min_max(cell: np.ndarray):
    """[min, max] leaf-id range covered by a cell — containment/covering
    joins become BIGINT BETWEEN predicates."""
    c = np.asarray(cell, dtype=np.int64)
    lsb = c & (-c)
    return c - (lsb - 1), c + (lsb - 1)


def contains(ancestor: np.ndarray, descendant: np.ndarray) -> np.ndarray:
    lo, hi = range_min_max(ancestor)
    d = np.asarray(descendant, dtype=np.int64)
    return (d >= lo) & (d <= hi)
