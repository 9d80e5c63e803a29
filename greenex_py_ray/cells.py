"""Spatial cell index (H3/S2-style, realized as a fixed-resolution grid key).

The reference (GreenEx_Py) does every spatial operation as a per-row
shapely ``clip``/``sjoin`` against globally materialized side data
(e.g. ``/root/reference/GreenExp/accessibility.py:228``,
``availability.py:289``).  In the Ray-Data engine every spatial join
becomes an *equi-join on a cell key*: points, polygons, raster tiles and
network nodes are all tagged with the uint64 id of the grid cell(s) they
touch, the shuffle is a ``groupby(cell)``, and exact geometry predicates
are refined inside the group.

Two keyings are provided:

* ``cell_id(ix, iy)`` — linear key ``ix * 2**20 + iy``.  Deliberately
  SQL-expressible (``floor(x/cs)*1048576 + floor(y/cs)``) so DuckDB
  oracles can reproduce tile assignments bit-for-bit.
* ``zorder(ix, iy)`` — Morton interleave of the same indices, used when
  we want range-partition locality (output ordering, tile manifests).

All functions are vectorized numpy over float64/uint64 arrays; no Python
per-row loops.
"""

from __future__ import annotations

import numpy as np

#: Number of distinct iy values per ix in the linear key. 2**20 rows of
#: cells — at 100 m cells this spans ~105,000 km, far beyond any
#: projected CRS extent we use.
CELL_STRIDE = 1 << 20

#: Default cell edge length in CRS units (meters for projected CRS).
DEFAULT_CELL_SIZE = 500.0


def cell_indices(x: np.ndarray, y: np.ndarray, cell_size: float = DEFAULT_CELL_SIZE):
    """(ix, iy) integer grid indices for point coordinates."""
    ix = np.floor(np.asarray(x, dtype=np.float64) / cell_size).astype(np.int64)
    iy = np.floor(np.asarray(y, dtype=np.float64) / cell_size).astype(np.int64)
    return ix, iy


def cell_id(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """Linear uint64 cell key. SQL equivalent:
    ``CAST(floor(x/cs) AS BIGINT) * 1048576 + CAST(floor(y/cs) AS BIGINT)``."""
    return (np.asarray(ix, dtype=np.int64) * CELL_STRIDE + np.asarray(iy, dtype=np.int64)).astype(
        np.int64
    )


def cell_of(x: np.ndarray, y: np.ndarray, cell_size: float = DEFAULT_CELL_SIZE) -> np.ndarray:
    ix, iy = cell_indices(x, y, cell_size)
    return cell_id(ix, iy)


def cell_to_indices(cell: np.ndarray):
    """Inverse of cell_id — CAVEAT: only for iy in [0, CELL_STRIDE);
    a negative iy wraps across the stride (ix−1, iy+STRIDE).  Safe for
    id-space arithmetic like ``neighbors`` (the linear key makes
    re-encoded neighbor ids identical either way) but NOT for geometry
    — derive (ix, iy) from coordinates directly there (see
    stages/zonal.areal_cell_weights)."""
    cell = np.asarray(cell, dtype=np.int64)
    ix = cell // CELL_STRIDE
    iy = cell - ix * CELL_STRIDE
    return ix, iy


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of v into even bit positions (Morton helper)."""
    v = v.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def zorder(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """Morton (Z-order) interleave of two non-negative 32-bit indices."""
    return (_part1by1(np.asarray(ix)) | (_part1by1(np.asarray(iy)) << np.uint64(1))).astype(
        np.uint64
    )


def cover_disk(
    x: np.ndarray, y: np.ndarray, radius: float, cell_size: float = DEFAULT_CELL_SIZE
):
    """Cell cover of a disk of ``radius`` around each point.

    Returns ``(point_index, cell)`` arrays: one row per (point, touched
    cell).  Mirrors the per-PoI ``clip(buffer)`` scope of the reference
    (``accessibility.py:228``, ``availability.py:236``) as a flat-map
    cover expansion: a point contributes a row for every cell its buffer
    bbox touches.  The cover uses the bounding box of the disk — a
    superset of the exact disk cover; the exact predicate is refined
    inside the per-cell group.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    ix0 = np.floor((x - radius) / cell_size).astype(np.int64)
    ix1 = np.floor((x + radius) / cell_size).astype(np.int64)
    iy0 = np.floor((y - radius) / cell_size).astype(np.int64)
    iy1 = np.floor((y + radius) / cell_size).astype(np.int64)
    nx = ix1 - ix0 + 1
    ny = iy1 - iy0 + 1
    counts = nx * ny
    total = int(counts.sum())
    point_index = np.repeat(np.arange(len(x), dtype=np.int64), counts)
    # per-point local offsets 0..count-1
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    local = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    ny_rep = np.repeat(ny, counts)
    dx = local // ny_rep
    dy = local - dx * ny_rep
    cix = np.repeat(ix0, counts) + dx
    ciy = np.repeat(iy0, counts) + dy
    return point_index, cell_id(cix, ciy)


def cover_bbox(
    x0: np.ndarray, y0: np.ndarray, x1: np.ndarray, y1: np.ndarray,
    cell_size: float = DEFAULT_CELL_SIZE,
):
    """Cell cover of axis-aligned boxes; returns (box_index, cell)."""
    ix0 = np.floor(np.asarray(x0, dtype=np.float64) / cell_size).astype(np.int64)
    ix1 = np.floor(np.asarray(x1, dtype=np.float64) / cell_size).astype(np.int64)
    iy0 = np.floor(np.asarray(y0, dtype=np.float64) / cell_size).astype(np.int64)
    iy1 = np.floor(np.asarray(y1, dtype=np.float64) / cell_size).astype(np.int64)
    nx = ix1 - ix0 + 1
    ny = iy1 - iy0 + 1
    counts = nx * ny
    total = int(counts.sum())
    idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    local = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    ny_rep = np.repeat(ny, counts)
    dx = local // ny_rep
    dy = local - dx * ny_rep
    return idx, cell_id(np.repeat(ix0, counts) + dx, np.repeat(iy0, counts) + dy)


def neighbors(cell: np.ndarray, rings: int = 1) -> np.ndarray:
    """All cells within ``rings`` Chebyshev distance of each input cell.

    Returns shape ``(len(cell), (2*rings+1)**2)``; used for cell-local
    kNN ring expansion (SURVEY J3/J5/J7).
    """
    ix, iy = cell_to_indices(cell)
    offs = np.arange(-rings, rings + 1, dtype=np.int64)
    ox, oy = np.meshgrid(offs, offs, indexing="ij")
    return cell_id(ix[:, None] + ox.ravel()[None, :], iy[:, None] + oy.ravel()[None, :])


def salt_for(cell: np.ndarray, doc_key: np.ndarray, hot_cells: dict | None, default_k: int = 1):
    """Salt hot cells: append ``hash(doc) % k`` where k comes from a
    (broadcast) ``hot_cells`` map built by a cheap groupby(cell).count()
    stats pass.  Cold cells get salt 0 (k=1)."""
    cell = np.asarray(cell, dtype=np.int64)
    key = np.asarray(doc_key)
    if not hot_cells:
        return np.zeros(len(cell), dtype=np.int64)
    ks = np.full(len(cell), default_k, dtype=np.int64)
    for c, k in hot_cells.items():
        ks[cell == c] = k
    h = (key.astype(np.int64) * np.int64(2654435761)) & np.int64(0x7FFFFFFF)
    return h % ks
