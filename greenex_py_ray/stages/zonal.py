"""Zonal statistics over raster tiles (availability pillar).

Reimplements the reference's per-row raster clips as a partitioned
partial+final aggregation:

* ``get_mean_NDVI`` — ``ndvi.rio.clip([aoi]).clip(min=0).mean()/.std()``
  rounded to 3 (`/root/reference/GreenExp/availability.py:289`).
  Population std (xarray default ddof=0); negatives clamped to 0 but
  still counted.
* ``get_landcover_percentages`` — per-class pixel share of the AoI,
  ``count/total*100`` rounded to 3
  (`availability.py:553-560, 1068-1082`).

Physical plan (the "raster⇄vector cell alignment" of the north rule)::

    poi ── map_batches(TileCover)        # flat cover expansion: 1 row per (poi, touched tile)
        ── sort("tile_key")              # co-locate rows of the same tile
        ── map_batches(ZonalPartialActor, concurrency=k)   # per-actor LRU tile cache,
        │                                # vectorized pixel mask per poi → partial Σ,Σ²,n
        ── groupby(key).aggregate(Sum…)  # small shuffle over partials, not pixels
        ── map_batches(finish)           # mean/std/percentage + rounding

The AoI here is the euclidean disk of ``radius`` (pixel-center-in-circle
test — the limit of the reference's 64-gon buffer discretization; exact
circle chosen so the DuckDB oracle can reproduce values bit-for-bit).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources import synth
from ..state.tiles import TileStore

TILE_KEY_STRIDE = 1 << 20


def tile_cover_batch(batch: pa.Table, radius: float, key_col: str) -> pa.Table:
    """Flat-map: one output row per (input row, raster tile overlapped by
    the disk bbox).  Output: key, x, y, tile_key (tix*2^20+tiy)."""
    x = batch.column("x").to_numpy(zero_copy_only=False)
    y = batch.column("y").to_numpy(zero_copy_only=False)
    keys = batch.column(key_col)
    ts = synth.TILE_SIZE
    ix0 = np.floor((x - radius) / ts).astype(np.int64)
    ix1 = np.floor((x + radius) / ts).astype(np.int64)
    iy0 = np.floor((y - radius) / ts).astype(np.int64)
    iy1 = np.floor((y + radius) / ts).astype(np.int64)
    counts = (ix1 - ix0 + 1) * (iy1 - iy0 + 1)
    total = int(counts.sum())
    idx = np.repeat(np.arange(len(x), dtype=np.int64), counts)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    local = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    ny = np.repeat(iy1 - iy0 + 1, counts)
    dx = local // ny
    dy = local - dx * ny
    tix = np.repeat(ix0, counts) + dx
    tiy = np.repeat(iy0, counts) + dy
    return pa.table(
        {
            key_col: keys.take(pa.array(idx)),
            "x": pa.array(x[idx]),
            "y": pa.array(y[idx]),
            "tile_key": pa.array(tix * TILE_KEY_STRIDE + tiy),
        }
    )


class TileCover:
    def __init__(self, radius: float, key_col: str = "doc_id"):
        self.radius = radius
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return tile_cover_batch(batch, self.radius, self.key_col)


def _pixel_disk_values(store: TileStore, band: str, tix: int, tiy: int,
                       x: np.ndarray, y: np.ndarray, radius: float):
    """For each point, values of tile pixels whose centers lie within the
    disk.  Returns (point_local_index, values) flattened arrays.

    Pixel-center math mirrors the SQL oracle exactly:
    center = global_pixel_index * res + res/2 (all float64-exact)."""
    arr = store.get(band, tix, tiy)
    if arr is None:  # tile outside the raster extent → contributes nothing
        return np.empty(0, np.int64), np.empty(0)
    h, w = arr.shape
    res = synth.RASTER_RES
    x0 = tix * synth.TILE_SIZE
    y0 = tiy * synth.TILE_SIZE
    out_idx = []
    out_vals = []
    r2 = radius * radius
    for i in range(len(x)):
        c0 = max(int(np.floor((x[i] - radius - x0) / res)), 0)
        c1 = min(int(np.floor((x[i] + radius - x0) / res)), w - 1)
        r0 = max(int(np.floor((y[i] - radius - y0) / res)), 0)
        r1 = min(int(np.floor((y[i] + radius - y0) / res)), h - 1)
        if c1 < c0 or r1 < r0:
            continue
        px = x0 + (np.arange(c0, c1 + 1, dtype=np.float64) + 0.5) * res
        py = y0 + (np.arange(r0, r1 + 1, dtype=np.float64) + 0.5) * res
        dx2 = (px - x[i]) * (px - x[i])
        dy2 = (py - y[i]) * (py - y[i])
        mask = dy2[:, None] + dx2[None, :] <= r2
        if not mask.any():
            continue
        vals = arr[r0 : r1 + 1, c0 : c1 + 1][mask]
        out_idx.append(np.full(vals.size, i, dtype=np.int64))
        out_vals.append(vals)
    if not out_idx:
        return np.empty(0, np.int64), np.empty(0)
    return np.concatenate(out_idx), np.concatenate(out_vals)


class ZonalStatsPartial:
    """Actor-pool stage: (key, x, y, tile_key) rows → per-(key, tile)
    partial sums (Σ, Σ², n) of clamped band values within the disk.

    Tile decode + cache live in ``__init__`` (once per actor), the batch
    body is vectorized per tile.  Emits one row per input row (partials),
    to be summed by ``groupby(key)``.
    """

    def __init__(self, tile_root: str, band: str, radius: float,
                 key_col: str = "doc_id", clamp_min: float | None = 0.0,
                 cache_tiles: int = 256):
        self.store = TileStore(tile_root, capacity=cache_tiles)
        self.band = band
        self.radius = radius
        self.key_col = key_col
        self.clamp_min = clamp_min

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        tk = batch.column("tile_key").to_numpy(zero_copy_only=False)
        n = len(x)
        psum = np.zeros(n)
        psumsq = np.zeros(n)
        pcount = np.zeros(n, dtype=np.int64)
        for tile in np.unique(tk):
            sel = np.flatnonzero(tk == tile)
            tix = int(tile) // TILE_KEY_STRIDE
            tiy = int(tile) - tix * TILE_KEY_STRIDE
            li, vals = _pixel_disk_values(
                self.store, self.band, tix, tiy, x[sel], y[sel], self.radius
            )
            if len(vals) == 0:
                continue
            # skip nodata (NaN) pixels — same skipna semantics as the
            # fused path's finite-masked SATs; no-op on the synth world
            fin = np.isfinite(vals)
            if not fin.all():
                li, vals = li[fin], vals[fin]
            if self.clamp_min is not None:
                vals = np.maximum(vals, self.clamp_min)
            rows = sel[li]
            np.add.at(psum, rows, vals)
            np.add.at(psumsq, rows, vals * vals)
            np.add.at(pcount, rows, 1)
        return pa.table(
            {
                self.key_col: batch.column(self.key_col),
                "psum": pa.array(psum),
                "psumsq": pa.array(psumsq),
                "pcount": pa.array(pcount),
            }
        )


def finish_mean_std(batch: pa.Table, key_col: str = "doc_id",
                    mean_name: str = "mean_NDVI", std_name: str = "std_NDVI") -> pa.Table:
    """Final mean/std from summed partials; reference rounding (3) and
    population std (availability.py:289)."""
    s = batch.column("sum(psum)").to_numpy(zero_copy_only=False)
    ss = batch.column("sum(psumsq)").to_numpy(zero_copy_only=False)
    n = batch.column("sum(pcount)").to_numpy(zero_copy_only=False).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean = s / n
        var = ss / n - mean * mean
    std = np.sqrt(np.maximum(var, 0.0))
    return pa.table(
        {
            key_col: batch.column(key_col),
            mean_name: pa.array(np.round(mean, 3)),
            std_name: pa.array(np.round(std, 3)),
        }
    )


class LandcoverPartial:
    """Per-(key, tile) class-count partials for landcover percentages.

    Emits one count column per class in ``classmap`` plus a total; the
    final stage computes ``count/total*100`` rounded to 3
    (availability.py:1068-1082).  ``classmap`` is a small broadcast dict
    {class_value: column_name} passed by value to each actor.
    """

    def __init__(self, tile_root: str, radius: float, classmap: dict[int, str],
                 key_col: str = "doc_id", band: str = "lulc", cache_tiles: int = 256):
        self.store = TileStore(tile_root, capacity=cache_tiles)
        self.band = band
        self.radius = radius
        self.key_col = key_col
        self.classes = sorted(classmap)
        self.names = [classmap[c] for c in self.classes]

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        tk = batch.column("tile_key").to_numpy(zero_copy_only=False)
        n = len(x)
        counts = np.zeros((n, len(self.classes)), dtype=np.int64)
        total = np.zeros(n, dtype=np.int64)
        cls_arr = np.asarray(self.classes)
        for tile in np.unique(tk):
            sel = np.flatnonzero(tk == tile)
            tix = int(tile) // TILE_KEY_STRIDE
            tiy = int(tile) - tix * TILE_KEY_STRIDE
            li, vals = _pixel_disk_values(
                self.store, self.band, tix, tiy, x[sel], y[sel], self.radius
            )
            if len(vals) == 0:
                continue
            rows = sel[li]
            np.add.at(total, rows, 1)
            pos = np.searchsorted(cls_arr, vals)
            ok = (pos < len(cls_arr)) & (cls_arr[np.minimum(pos, len(cls_arr) - 1)] == vals)
            np.add.at(counts, (rows[ok], pos[ok]), 1)
        cols = {self.key_col: batch.column(self.key_col)}
        for j, name in enumerate(self.names):
            cols[f"cnt_{name}"] = pa.array(counts[:, j])
        cols["cnt_total"] = pa.array(total)
        return pa.table(cols)


def finish_landcover(batch: pa.Table, names: list[str], key_col: str = "doc_id",
                     stringify: bool = False) -> pa.Table:
    total = batch.column("sum(cnt_total)").to_numpy(zero_copy_only=False).astype(np.float64)
    cols = {key_col: batch.column(key_col)}
    for name in names:
        c = batch.column(f"sum(cnt_{name})").to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            pct = np.round(c / total * 100.0, 3)
        if stringify:
            # reference format: str(round(x,3)) + '%'  (availability.py:1080)
            cols[name] = pa.array([None if np.isnan(v) else f"{v!s}%" for v in pct])
        else:
            cols[name] = pa.array(pct)
    return pa.table(cols)


def split_rings(ring: np.ndarray, sizes) -> "list[np.ndarray]":
    """Flattened ring vertices + per-ring sizes → list of ring arrays."""
    if sizes and len(sizes) > 1:
        bounds = np.concatenate([[0], np.cumsum(sizes)])
        return [ring[bounds[j]:bounds[j + 1]] for j in range(len(sizes))]
    return [ring]


def mask_rings_dilated(px: np.ndarray, py: np.ndarray,
                       rings_i: "list[np.ndarray]",
                       dilate: float = 0.0) -> np.ndarray:
    """Membership of lattice points in a polygon dilated by ``dilate``
    (the raster form of shapely's ``polygon.buffer(d)`` with an exact
    disc instead of the 16-segs/quadrant arc approximation — pixel
    membership is center-in-polygon OR within ``d`` of the boundary).
    Chunked so the points × edges matrices stay bounded."""
    from .. import geom as _geom
    from ..state.graph import points_to_segments_dist

    inside = _geom.points_in_rings(px, py, rings_i)
    if dilate <= 0.0:
        return inside
    out = np.flatnonzero(~inside)
    if not len(out):
        return inside
    ax = np.concatenate([r[:, 0] for r in rings_i])
    ay = np.concatenate([r[:, 1] for r in rings_i])
    bx = np.concatenate([np.roll(r[:, 0], -1) for r in rings_i])
    by = np.concatenate([np.roll(r[:, 1], -1) for r in rings_i])
    step = max(1, 2_000_000 // max(len(ax), 1))
    near = np.zeros(len(out), dtype=bool)
    for s in range(0, len(out), step):
        sel = out[s:s + step]
        near[s:s + step] = points_to_segments_dist(
            px[sel], py[sel], ax, ay, bx, by) <= dilate
    inside = inside.copy()
    inside[out] = near
    return inside


class PolygonZonalPartial:
    """Zonal partials where the AoI is each row's own POLYGON geometry
    (aoi_kind='polygon', availability.py:230-234) instead of a buffer.

    Expects flattened ring columns ``ring_x: list<double>,
    ring_y: list<double>`` plus ``tile_key``; the pixel membership test
    is center-in-polygon (rio.clip all_touched=False semantics).
    ``dilate`` > 0 gives the polygon-buffered AoI
    (``poi.geometry.buffer(buffer_dist)`` on polygon PoIs,
    availability.py:235-237) at pixel resolution."""

    def __init__(self, tile_root: str, band: str, key_col: str = "doc_id",
                 clamp_min: float | None = 0.0, cache_tiles: int = 256,
                 dilate: float = 0.0):
        self.store = TileStore(tile_root, capacity=cache_tiles)
        self.band = band
        self.key_col = key_col
        self.clamp_min = clamp_min
        self.dilate = float(dilate)

    def _window_vals(self, rings_i, ring, tile) -> np.ndarray | None:
        """Band values under the (optionally dilated) polygon mask,
        restricted to one tile's window; None when the window is empty."""
        from .. import geom as _geom

        res = synth.RASTER_RES
        tix = tile // TILE_KEY_STRIDE
        tiy = tile - tix * TILE_KEY_STRIDE
        arr = self.store.get(self.band, tix, tiy)
        if arr is None:
            return None
        h, w = arr.shape
        x0t = tix * synth.TILE_SIZE
        y0t = tiy * synth.TILE_SIZE
        bx0, by0, bx1, by1 = _geom.rings_bbox(ring)
        d = self.dilate
        c0 = max(int(np.floor((bx0 - d - x0t) / res)), 0)
        c1 = min(int(np.floor((bx1 + d - x0t) / res)), w - 1)
        r0 = max(int(np.floor((by0 - d - y0t) / res)), 0)
        r1 = min(int(np.floor((by1 + d - y0t) / res)), h - 1)
        if c1 < c0 or r1 < r0:
            return None
        px = x0t + (np.arange(c0, c1 + 1, dtype=np.float64) + 0.5) * res
        py = y0t + (np.arange(r0, r1 + 1, dtype=np.float64) + 0.5) * res
        gx, gy = np.meshgrid(px, py, indexing="xy")
        mask = mask_rings_dilated(gx.ravel(), gy.ravel(), rings_i,
                                  self.dilate).reshape(gx.shape)
        if not mask.any():
            return None
        return arr[r0 : r1 + 1, c0 : c1 + 1][mask]

    def __call__(self, batch: pa.Table) -> pa.Table:
        rx = batch.column("ring_x").to_pylist()
        ry = batch.column("ring_y").to_pylist()
        sizes = (batch.column("ring_sizes").to_pylist()
                 if "ring_sizes" in batch.column_names else [None] * len(rx))
        tk = batch.column("tile_key").to_numpy(zero_copy_only=False)
        n = len(rx)
        psum = np.zeros(n)
        psumsq = np.zeros(n)
        pcount = np.zeros(n, dtype=np.int64)
        for i in range(n):
            ring = np.column_stack([rx[i], ry[i]])
            vals = self._window_vals(split_rings(ring, sizes[i]), ring,
                                     int(tk[i]))
            if vals is None:
                continue
            if self.clamp_min is not None:
                vals = np.maximum(vals, self.clamp_min)
            psum[i] = vals.sum()
            psumsq[i] = (vals * vals).sum()
            pcount[i] = vals.size
        return pa.table(
            {
                self.key_col: batch.column(self.key_col),
                "psum": pa.array(psum),
                "psumsq": pa.array(psumsq),
                "pcount": pa.array(pcount),
            }
        )


class PolygonLandcoverPartial(PolygonZonalPartial):
    """Per-(row, tile) landcover class-count partials where the AoI is
    the row's own polygon (``get_landcover_percentages`` with polygon
    PoIs, availability.py:361-377 + the same per-class pixel ratio as
    the buffered form); sums feed :func:`finish_landcover`."""

    def __init__(self, tile_root: str, classmap: dict[int, str],
                 key_col: str = "doc_id", band: str = "lulc",
                 cache_tiles: int = 256, dilate: float = 0.0):
        super().__init__(tile_root, band, key_col=key_col, clamp_min=None,
                         cache_tiles=cache_tiles, dilate=dilate)
        self.classes = sorted(classmap)
        self.names = [classmap[c] for c in self.classes]

    def __call__(self, batch: pa.Table) -> pa.Table:
        rx = batch.column("ring_x").to_pylist()
        ry = batch.column("ring_y").to_pylist()
        sizes = (batch.column("ring_sizes").to_pylist()
                 if "ring_sizes" in batch.column_names else [None] * len(rx))
        tk = batch.column("tile_key").to_numpy(zero_copy_only=False)
        n = len(rx)
        counts = np.zeros((n, len(self.classes)), dtype=np.int64)
        total = np.zeros(n, dtype=np.int64)
        cls_arr = np.asarray(self.classes)
        for i in range(n):
            ring = np.column_stack([rx[i], ry[i]])
            vals = self._window_vals(split_rings(ring, sizes[i]), ring,
                                     int(tk[i]))
            if vals is None:
                continue
            vals = vals[np.isfinite(vals)]
            total[i] = vals.size
            pos = np.searchsorted(cls_arr, vals)
            ok = (pos < len(cls_arr)) & (cls_arr[np.minimum(pos, len(cls_arr) - 1)] == vals)
            np.add.at(counts[i], pos[ok], 1)
        cols = {self.key_col: batch.column(self.key_col)}
        for j, name in enumerate(self.names):
            cols[f"cnt_{name}"] = pa.array(counts[:, j])
        cols["cnt_total"] = pa.array(total)
        return pa.table(cols)


def polygon_tile_cover_batch(batch: pa.Table, key_col: str,
                             margin: float = 0.0) -> pa.Table:
    """Cover expansion for polygon-AoI rows: one output row per
    (row, tile overlapped by the ring bbox grown by ``margin`` — the
    dilation radius when the AoI is a buffered polygon), carrying the
    ring along."""
    rx = batch.column("ring_x")
    ry = batch.column("ring_y")
    if isinstance(rx, pa.ChunkedArray):
        rx = rx.combine_chunks()
    if isinstance(ry, pa.ChunkedArray):
        ry = ry.combine_chunks()
    rx_list = rx.to_pylist()
    ry_list = ry.to_pylist()
    ts = synth.TILE_SIZE
    out_idx, out_tk = [], []
    for i in range(len(rx_list)):
        xs = np.asarray(rx_list[i])
        ys = np.asarray(ry_list[i])
        ix0 = int(np.floor((xs.min() - margin) / ts))
        ix1 = int(np.floor((xs.max() + margin) / ts))
        iy0 = int(np.floor((ys.min() - margin) / ts))
        iy1 = int(np.floor((ys.max() + margin) / ts))
        for tx in range(ix0, ix1 + 1):
            for ty in range(iy0, iy1 + 1):
                out_idx.append(i)
                out_tk.append(tx * TILE_KEY_STRIDE + ty)
    idx = pa.array(np.array(out_idx, dtype=np.int64))
    cols = {
        key_col: batch.column(key_col).take(idx),
        "ring_x": rx.take(idx),
        "ring_y": ry.take(idx),
        "tile_key": pa.array(np.array(out_tk, dtype=np.int64)),
    }
    if "ring_sizes" in batch.column_names:
        rs = batch.column("ring_sizes")
        if isinstance(rs, pa.ChunkedArray):
            rs = rs.combine_chunks()
        cols["ring_sizes"] = rs.take(idx)
    return pa.table(cols)


def _disk_chords(x: np.ndarray, y: np.ndarray, r: float, x0: float, y0: float,
                 h: int, w: int):
    """Per-point disk→row-chord decomposition against one tile.

    Returns ``(rows_c, lo, hi, use)``: for each point (axis 0) and each
    candidate pixel row (axis 1), the clipped row index, the inclusive
    chord column bounds, and whether the chord is non-empty.  Chord
    bounds from sqrt are corrected by ±1 against the ORIGINAL inequality
    ``dx²+dy² ≤ r²`` so the included pixel set is bit-identical to the
    direct mask (and to the SQL oracle).  Shared by the NDVI SAT kernel
    and the landcover per-class kernel.
    """
    res = synth.RASTER_RES
    K = int(2 * r / res) + 3
    r0 = np.floor((y - r - y0) / res).astype(np.int64)
    rlast = np.floor((y + r - y0) / res).astype(np.int64)
    rows = r0[:, None] + np.arange(K)[None, :]
    row_ok = (rows >= 0) & (rows <= h - 1) & (rows <= rlast[:, None])
    py = y0 + (rows + 0.5) * res
    dy2 = (py - y[:, None]) ** 2
    rad2 = r * r - dy2
    ok = row_ok & (rad2 >= 0.0)
    halfw = np.sqrt(np.maximum(rad2, 0.0))
    clo = np.ceil((x[:, None] - halfw - x0) / res - 0.5).astype(np.int64)
    chi = np.floor((x[:, None] + halfw - x0) / res - 0.5).astype(np.int64)

    def _inside(cols):
        px = x0 + (cols + 0.5) * res
        dx2 = (px - x[:, None]) ** 2
        return dx2 + dy2 <= r * r

    clo = np.where(_inside(clo - 1), clo - 1, clo)
    clo = np.where(~_inside(clo), clo + 1, clo)
    chi = np.where(_inside(chi + 1), chi + 1, chi)
    chi = np.where(~_inside(chi), chi - 1, chi)
    use = ok & (chi >= clo) & (chi >= 0) & (clo <= w - 1)
    lo = np.clip(clo, 0, w - 1)
    hi = np.clip(chi, 0, w - 1)
    rows_c = np.clip(rows, 0, h - 1)
    return rows_c, lo, hi, use


def _tile_cover_flat(x: np.ndarray, y: np.ndarray, r: float):
    """Flat (point-index, tile-key) cover expansion for disks —
    vectorized repeat/cumsum, no per-point Python loop."""
    ts = synth.TILE_SIZE
    ix0 = np.floor((x - r) / ts).astype(np.int64)
    ix1 = np.floor((x + r) / ts).astype(np.int64)
    iy0 = np.floor((y - r) / ts).astype(np.int64)
    iy1 = np.floor((y + r) / ts).astype(np.int64)
    counts = (ix1 - ix0 + 1) * (iy1 - iy0 + 1)
    idx = np.repeat(np.arange(len(x)), counts)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    local = np.arange(int(counts.sum())) - np.repeat(starts, counts)
    ny = np.repeat(iy1 - iy0 + 1, counts)
    dxs = local // ny
    dys = local - dxs * ny
    tkx = np.repeat(ix0, counts) + dxs
    tky = np.repeat(iy0, counts) + dys
    return idx, tkx * TILE_KEY_STRIDE + tky


class ZonalStatsLocal:
    """Fused zonal stage: poi(key, x, y) batches → FINAL per-key
    mean/std, no shuffle.

    A disk AoI spans at most ceil(2r/TILE_SIZE+1)² tiles (≤4 for
    r≤1280 m), so each row's full aggregation is local to the actor via
    the tile cache — strictly cheaper than partial+groupby at every
    scale.  ``ZonalStatsPartial`` + groupby remains the path for radii
    spanning many tiles.

    Kernel: per-tile row-cumsum tables of (clamped value, value², count)
    built once per actor; each point's disk reduces to per-row chord
    segment sums.  Chord column bounds from sqrt are corrected by ±1
    against the ORIGINAL inequality ``dx²+dy² ≤ r²`` so the included
    pixel set is bit-identical to the direct mask (and to the SQL
    oracle); only floating-point summation order differs.
    """

    def __init__(self, tile_root: str, band: str, radius: float,
                 key_col: str = "doc_id", clamp_min: float | None = 0.0,
                 mean_name: str = "mean_NDVI", std_name: str = "std_NDVI",
                 cache_tiles: int = 256):
        self.store = TileStore(tile_root, capacity=cache_tiles)
        self.band = band
        self.radius = radius
        self.key_col = key_col
        self.clamp_min = clamp_min
        self.mean_name = mean_name
        self.std_name = std_name
        self._sat: dict[tuple[int, int], tuple] = {}

    def _tile_sat(self, tix: int, tiy: int):
        """(row-cumsum of clamped vals, of vals², width) or None."""
        key = (tix, tiy)
        if key in self._sat:
            return self._sat[key]
        arr = self.store.get(self.band, tix, tiy)
        if arr is None:
            self._sat[key] = None
            return None
        v = np.maximum(arr, self.clamp_min) if self.clamp_min is not None else arr
        # nodata (NaN) pixels contribute nothing — the reference's
        # xarray mean/std skip NaN (skipna).  On the all-finite
        # synthetic world fin is all-ones, so c1/c2/c0 and every chord
        # segment are bit-identical to the unmasked form (gates green).
        fin = np.isfinite(arr)
        allfin = bool(fin.all())
        if not allfin:
            v = np.where(fin, v, 0.0)
        c1 = np.cumsum(v, axis=1)
        c2 = np.cumsum(v * v, axis=1)
        # all-finite tiles (the common case) need no count table: the
        # chord count is analytic (hi-lo+1), saving one int64 cumsum per
        # tile and two gathers per point-tile pair
        c0 = None if allfin else np.cumsum(fin, axis=1, dtype=np.int64)
        self._sat[key] = (c1, c2, c0, arr.shape[0], arr.shape[1])
        if len(self._sat) > 512:
            self._sat.pop(next(iter(self._sat)))
        return self._sat[key]

    def _disk_tile_sums_many(self, tix: int, tiy: int,
                             x: np.ndarray, y: np.ndarray):
        """Vectorized over all points touching one tile: per-point
        (Σv, Σv², n) of their disk pixels within this tile.  All math is
        2-D (points × candidate rows) — ~10 numpy calls per tile group
        regardless of point count."""
        m = len(x)
        sat = self._tile_sat(tix, tiy)
        if sat is None:
            z = np.zeros(m)
            return z, z.copy(), np.zeros(m, dtype=np.int64)
        c1, c2, c0, h, w = sat
        rows_c, lo, hi, use = _disk_chords(
            x, y, self.radius, tix * synth.TILE_SIZE, tiy * synth.TILE_SIZE,
            h, w)
        lo1 = np.maximum(lo - 1, 0)
        seg1 = c1[rows_c, hi] - np.where(lo > 0, c1[rows_c, lo1], 0.0)
        seg2 = c2[rows_c, hi] - np.where(lo > 0, c2[rows_c, lo1], 0.0)
        if c0 is None:  # all-finite tile: count is the chord length
            cnt = (hi - lo + 1) * use
        else:
            cnt = (c0[rows_c, hi] - np.where(lo > 0, c0[rows_c, lo1], 0)) * use
        return (
            np.where(use, seg1, 0.0).sum(axis=1),
            np.where(use, seg2, 0.0).sum(axis=1),
            cnt.sum(axis=1).astype(np.int64),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        n = len(x)
        psum = np.zeros(n)
        psumsq = np.zeros(n)
        pcount = np.zeros(n, dtype=np.int64)
        # flat cover expansion, then one vectorized kernel per tile
        idx, tkey = _tile_cover_flat(x, y, self.radius)
        order = np.argsort(tkey, kind="stable")
        uniq, bounds_start = np.unique(tkey[order], return_index=True)
        bounds = np.concatenate([bounds_start, [len(tkey)]])
        for g, tk in enumerate(uniq):
            sel = order[bounds[g] : bounds[g + 1]]
            docs = idx[sel]
            tx = int(tk) // TILE_KEY_STRIDE
            ty = int(tk) - tx * TILE_KEY_STRIDE
            s1, s2, cnt = self._disk_tile_sums_many(tx, ty, x[docs], y[docs])
            np.add.at(psum, docs, s1)
            np.add.at(psumsq, docs, s2)
            np.add.at(pcount, docs, cnt)
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = psum / pcount
            var = psumsq / pcount - mean * mean
        std = np.sqrt(np.maximum(var, 0.0))
        return pa.table(
            {
                self.key_col: batch.column(self.key_col),
                self.mean_name: pa.array(np.round(mean, 3)),
                self.std_name: pa.array(np.round(std, 3)),
            }
        )


class LandcoverLocal:
    """Fused landcover percentages (no shuffle), analog of
    :class:`ZonalStatsLocal`: per-tile PER-CLASS row-cumsum tables built
    once per actor, each point's disk reduced to chord segment count
    differences — the same ~10-numpy-call-per-tile-group shape as the
    NDVI SAT kernel (replaces the round-1 per-point, per-tile Python
    loop that called the mask kernel with 1-point arrays)."""

    def __init__(self, tile_root: str, radius: float, classmap: dict[int, str],
                 key_col: str = "doc_id", band: str = "lulc",
                 stringify: bool = False, cache_tiles: int = 256):
        self.store = TileStore(tile_root, capacity=cache_tiles)
        self.band = band
        self.radius = radius
        self.key_col = key_col
        self.classes = sorted(classmap)
        self.names = [classmap[c] for c in self.classes]
        self.stringify = stringify
        self._sat: dict[tuple[int, int], tuple] = {}

    def _tile_class_sat(self, tix: int, tiy: int):
        """(row-cumsum of (arr == cls) per class, h, w) or None."""
        key = (tix, tiy)
        if key in self._sat:
            return self._sat[key]
        arr = self.store.get(self.band, tix, tiy)
        if arr is None:
            self._sat[key] = None
            return None
        cs = np.stack([
            np.cumsum(arr == cls, axis=1, dtype=np.int32)
            for cls in self.classes
        ])
        self._sat[key] = (cs, arr.shape[0], arr.shape[1])
        if len(self._sat) > 512:
            self._sat.pop(next(iter(self._sat)))
        return self._sat[key]

    def _disk_tile_counts_many(self, tix: int, tiy: int,
                               x: np.ndarray, y: np.ndarray):
        """Per-point (class counts (m, ncls), total (m,)) of disk pixels
        within one tile — vectorized over the tile's point group."""
        m = len(x)
        ncls = len(self.classes)
        sat = self._tile_class_sat(tix, tiy)
        if sat is None:
            return np.zeros((m, ncls), np.int64), np.zeros(m, np.int64)
        cs, h, w = sat
        rows_c, lo, hi, use = _disk_chords(
            x, y, self.radius, tix * synth.TILE_SIZE, tiy * synth.TILE_SIZE,
            h, w)
        lo1 = np.maximum(lo - 1, 0)
        lo_pos = lo > 0
        counts = np.empty((m, ncls), dtype=np.int64)
        for j in range(ncls):
            seg = cs[j][rows_c, hi] - np.where(lo_pos, cs[j][rows_c, lo1], 0)
            counts[:, j] = np.where(use, seg, 0).sum(axis=1)
        total = ((hi - lo + 1) * use).sum(axis=1).astype(np.int64)
        return counts, total

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        n = len(x)
        counts = np.zeros((n, len(self.classes)), dtype=np.int64)
        total = np.zeros(n, dtype=np.int64)
        idx, tkey = _tile_cover_flat(x, y, self.radius)
        order = np.argsort(tkey, kind="stable")
        uniq, bounds_start = np.unique(tkey[order], return_index=True)
        bounds = np.concatenate([bounds_start, [len(tkey)]])
        for g, tk in enumerate(uniq):
            sel = order[bounds[g] : bounds[g + 1]]
            docs = idx[sel]
            tx = int(tk) // TILE_KEY_STRIDE
            ty = int(tk) - tx * TILE_KEY_STRIDE
            c, t = self._disk_tile_counts_many(tx, ty, x[docs], y[docs])
            np.add.at(counts, docs, c)
            np.add.at(total, docs, t)
        cols = {self.key_col: batch.column(self.key_col)}
        tot = total.astype(np.float64)
        for j, name in enumerate(self.names):
            with np.errstate(divide="ignore", invalid="ignore"):
                pct = np.round(counts[:, j] / tot * 100.0, 3)
            if self.stringify:
                cols[name] = pa.array([None if np.isnan(v) else f"{v!s}%" for v in pct])
            else:
                cols[name] = pa.array(pct)
        return pa.table(cols)


class LineZonalLocal:
    """Fused zonal stats where each row's AoI is a BUFFERED POLYLINE
    (the reference's street-network flow: edges become PoI rows and
    ``poi.geometry.buffer(buffer_dist)`` is a sausage polygon,
    availability.py:52-61,134).  Pixel membership: center within
    ``buffer_dist`` of any sub-segment (capsule union — exact).

    Expects per-row polyline columns ``geom_x``/``geom_y``
    (list<double>) or straight-segment ``ax/ay/bx/by``.  The per-edge
    loop is Python, the pixel × segment distance math inside is fully
    vectorized (bbox-clipped per tile) — the same shape as
    :class:`PolygonZonalPartial`.
    """

    def __init__(self, tile_root: str, band: str, buffer_dist: float,
                 key_col: str = "edge_id", clamp_min: float | None = 0.0,
                 mean_name: str = "mean_NDVI", std_name: str = "std_NDVI",
                 cache_tiles: int = 256):
        self.store = TileStore(tile_root, capacity=cache_tiles)
        self.band = band
        self.d = float(buffer_dist)
        self.key_col = key_col
        self.clamp_min = clamp_min
        self.mean_name = mean_name
        self.std_name = std_name

    def _edge_polyline(self, batch: pa.Table, i: int) -> np.ndarray:
        if "geom_x" in batch.column_names:
            gx = batch.column("geom_x")[i].as_py()
            gy = batch.column("geom_y")[i].as_py()
            if gx and len(gx) >= 2:
                return np.column_stack([np.asarray(gx, np.float64),
                                        np.asarray(gy, np.float64)])
        return np.array([
            [batch.column("ax")[i].as_py(), batch.column("ay")[i].as_py()],
            [batch.column("bx")[i].as_py(), batch.column("by")[i].as_py()],
        ])

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        psum = np.zeros(n)
        psumsq = np.zeros(n)
        pcount = np.zeros(n, dtype=np.int64)
        res = synth.RASTER_RES
        ts = synth.TILE_SIZE
        d = self.d
        for i in range(n):
            g = self._edge_polyline(batch, i)
            sax, say = g[:-1, 0], g[:-1, 1]
            sdx, sdy = np.diff(g[:, 0]), np.diff(g[:, 1])
            len2 = sdx * sdx + sdy * sdy
            bx0, by0 = g[:, 0].min() - d, g[:, 1].min() - d
            bx1, by1 = g[:, 0].max() + d, g[:, 1].max() + d
            for tx in range(int(np.floor(bx0 / ts)), int(np.floor(bx1 / ts)) + 1):
                for ty in range(int(np.floor(by0 / ts)), int(np.floor(by1 / ts)) + 1):
                    arr = self.store.get(self.band, tx, ty)
                    if arr is None:
                        continue
                    h, w = arr.shape
                    x0t, y0t = tx * ts, ty * ts
                    c0 = max(int(np.floor((bx0 - x0t) / res)), 0)
                    c1 = min(int(np.floor((bx1 - x0t) / res)), w - 1)
                    r0 = max(int(np.floor((by0 - y0t) / res)), 0)
                    r1 = min(int(np.floor((by1 - y0t) / res)), h - 1)
                    if c1 < c0 or r1 < r0:
                        continue
                    px = x0t + (np.arange(c0, c1 + 1, dtype=np.float64) + 0.5) * res
                    py = y0t + (np.arange(r0, r1 + 1, dtype=np.float64) + 0.5) * res
                    gx, gy = np.meshgrid(px, py, indexing="xy")
                    fx = gx.ravel()[:, None]
                    fy = gy.ravel()[:, None]
                    qx = fx - sax[None, :]
                    qy = fy - say[None, :]
                    with np.errstate(divide="ignore", invalid="ignore"):
                        t = (qx * sdx[None, :] + qy * sdy[None, :]) / len2[None, :]
                    t = np.where(len2[None, :] > 0, t, 0.0)
                    t = np.minimum(np.maximum(t, 0.0), 1.0)
                    d2 = (qx - t * sdx[None, :]) ** 2 + (qy - t * sdy[None, :]) ** 2
                    mask = (d2 <= d * d).any(axis=1).reshape(gx.shape)
                    if not mask.any():
                        continue
                    vals = arr[r0 : r1 + 1, c0 : c1 + 1][mask]
                    if self.clamp_min is not None:
                        vals = np.maximum(vals, self.clamp_min)
                    psum[i] += vals.sum()
                    psumsq[i] += (vals * vals).sum()
                    pcount[i] += vals.size
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = psum / pcount
            var = psumsq / pcount - mean * mean
        std = np.sqrt(np.maximum(var, 0.0))
        # drop edges whose buffer covers no stored pixel: the SQL oracle
        # GROUP BYs over matched pixels and omits them — emitting NaN
        # rows here would be a latent gate mismatch (round-2 advice)
        keep = pa.array(pcount > 0)
        return pa.table({
            self.key_col: batch.column(self.key_col),
            self.mean_name: pa.array(np.round(mean, 3)),
            self.std_name: pa.array(np.round(std, 3)),
        }).filter(keep)


def areal_cell_weights(rects: "ray.data.Dataset",
                       cell_size: float = 500.0,
                       key_col: str = "gs_id") -> "ray.data.Dataset":
    """Areal-interpolation weights: for every (rect, grid-cell) pair the
    exact overlap area and the fraction of the rect it covers — the
    raster⇄vector reaggregation primitive (transfer a polygon-level
    statistic onto the tile grid, or vice versa, by area weighting).

    One flat-explode pass: ``cells.cover_bbox`` enumerates covered
    cells vectorized, the 1-D interval overlaps multiply into exact
    areas, nothing shuffles — output is a map-only stream of
    O(Σ cells-per-rect) rows.  Zero-area slivers (rect edge exactly on
    a cell line) are dropped to keep the pair set minimal.
    """
    from .. import cells as _cells

    def explode(batch: pa.Table) -> pa.Table:
        x0 = batch.column("x0").to_numpy(zero_copy_only=False)
        y0 = batch.column("y0").to_numpy(zero_copy_only=False)
        x1 = batch.column("x1").to_numpy(zero_copy_only=False)
        y1 = batch.column("y1").to_numpy(zero_copy_only=False)
        # enumerate (ix, iy) directly: cell_to_indices cannot decode
        # negative iy (the linear key wraps across the stride), and
        # rects near the world's south edge do go below y = 0
        ix0 = np.floor(x0 / cell_size).astype(np.int64)
        ix1 = np.floor(x1 / cell_size).astype(np.int64)
        iy0 = np.floor(y0 / cell_size).astype(np.int64)
        iy1 = np.floor(y1 / cell_size).astype(np.int64)
        nx, ny = ix1 - ix0 + 1, iy1 - iy0 + 1
        counts = nx * ny
        idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        local = (np.arange(int(counts.sum()), dtype=np.int64)
                 - np.repeat(starts, counts))
        ny_rep = np.repeat(ny, counts)
        ix = np.repeat(ix0, counts) + local // ny_rep
        iy = np.repeat(iy0, counts) + local - (local // ny_rep) * ny_rep
        cell = _cells.cell_id(ix, iy)
        cx0, cy0 = ix * cell_size, iy * cell_size
        ox = (np.minimum(x1[idx], cx0 + cell_size)
              - np.maximum(x0[idx], cx0))
        oy = (np.minimum(y1[idx], cy0 + cell_size)
              - np.maximum(y0[idx], cy0))
        area = ox * oy
        keep = area > 0.0
        full = (x1 - x0) * (y1 - y0)
        return pa.table({
            key_col: batch.column(key_col).take(pa.array(idx[keep])),
            "cell": pa.array(cell[keep]),
            "overlap_area": pa.array(np.round(area[keep], 6)),
            "frac": pa.array(np.round(area[keep] / full[idx][keep], 6)),
        })

    return rects.map_batches(explode, batch_format="pyarrow",
                             zero_copy_batch=True)


#: zonal-median micro-unit quantization (values quantize BEFORE the
#: median so even-count interpolation (a+b)/2 is exact on both engines)
MEDIAN_Q = 1_000_000.0


class ZonalMedianLocal:
    """map_batches actor: per-PoI MEDIAN of the clamped raster values
    in the ``radius`` disk (the percentile sibling of
    :class:`ZonalStatsLocal` — SURVEY M14's aggregate family).

    Pixels quantize to int64 micro-units first (``floor(max(v,0)·1e6
    + 0.5)``, the oracle's identical double expression over the exact
    pixel table), so ``np.median`` over ints equals SQL
    ``quantile_cont(vq, 0.5)`` bit-for-bit: odd counts pick the same
    int, even counts average two ints ≤ 2^52 — exact in float64 either
    way.  One halo'd window fetch per point; per-point work is one
    vectorized mask + partition."""

    def __init__(self, tile_root: str, band: str, radius: float,
                 key_col: str = "doc_id", cache_tiles: int = 256):
        self.store = TileStore(tile_root, capacity=cache_tiles)
        self.band = band
        self.radius = float(radius)
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources import synth

        res = synth.RASTER_RES
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        r = self.radius
        med = np.empty(len(x))
        npx = np.empty(len(x), dtype=np.int64)
        for i in range(len(x)):
            c0 = int(np.floor((x[i] - r) / res))
            c1 = int(np.floor((x[i] + r) / res))
            r0 = int(np.floor((y[i] - r) / res))
            r1 = int(np.floor((y[i] + r) / res))
            win = self.store.window(self.band, r0, c0,
                                    r1 - r0 + 1, c1 - c0 + 1, fill=np.nan)
            cx = (np.arange(c0, c1 + 1) * res + res / 2.0)[None, :]
            cy = (np.arange(r0, r1 + 1) * res + res / 2.0)[:, None]
            inside = ((cx - x[i]) * (cx - x[i])
                      + (cy - y[i]) * (cy - y[i]) <= r * r)
            v = win[inside & np.isfinite(win)]
            vq = np.floor(np.maximum(v, 0.0) * MEDIAN_Q + 0.5) \
                .astype(np.int64)
            npx[i] = len(vq)
            med[i] = np.median(vq) if len(vq) else np.nan
        return pa.table({
            self.key_col: batch.column(self.key_col),
            "median_q": pa.array(med, pa.float64(),
                                 mask=(npx == 0)),
            "n_pix": pa.array(npx),
        })
