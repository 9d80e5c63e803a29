"""Geostatistical stages: IDW interpolation and great-circle kNN.

Two classic per-point exposure operators the reference's availability /
accessibility pillars imply but never ship as standalone stages:

* **Inverse-distance-weighted interpolation** — estimate a field value
  at every PoI from a small set of irregular sample stations (the
  standard fallback when no raster covers an AoI; see e.g. the zonal
  path `/root/reference/GreenExp/availability.py:90-140` which assumes a
  gridded NDVI — IDW is what you do when you only have station
  measurements).  Physical plan: the station table is tiny → broadcast
  once with ``ray.put``; each batch computes an ``(n_points, n_station)``
  squared-distance matrix in one numpy shot.  No shuffle.

* **Great-circle (haversine) nearest-facility** — the geodesic twin of
  ``stages/access.NearestGreenspace`` (accessibility.py:277-320) for
  lon/lat inputs where a euclidean planar distance is wrong.  Same
  broadcast-small-side plan.

Cross-engine determinism (the DuckDB gate hashes values):

* IDW uses smoothed power-2 weights ``w = 1/(d² + 1)`` — no ``pow``/
  ``sqrt`` in the weight, only +,*,/ which are IEEE-exact in both
  engines — and **integer-quantized partial sums**: each term is
  rounded to a fixed grid (``round(w * 1e12)`` / ``round(w*v * 1e9)``)
  and summed as int64, so summation order cannot change the result.
* haversine ranks candidates by ``round(d_km, 6), facility_id`` so a
  last-ulp libm difference between numpy and DuckDB cannot flip the
  argmin unless two stations are within a millimetre of equidistant.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

#: integer quantization grids for the order-independent IDW sums
IDW_DEN_Q = 1e12
IDW_NUM_Q = 1e9
EARTH_R_KM = 6371.0


def _resolve(ref):
    return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref


class IDWInterpolator:
    """map_batches actor: smoothed power-2 IDW from broadcast stations.

    ``stations_ref``: (ObjectRef of) a pyarrow Table with columns
    ``sx, sy, val``.  Appends per input point:

    * ``n_within`` — stations with ``d² <= radius²``;
    * ``idw`` — ``round(Σ w·v / Σ w, 6)`` over those stations with
      ``w = 1/(d² + 1)``, computed through the int64-quantized sums
      described in the module docstring (NULL when ``n_within == 0``).
    """

    def __init__(self, stations_ref, radius: float,
                 x_col: str = "x", y_col: str = "y",
                 dense_max: int = 4096):
        t = _resolve(stations_ref)
        self.sx = t.column("sx").to_numpy(zero_copy_only=False).astype(np.float64)
        self.sy = t.column("sy").to_numpy(zero_copy_only=False).astype(np.float64)
        self.val = t.column("val").to_numpy(zero_copy_only=False).astype(np.float64)
        self.radius = float(radius)
        self.r2 = float(radius) * float(radius)
        self.x_col, self.y_col = x_col, y_col
        # above dense_max stations, gather candidates from a uniform
        # grid instead of the (batch x S) dense matrices; per-pair
        # arithmetic is identical and all sums are int64, so the two
        # paths are bit-equal (same pattern as stages/access.py)
        self.grid = None
        if len(self.sx) > dense_max:
            from ..state.index import GridIndex
            self.grid = GridIndex(self.sx, self.sy,
                                  cell_size=max(self.radius, 1e-9))

    def _terms(self, x, y, ssel):
        """(within, den_t, num_t) for points x,y against the station
        subset ``ssel`` — the one shared arithmetic of both paths."""
        dx = x[:, None] - self.sx[ssel][None, :]
        dy = y[:, None] - self.sy[ssel][None, :]
        d2 = dx * dx + dy * dy
        within = d2 <= self.r2
        w = 1.0 / (d2 + 1.0)
        # int64-quantized terms -> order-independent exact sums
        den_t = np.where(within, np.round(w * IDW_DEN_Q), 0.0).astype(np.int64)
        num_t = np.where(within,
                         np.round(w * self.val[ssel][None, :] * IDW_NUM_Q),
                         0.0).astype(np.int64)
        return within, den_t, num_t

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch.column(self.x_col).to_numpy(zero_copy_only=False)
        y = batch.column(self.y_col).to_numpy(zero_copy_only=False)
        if self.grid is None:
            within, den_t, num_t = self._terms(x, y, slice(None))
            den = den_t.sum(axis=1)
            num = num_t.sum(axis=1)
            n_within = within.sum(axis=1).astype(np.int64)
        else:
            den = np.zeros(len(x), dtype=np.int64)
            num = np.zeros(len(x), dtype=np.int64)
            n_within = np.zeros(len(x), dtype=np.int64)
            for sel, cand in self.grid.candidate_groups(x, y, self.radius):
                within, den_t, num_t = self._terms(x[sel], y[sel], cand)
                den[sel] = den_t.sum(axis=1)
                num[sel] = num_t.sum(axis=1)
                n_within[sel] = within.sum(axis=1).astype(np.int64)
        safe_den = np.where(den > 0, den, 1)
        # num/den = (num/1e9)/(den/1e12) = num * 1e3 / den
        idw = np.round(num * (IDW_DEN_Q / IDW_NUM_Q) / safe_den, 6)
        idw_arr = pa.array(idw, pa.float64(),
                           mask=(n_within == 0))
        return (batch.append_column("n_within", pa.array(n_within))
                .append_column("idw", idw_arr))


def haversine_km(lon1, lat1, lon2, lat2):
    """Great-circle distance in km (vectorized, broadcasting inputs).

    Formula written to match the SQL oracle term-for-term:
    ``2R · asin(sqrt(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2)))``.
    """
    p1 = np.radians(lat1)
    p2 = np.radians(lat2)
    dphi = np.radians(lat2 - lat1) / 2.0
    dlam = np.radians(lon2 - lon1) / 2.0
    a = np.sin(dphi) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlam) ** 2
    return 2.0 * EARTH_R_KM * np.arcsin(np.sqrt(np.minimum(a, 1.0)))


class HaversineNearest:
    """map_batches actor: nearest broadcast facility by great-circle km.

    ``facilities_ref``: (ObjectRef of) a pyarrow Table with columns
    ``fid, flon, flat``.  Appends ``fid`` (nearest facility id, ties by
    smaller id on the round-6 distance) and ``dist_km`` (round 3).
    """

    def __init__(self, facilities_ref, lon_col: str = "lon",
                 lat_col: str = "lat", dense_max: int = 4096,
                 grid_cell_deg: float = 0.5):
        t = _resolve(facilities_ref)
        self.fid = t.column("fid").to_numpy(zero_copy_only=False).astype(np.int64)
        self.flon = t.column("flon").to_numpy(zero_copy_only=False).astype(np.float64)
        self.flat = t.column("flat").to_numpy(zero_copy_only=False).astype(np.float64)
        # ties on the quantized distance break by ascending fid: presort
        order = np.argsort(self.fid, kind="stable")
        self.fid = self.fid[order]
        self.flon = self.flon[order]
        self.flat = self.flat[order]
        self.lon_col, self.lat_col = lon_col, lat_col
        # scale path: degree-space grid + ring expansion.  Partitioning
        # assumptions (documented): lon in [-180, 180] with no
        # antimeridian-wrapping neighbour pairs, |lat| < 89.9.  The
        # ring lower bound uses 111.0 km/deg * cos(max |lat|), safe for
        # both lat- and lon-separated cells.
        self.grid = None
        if len(self.fid) > dense_max:
            from ..state.index import GridIndex
            self.cs_deg = float(grid_cell_deg)
            self.grid = GridIndex(self.flon, self.flat,
                                  cell_size=self.cs_deg)
            self.cos_lat_max = np.cos(np.radians(
                min(89.9, float(np.abs(self.flat).max(initial=0.0)))))

    def _dense(self, lon, lat):
        d = haversine_km(lon[:, None], lat[:, None],
                         self.flon[None, :], self.flat[None, :])
        dq = np.round(d, 6)
        # argmin on the quantized distance; fids ascending -> first min
        # is the smallest fid among round-6 ties (matches the SQL
        # row_number ORDER BY round(d,6), fid)
        idx = np.argmin(dq, axis=1)
        rows = np.arange(len(idx))
        return self.fid[idx], d[rows, idx]

    def _grid_nearest(self, lon, lat):
        """Ring-expanding exact nearest by great-circle distance: the
        grid only prunes (conservative km lower bound per unexplored
        ring, including a 2e-6 slack for the round-6 tie rule); the
        metric and (dq, fid) ordering are identical to the dense
        path."""
        g = self.grid
        n = len(lon)
        best_dq = np.full(n, np.inf)
        best_draw = np.full(n, np.inf)
        best_fid = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        qix = np.floor(lon / self.cs_deg).astype(np.int64)
        qiy = np.floor(lat / self.cs_deg).astype(np.int64)
        gkey = qix * (1 << 32) + qiy
        order = np.argsort(gkey, kind="stable")
        uq, starts = np.unique(gkey[order], return_index=True)
        bounds = np.concatenate([starts, [n]])
        for gidx in range(len(uq)):
            sel = order[bounds[gidx]:bounds[gidx + 1]]
            bix, biy = int(qix[sel[0]]), int(qiy[sel[0]])
            glon, glat = lon[sel], lat[sel]
            bdq = best_dq[sel]
            bdr = best_draw[sel]
            bfid = best_fid[sel]
            ring_cap = max(
                2,
                max(abs(bix - g._ix_lo), abs(bix - g._ix_hi)),
                max(abs(biy - g._iy_lo), abs(biy - g._iy_hi)),
            )
            ring = g._ring_start(bix, biy)
            while True:
                cand = g._ring_indices(bix, biy, ring)
                if len(cand):
                    cand = np.sort(cand)  # fid-sorted arrays -> fid asc
                    d = haversine_km(glon[:, None], glat[:, None],
                                     self.flon[cand][None, :],
                                     self.flat[cand][None, :])
                    dq = np.round(d, 6)
                    j = np.argmin(dq, axis=1)  # first min = lowest fid
                    rows = np.arange(len(sel))
                    cdq = dq[rows, j]
                    cfid = self.fid[cand[j]]
                    upd = (cdq < bdq) | ((cdq == bdq) & (cfid < bfid))
                    bdq[upd] = cdq[upd]
                    bdr[upd] = d[rows, j][upd]
                    bfid[upd] = cfid[upd]
                # cells beyond this ring are >= ring*cs degrees away in
                # lat or lon; 2R·cos(lat_max)·sin(sep/2) lower-bounds
                # the great-circle distance for BOTH separations (exact
                # chord bound — a linear km/deg would overshoot at wide
                # angles), with tie slack for round-6 ties
                sep = np.radians(min(ring * self.cs_deg, 180.0))
                lower_next = (2.0 * EARTH_R_KM * self.cos_lat_max
                              * np.sin(sep / 2.0))
                done = np.isfinite(bdq) & (bdq + 2e-6 <= lower_next)
                if done.all() or ring > ring_cap + 1:
                    break
                ring += 1
            best_dq[sel] = bdq
            best_draw[sel] = bdr
            best_fid[sel] = bfid
        return best_fid, best_draw

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column(self.lon_col).to_numpy(zero_copy_only=False)
        lat = batch.column(self.lat_col).to_numpy(zero_copy_only=False)
        if self.grid is None:
            fid, draw = self._dense(lon, lat)
        else:
            fid, draw = self._grid_nearest(lon, lat)
        return (batch.append_column("fid", pa.array(fid))
                .append_column("dist_km",
                               pa.array(np.round(draw, 3),
                                        pa.float64())))


#: KDE weight quantization grid (int64 nano-weights)
KDE_Q = 1e9


class KDEPartial:
    """map_batches stage: per-batch partial Gaussian kernel density.

    Each point spreads ``w = exp(-d2 / denom)`` (``denom = 2σ²``, a
    precomputed literal so both engines divide by the identical double)
    onto every grid cell whose CENTER lies within ``radius``; weights
    quantize to int64 nano-weights so the downstream groupby sum is
    order-independent.  The batch collapses to distinct touched cells
    before the shuffle (classic partial-aggregate: shuffle payload is
    O(touched cells), not O(points × kernel width²)).

    Emits ``(ix, iy, n_contrib, density_q)`` partials; finish with
    ``groupby(['ix','iy']).sum`` — see :func:`kde_grid`.
    """

    def __init__(self, cell_size: float, sigma: float, radius: float,
                 nx: int, ny: int, x_col: str = "x", y_col: str = "y"):
        self.cs = float(cell_size)
        self.denom = 2.0 * float(sigma) * float(sigma)
        self.r = float(radius)
        self.nx, self.ny = int(nx), int(ny)
        self.x_col, self.y_col = x_col, y_col
        k = int(np.floor(self.r / self.cs)) + 1
        self.offs = np.arange(-k, k + 1, dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch.column(self.x_col).to_numpy(zero_copy_only=False)
        y = batch.column(self.y_col).to_numpy(zero_copy_only=False)
        n = len(x)
        base_ix = np.floor(x / self.cs).astype(np.int64)
        base_iy = np.floor(y / self.cs).astype(np.int64)
        # (n, k, k) neighborhood of candidate cells per point
        ix = base_ix[:, None, None] + self.offs[None, :, None]
        iy = base_iy[:, None, None] + self.offs[None, None, :]
        cx = ix * self.cs + self.cs / 2.0
        cy = iy * self.cs + self.cs / 2.0
        dx = cx - x[:, None, None]
        dy = cy - y[:, None, None]
        d2 = dx * dx + dy * dy
        ok = ((d2 <= self.r * self.r) & (ix >= 0) & (ix < self.nx)
              & (iy >= 0) & (iy < self.ny))
        ixb = np.broadcast_to(ix, d2.shape)
        iyb = np.broadcast_to(iy, d2.shape)
        q = np.round(np.exp(-d2[ok] / self.denom) * KDE_Q).astype(np.int64)
        key = ixb[ok] * self.ny + iyb[ok]
        uk, inv = np.unique(key, return_inverse=True)
        dens = np.zeros(len(uk), dtype=np.int64)
        cnt = np.zeros(len(uk), dtype=np.int64)
        np.add.at(dens, inv, q)
        np.add.at(cnt, inv, 1)
        return pa.table({
            "ix": pa.array(uk // self.ny), "iy": pa.array(uk % self.ny),
            "n_contrib": pa.array(cnt), "density_q": pa.array(dens),
        })


def kde_grid(ds: "ray.data.Dataset", cell_size: float, sigma: float,
             radius: float, nx: int, ny: int,
             x_col: str = "x", y_col: str = "y") -> "ray.data.Dataset":
    """Gaussian heatmap over an ``nx × ny`` grid: per-batch partial
    densities → one O(touched-cells) groupby sum."""
    from ray.data.aggregate import Sum

    part = ds.map_batches(
        KDEPartial(cell_size, sigma, radius, nx, ny, x_col, y_col),
        batch_format="pyarrow", zero_copy_batch=True)
    out = part.groupby(["ix", "iy"]).aggregate(
        Sum("n_contrib", alias_name="n_contrib"),
        Sum("density_q", alias_name="density_q"))
    return out


def hex_axial(x: np.ndarray, y: np.ndarray,
              size: float) -> tuple[np.ndarray, np.ndarray]:
    """Pointy-top axial hex coordinates (Red Blob Games' public
    pixel→hex formula: fractional axial transform + cube rounding).
    Every arithmetic step mirrors the SQL oracle's expression tree
    token for token — only IEEE +,-,*,/,sqrt,floor,abs — so the bin
    ids are bit-identical across engines."""
    c = np.sqrt(3.0) / 3.0
    q = (c * x - y / 3.0) / size
    r = (y * (2.0 / 3.0)) / size
    s = -q - r
    rq = np.floor(q + 0.5)
    rr = np.floor(r + 0.5)
    rs = np.floor(s + 0.5)
    dq = np.abs(rq - q)
    dr = np.abs(rr - r)
    ds_ = np.abs(rs - s)
    fix_q = (dq > ds_) & (dq > dr)
    fix_r = (~fix_q) & (dr > ds_)
    hq = np.where(fix_q, -rr - rs, rq).astype(np.int64)
    hr = np.where(fix_r, -rq - rs, rr).astype(np.int64)
    return hq, hr


def hexbin(ds: "ray.data.Dataset", size: float, x_col: str = "x",
           y_col: str = "y") -> "ray.data.Dataset":
    """Hexagonal binning: one output row per touched hex with the
    point count — the hex partition key a density map / spatial
    shuffle uses where squares alias along diagonals.

    Scale shape: per-batch partial counts collapse each batch to its
    distinct hexes (encoded as one int64) before the groupby, so the
    shuffle payload is O(#touched hexes), not O(#points)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False)
        y = batch.column(y_col).to_numpy(zero_copy_only=False)
        hq, hr = hex_axial(x, y, size)
        enc = (hq << np.int64(32)) + (hr & np.int64(0xFFFFFFFF))
        uk, cnt = np.unique(enc, return_counts=True)
        return pa.table({"hex": pa.array(uk),
                         "n": pa.array(cnt.astype(np.int64))})

    def decode(batch: pa.Table) -> pa.Table:
        enc = batch.column("hex").to_numpy(zero_copy_only=False)
        hq = enc >> np.int64(32)
        lo = enc & np.int64(0xFFFFFFFF)
        hr = np.where(lo >= np.int64(1) << np.int64(31),
                      lo - (np.int64(1) << np.int64(32)), lo)
        return pa.table({"hq": pa.array(hq), "hr": pa.array(hr),
                         "n": batch.column("n")})

    part = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
    agg = part.groupby("hex").aggregate(Sum("n", alias_name="n"))
    return agg.map_batches(decode, batch_format="pyarrow",
                           zero_copy_batch=True)


def hex_kring(ds: "ray.data.Dataset", size: float, x_col: str = "x",
              y_col: str = "y") -> "ray.data.Dataset":
    """K-ring (k=1) neighborhood aggregation on the hex lattice — the
    H3-style density smooth: per occupied hex, its own count plus the
    counts of its 6 axial neighbors (ring_n), and how many of those
    neighbors are occupied (n_nbr).  The shuffle shape mirrors
    :func:`local_morans_i`'s queen window on squares: per-batch hex
    partials, each occupied hex EMITS its count to itself and its 6
    axial-offset neighbors, one groupby — O(7·touched hexes) shuffle
    payload, never the points.  Only occupied hexes appear in the
    output (the emission join is inner on the occupied set)."""
    from ray.data.aggregate import Sum

    from ..functions.joins import bucket_join_attach

    #: pointy-top axial k=1 ring offsets (public hex-grid geometry)
    OFFS = ((0, 0), (1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1))

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False)
        y = batch.column(y_col).to_numpy(zero_copy_only=False)
        hq, hr = hex_axial(x, y, size)
        enc = (hq << np.int64(32)) + (hr & np.int64(0xFFFFFFFF))
        uk, cnt = np.unique(enc, return_counts=True)
        return pa.table({"hex": pa.array(uk),
                         "n": pa.array(cnt.astype(np.int64))})

    part = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
    counts = part.groupby("hex").aggregate(Sum("n", alias_name="n"))                  .materialize()

    def emit(batch: pa.Table) -> pa.Table:
        enc = batch.column("hex").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        hq = enc >> np.int64(32)
        lo = enc & np.int64(0xFFFFFFFF)
        hr = np.where(lo >= np.int64(1) << np.int64(31),
                      lo - (np.int64(1) << np.int64(32)), lo)
        outs, vals, occ = [], [], []
        for dq, dr in ((0, 0), (1, 0), (1, -1), (0, -1), (-1, 0),
                       (-1, 1), (0, 1)):
            outs.append(((hq + dq) << np.int64(32))
                        + ((hr + dr) & np.int64(0xFFFFFFFF)))
            vals.append(n)
            occ.append(np.full(len(n), 0 if (dq, dr) == (0, 0) else 1,
                               np.int64))
        return pa.table({"hex": pa.array(np.concatenate(outs)),
                         "ring_n": pa.array(np.concatenate(vals)),
                         "n_nbr": pa.array(np.concatenate(occ))})

    ring = (counts.map_batches(emit, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("hex").aggregate(Sum("ring_n", alias_name="ring_n"),
                                      Sum("n_nbr", alias_name="n_nbr")))
    joined = bucket_join_attach(counts, ring, key="hex")

    def decode(batch: pa.Table) -> pa.Table:
        enc = batch.column("hex").to_numpy(zero_copy_only=False)
        hq = enc >> np.int64(32)
        lo = enc & np.int64(0xFFFFFFFF)
        hr = np.where(lo >= np.int64(1) << np.int64(31),
                      lo - (np.int64(1) << np.int64(32)), lo)
        return pa.table({"hq": pa.array(hq), "hr": pa.array(hr),
                         "n": batch.column("n"),
                         "ring_n": batch.column("ring_n"),
                         "n_nbr": batch.column("n_nbr")})

    return joined.map_batches(decode, batch_format="pyarrow",
                              zero_copy_batch=True)


def tile_pyramid(ds: "ray.data.Dataset", base_cell: float, levels: int = 3,
                 x_col: str = "x", y_col: str = "y") -> "ray.data.Dataset":
    """Multi-zoom tile-count pyramid: point counts per cell at
    ``levels`` zooms, each zoom doubling the cell size (the
    pre-aggregation a map renderer / density service reads instead of
    rescanning points).

    Zoom ``levels-1`` is the finest (cell = ``base_cell``); each parent
    cell id is the child's ``>> 1``.  One batch pass emits partial
    counts for EVERY zoom (child batch collapses 4:1 per level up), so
    a single groupby ships O(touched cells × 4/3) rows total — one
    shuffle for the whole pyramid, not one per level."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False)
        y = batch.column(y_col).to_numpy(zero_copy_only=False)
        cx = np.floor(x / base_cell).astype(np.int64)
        cy = np.floor(y / base_cell).astype(np.int64)
        zs, xs, ys, ns = [], [], [], []
        for z in range(levels - 1, -1, -1):
            # sign-safe pack/unpack (negative cells west/south of the
            # origin survive the round trip — same scheme as hexbin)
            enc = (cx << np.int64(32)) + (cy & np.int64(0xFFFFFFFF))
            uk, cnt = np.unique(enc, return_counts=True)
            lo = uk & np.int64(0xFFFFFFFF)
            zs.append(np.full(len(uk), z, dtype=np.int64))
            xs.append(uk >> np.int64(32))
            ys.append(np.where(lo >= np.int64(1) << np.int64(31),
                               lo - (np.int64(1) << np.int64(32)), lo))
            ns.append(cnt.astype(np.int64))
            # arithmetic >> floors toward -inf — exactly floor(c/2),
            # matching the SQL parent derivation for negative cells too
            cx, cy = cx >> 1, cy >> 1
        return pa.table({"zoom": pa.array(np.concatenate(zs)),
                         "cx": pa.array(np.concatenate(xs)),
                         "cy": pa.array(np.concatenate(ys)),
                         "n": pa.array(np.concatenate(ns))})

    part = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
    return part.groupby(["zoom", "cx", "cy"]).aggregate(
        Sum("n", alias_name="n"))


def morans_i(ds: "ray.data.Dataset", cell_size: float,
             x_col: str = "x", y_col: str = "y") -> "ray.data.Dataset":
    """Global Moran's I spatial autocorrelation of the point-density
    surface: bin points to a square grid, value = count per occupied
    cell, weights = rook adjacency (w=1 for occupied cells sharing an
    edge).  The canonical "is this clustered or random" diagnostic a
    geospatial QA pass runs before trusting a density model.

    Exactness: with integer cell counts x_i, let n = #cells and
    S = Σx_i; the *n-scaled* centered value z_i = n·x_i − S is an exact
    int64, and

        I = n·Σ_ij w_ij z_i z_j / (W · Σ_i z_i²)

    equals the textbook (n/W)·Σw(x−x̄)(x−x̄)/Σ(x−x̄)² because the n²
    factors cancel.  Every sum is an exact int64; the single closed-form
    double division is replayed token-for-token by the SQL oracle.

    Scale shape: per-batch partial counts → groupby(ix,iy) over
    O(touched cells); neighbor sums via a 4-way key-shifted emission +
    one more O(cells) groupby + a bucket hash-join back — never a
    driver-side O(cells²) pass.  Returns ONE row:
    (n_cells, w_pairs, moran_i).
    """
    from ray.data.aggregate import Count, Sum

    from ..functions.joins import bucket_join_attach

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False)
        y = batch.column(y_col).to_numpy(zero_copy_only=False)
        cx = np.floor(x / cell_size).astype(np.int64)
        cy = np.floor(y / cell_size).astype(np.int64)
        enc = (cx << np.int64(32)) + (cy & np.int64(0xFFFFFFFF))
        uk, cnt = np.unique(enc, return_counts=True)
        return pa.table({"ck": pa.array(uk),
                         "n": pa.array(cnt.astype(np.int64))})

    cellcnt = (ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
               .groupby("ck").aggregate(Sum("n", alias_name="n"))
               .materialize())  # O(occupied cells) — small vs points

    g = cellcnt.aggregate(Count(), Sum("n", alias_name="s"))
    ncells = int(g["count()"])
    s_total = int(g["s"])

    def with_z(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        return pa.table({"ck": batch.column("ck"),
                         "z": ncells * n - s_total})

    z = cellcnt.map_batches(with_z, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    ss = int(z.map_batches(
        lambda b: pa.table({"zz": b.column("z").to_numpy(
            zero_copy_only=False) ** 2}),
        batch_format="pyarrow", zero_copy_batch=True,
    ).aggregate(Sum("zz", alias_name="zz"))["zz"])

    def emit_neighbors(batch: pa.Table) -> pa.Table:
        ck = batch.column("ck").to_numpy(zero_copy_only=False)
        zz = batch.column("z").to_numpy(zero_copy_only=False)
        # decode, shift by the 4 rook offsets, re-encode
        cx = ck >> np.int64(32)
        lo = ck & np.int64(0xFFFFFFFF)
        cy = np.where(lo >= np.int64(1) << np.int64(31),
                      lo - (np.int64(1) << np.int64(32)), lo)
        outs, vals = [], []
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            outs.append(((cx + dx) << np.int64(32))
                        + ((cy + dy) & np.int64(0xFFFFFFFF)))
            vals.append(zz)
        return pa.table({"ck": pa.array(np.concatenate(outs)),
                         "zn": pa.array(np.concatenate(vals)),
                         "w": pa.array(np.ones(4 * len(ck), np.int64))})

    nbr = (z.map_batches(emit_neighbors, batch_format="pyarrow",
                         zero_copy_batch=True)
           .groupby("ck").aggregate(Sum("zn", alias_name="zn"),
                                    Sum("w", alias_name="w")))
    # inner join: emissions landing on unoccupied cells drop out, which
    # is exactly the w_ij = 0 case
    joined = bucket_join_attach(z, nbr, key="ck")

    def cross_part(batch: pa.Table) -> pa.Table:
        zv = batch.column("z").to_numpy(zero_copy_only=False)
        zn = batch.column("zn").to_numpy(zero_copy_only=False)
        w = batch.column("w").to_numpy(zero_copy_only=False)
        return pa.table({"cross": pa.array([int((zv * zn).sum())]),
                         "w": pa.array([int(w.sum())])})

    tot = joined.map_batches(cross_part, batch_format="pyarrow",
                             zero_copy_batch=True).aggregate(
        Sum("cross", alias_name="cross"), Sum("w", alias_name="w"))
    cross = int(tot["cross"])
    w_pairs = int(tot["w"])
    moran = (np.float64(ncells) * np.float64(cross)) / (
        np.float64(w_pairs) * np.float64(ss))
    import ray.data as _rd
    return _rd.from_arrow(pa.table({
        "n_cells": pa.array([ncells], pa.int64()),
        "w_pairs": pa.array([w_pairs], pa.int64()),
        "moran_i": pa.array([float(moran)], pa.float64()),
    }))


def getis_ord_gi_star(ds: "ray.data.Dataset", cell_size: float,
                      x_col: str = "x",
                      y_col: str = "y") -> "ray.data.Dataset":
    """Getis–Ord Gi* hot-spot statistic of the point-density surface:
    bin points to a square grid (value = count per occupied cell),
    weights = queen contiguity INCLUDING self (w_ij = 1 for the 3×3
    window, the * variant), one z-score per occupied cell — the
    standard "where are the statistically hot cells" companion to the
    global Moran's I above.

    Exactness (same discipline as :func:`morans_i`): with integer
    counts x, n = #occupied cells, Sx = Σx, Sxx = Σx², per cell let
    NX_i = Σ_j w_ij x_j and W_i = Σ_j w_ij (both exact int64).  The
    textbook Gi* = (NX − x̄W) / (S·sqrt((nW − W²)/(n−1))) multiplied
    through by n gives

        Gi* = (n·NX − Sx·W) / sqrt((n·Sxx − Sx²) · (n·W − W²) / (n−1))

    — every operand an exact int64, ONE closed-form double expression
    replayed token-for-token by the SQL oracle.

    Scale shape: per-batch partial counts → one O(occupied-cells)
    groupby; the 3×3 neighbor sums are a 9-way key-shifted emission +
    a second O(cells) groupby + a bucket hash-join back (emissions
    landing on unoccupied cells drop out in the inner join — the
    w_ij = 0 case).  No driver-side O(cells²) pass."""
    from ray.data.aggregate import Count, Sum

    from ..functions.joins import bucket_join_attach

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False)
        y = batch.column(y_col).to_numpy(zero_copy_only=False)
        cx = np.floor(x / cell_size).astype(np.int64)
        cy = np.floor(y / cell_size).astype(np.int64)
        enc = (cx << np.int64(32)) + (cy & np.int64(0xFFFFFFFF))
        uk, cnt = np.unique(enc, return_counts=True)
        return pa.table({"ck": pa.array(uk),
                         "n": pa.array(cnt.astype(np.int64))})

    cellcnt = (ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
               .groupby("ck").aggregate(Sum("n", alias_name="n"))
               .materialize())  # O(occupied cells) — small vs points

    g = cellcnt.aggregate(Count(), Sum("n", alias_name="s"))
    ncells = int(g["count()"])
    s_total = int(g["s"])
    if ncells < 2:
        raise ValueError("Gi* needs at least 2 occupied cells")
    sxx = int(cellcnt.map_batches(
        lambda b: pa.table({"xx": b.column("n").to_numpy(
            zero_copy_only=False).astype(np.int64) ** 2}),
        batch_format="pyarrow", zero_copy_batch=True,
    ).aggregate(Sum("xx", alias_name="xx"))["xx"])

    def emit_window(batch: pa.Table) -> pa.Table:
        ck = batch.column("ck").to_numpy(zero_copy_only=False)
        xv = batch.column("n").to_numpy(zero_copy_only=False)
        cx = ck >> np.int64(32)
        lo = ck & np.int64(0xFFFFFFFF)
        cy = np.where(lo >= np.int64(1) << np.int64(31),
                      lo - (np.int64(1) << np.int64(32)), lo)
        outs, vals = [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                outs.append(((cx + dx) << np.int64(32))
                            + ((cy + dy) & np.int64(0xFFFFFFFF)))
                vals.append(xv)
        return pa.table({"ck": pa.array(np.concatenate(outs)),
                         "nx": pa.array(np.concatenate(vals)),
                         "w": pa.array(np.ones(9 * len(ck), np.int64))})

    nbr = (cellcnt.map_batches(emit_window, batch_format="pyarrow",
                               zero_copy_batch=True)
           .groupby("ck").aggregate(Sum("nx", alias_name="nx"),
                                    Sum("w", alias_name="w")))
    joined = bucket_join_attach(cellcnt, nbr, key="ck")
    b_var = float(ncells * sxx - s_total * s_total)
    if b_var == 0.0:
        # uniform density: sqrt(0)/0 divergence between numpy (±inf/
        # NaN) and the SQL oracle (NULL) — refuse on both sides
        raise ValueError("Gi* undefined: zero variance "
                         "(all occupied cells have equal counts)")
    nm1 = float(ncells - 1)

    def score(batch: pa.Table) -> pa.Table:
        ck = batch.column("ck").to_numpy(zero_copy_only=False)
        nx = batch.column("nx").to_numpy(zero_copy_only=False)
        w = batch.column("w").to_numpy(zero_copy_only=False)
        a = (ncells * nx - s_total * w).astype(np.float64)
        c = (ncells * w - w * w).astype(np.float64)
        gi = a / np.sqrt(b_var * c / nm1)
        cx = ck >> np.int64(32)
        lo = ck & np.int64(0xFFFFFFFF)
        cy = np.where(lo >= np.int64(1) << np.int64(31),
                      lo - (np.int64(1) << np.int64(32)), lo)
        return pa.table({"ix": pa.array(cx), "iy": pa.array(cy),
                         "n_nbr": batch.column("w"),
                         "gi_star": pa.array(gi)})

    return joined.map_batches(score, batch_format="pyarrow",
                              zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Per-group convex hull
# ---------------------------------------------------------------------------

def _hull_points(x: np.ndarray, y: np.ndarray):
    """Monotone-chain convex hull over distinct INTEGER points, KEEPING
    collinear boundary points (pop only on strictly-right turns) — so
    the kept set is exactly the boundary-point set of the halfplane
    characterization the SQL oracle replays: p is on the hull iff some
    edge p→q has every other point on its left (cross >= 0).

    Integer coordinates make every orientation test EXACT (int64 cross
    products, |coord| ≤ 2e7 ⇒ |cross| ≤ 8e14 ≪ 2^63), which is what
    lets two independent hull algorithms (this chain, the oracle's
    all-pairs support test) agree on degenerate collinear triples —
    float crosses round ±1e-10 differently per expression tree and
    flip knife-edge keeps (observed on the hash-lattice world).

    Returns (hx, hy) of the hull point SET (unordered semantics)."""
    pts = np.unique(np.stack([x, y], axis=1), axis=0)
    n = len(pts)
    if n <= 2:
        return pts[:, 0], pts[:, 1]

    def chain(p):
        out = []
        for i in range(len(p)):
            while len(out) >= 2:
                ox, oy = p[out[-2]]
                ax, ay = p[out[-1]]
                bx, by = p[i]
                if (ax - ox) * (by - oy) - (ay - oy) * (bx - ox) < 0:
                    out.pop()
                else:
                    break
            out.append(i)
        return out

    lower = chain(pts)
    upper = chain(pts[::-1])
    keep = np.zeros(n, dtype=bool)
    keep[np.asarray(lower)] = True
    keep[n - 1 - np.asarray(upper)] = True
    return pts[keep, 0], pts[keep, 1]


def group_convex_hull(ds: "ray.data.Dataset", key_col: str = "cell",
                      x_col: str = "x", y_col: str = "y",
                      scale: float = 1000.0,
                      num_buckets: int = 32) -> "ray.data.Dataset":
    """Convex hull vertex set per group, over ``floor(coord * scale)``
    integer micro-unit coordinates (exact orientation tests — see
    :func:`_hull_points`).  Output columns ``xq``/``yq`` are the
    quantized int64 coordinates.

    Scale shape: ``hull(A ∪ B) = hull(hull(A) ∪ hull(B))``, so each
    batch collapses every group to its LOCAL hull before the shuffle —
    the payload per (group, batch) is O(hull size), not O(points) —
    then a hash-bucketed ``map_groups`` computes the final hull per
    group.  Collinear boundary points are kept (see
    :func:`_hull_points`), so partial hulls are supersets of the final
    hull's support and the two-level combine is exact."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        x = np.floor(batch.column(x_col).to_numpy(zero_copy_only=False)
                     * scale).astype(np.int64)
        y = np.floor(batch.column(y_col).to_numpy(zero_copy_only=False)
                     * scale).astype(np.int64)
        order = np.argsort(k, kind="stable")
        k, x, y = k[order], x[order], y[order]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        ends = np.r_[starts[1:], len(k)]
        ko, xo, yo = [], [], []
        for s, e in zip(starts, ends):
            hx, hy = _hull_points(x[s:e], y[s:e])
            ko.append(np.full(len(hx), k[s]))
            xo.append(hx)
            yo.append(hy)
        return pa.table({
            key_col: pa.array(np.concatenate(ko) if ko else
                              np.empty(0, k.dtype)),
            "xq": pa.array(np.concatenate(xo) if xo else
                           np.empty(0, np.int64)),
            "yq": pa.array(np.concatenate(yo) if yo else
                           np.empty(0, np.int64)),
            "bucket": pa.array(
                (np.concatenate(ko).astype(np.int64) % num_buckets)
                if ko else np.empty(0, np.int64)),
        })

    def final(grp: pd.DataFrame) -> pd.DataFrame:
        out = []
        for key, g in grp.groupby(key_col, sort=False):
            hx, hy = _hull_points(g["xq"].to_numpy(),
                                  g["yq"].to_numpy())
            out.append(pd.DataFrame({
                key_col: np.full(len(hx), key),
                "xq": hx, "yq": hy,
            }))
        return (pd.concat(out, ignore_index=True) if out else
                pd.DataFrame({key_col: [], "xq": [], "yq": []}))

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bucket").map_groups(final, batch_format="pandas"))


# ---------------------------------------------------------------------------
# Ripley's K pair counts
# ---------------------------------------------------------------------------

def ripley_pair_counts(ds: "ray.data.Dataset", radii: list[float],
                       x_col: str = "x", y_col: str = "y",
                       num_cells: int | None = None) -> "ray.data.Dataset":
    """Global ordered-pair counts ``|{(i, j) : i ≠ j, d_ij <= r}|`` for
    each radius — the numerator of Ripley's K point-pattern statistic
    (``K(r) = A/n² · Σ_{i≠j} 1[d_ij <= r]``; the caller scales by area
    and n).

    Plan: PBSM over a grid of ``cell = max(radii)``: every point goes
    NATIVE to its own cell and GHOST to the 8 neighbors, so each
    ordered pair (i, j) with ``d <= max(radii)`` meets exactly once —
    in i's native cell.  The per-cell kernel is one vectorized
    (natives × all) distance matrix; per-cell count partials (integer)
    collapse through one tiny groupby.  A pathologically hot cell is
    O(m²) — cap density upstream (``sampling.cap_per_group``) when the
    pattern is spiked."""
    from ray.data.aggregate import Sum

    rmax = float(max(radii))
    r2s = [float(r) * float(r) for r in radii]

    def expand(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False)
        y = batch.column(y_col).to_numpy(zero_copy_only=False)
        cx = np.floor(x / rmax).astype(np.int64)
        cy = np.floor(y / rmax).astype(np.int64)
        xs, ys, cs, gs = [], [], [], []
        # bias both indices positive before packing — a raw pack would
        # alias (cx, -1) with (cx-1, 2^21 - 1)
        bias = np.int64(1 << 20)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                xs.append(x)
                ys.append(y)
                cs.append((cx + dx + bias) * (1 << 21) + (cy + dy + bias))
                gs.append(np.full(len(x), dx != 0 or dy != 0,
                                  dtype=bool))
        return pa.table({
            x_col: pa.array(np.concatenate(xs)),
            y_col: pa.array(np.concatenate(ys)),
            "cell": pa.array(np.concatenate(cs)),
            "ghost": pa.array(np.concatenate(gs)),
        })

    def kernel(grp) -> "pa.Table":
        import pandas as pd

        x = grp[x_col].to_numpy()
        y = grp[y_col].to_numpy()
        ghost = grp["ghost"].to_numpy()
        nat = np.flatnonzero(~ghost)
        if not len(nat):
            return pd.DataFrame({"r_ix": pd.Series([], dtype=np.int64),
                                 "n_pairs": pd.Series([], dtype=np.int64)})
        dx = x[nat][:, None] - x[None, :]
        dy = y[nat][:, None] - y[None, :]
        d2 = dx * dx + dy * dy
        # exclude self-pairs: a native row vs its own (native) column
        d2[np.arange(len(nat)), nat] = np.inf
        out = [(ix, int((d2 <= r2).sum())) for ix, r2 in enumerate(r2s)]
        return pd.DataFrame({"r_ix": [o[0] for o in out],
                             "n_pairs": [o[1] for o in out]})

    part = (ds.map_batches(expand, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("cell").map_groups(kernel, batch_format="pandas"))
    agg = part.groupby("r_ix").aggregate(Sum("n_pairs",
                                             alias_name="n_pairs"))

    def attach_r(batch: pa.Table) -> pa.Table:
        ix = batch.column("r_ix").to_numpy(zero_copy_only=False)
        return pa.table({
            "r": pa.array(np.asarray(radii, dtype=np.float64)[ix]),
            "n_pairs": batch.column("n_pairs"),
        })

    return agg.map_batches(attach_r, batch_format="pyarrow",
                           zero_copy_batch=True)


def local_morans_i(ds: "ray.data.Dataset", cell_size: float,
                   x_col: str = "x",
                   y_col: str = "y") -> "ray.data.Dataset":
    """Local Moran's I (LISA, Anselin 1995) of the point-density
    surface: per occupied grid cell,
    ``I_i = z_i · Σ_j w_ij z_j / m2`` with queen weights EXCLUDING
    self — the cluster/outlier companion to :func:`getis_ord_gi_star`
    (which includes self).

    Exactness: multiplying through by n² gives

        I_i = (n·x_i − Sx) · (n·NXᵉ_i − Sx·Wᵉ_i) / (n·Sxx − Sx²)

    with NXᵉ/Wᵉ the self-EXCLUDED neighbor sums — every operand exact
    int64, ONE closed-form double division replayed token-for-token in
    SQL.  Same physical plan as Gi*: O(cells) partial counts, 9-way
    key-shifted emission, bucket join; self-exclusion is a subtraction
    of the cell's own (x, 1) after the inclusive window sum."""
    from ray.data.aggregate import Count, Sum

    from ..functions.joins import bucket_join_attach

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False)
        y = batch.column(y_col).to_numpy(zero_copy_only=False)
        cx = np.floor(x / cell_size).astype(np.int64)
        cy = np.floor(y / cell_size).astype(np.int64)
        enc = (cx << np.int64(32)) + (cy & np.int64(0xFFFFFFFF))
        uk, cnt = np.unique(enc, return_counts=True)
        return pa.table({"ck": pa.array(uk),
                         "n": pa.array(cnt.astype(np.int64))})

    cellcnt = (ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
               .groupby("ck").aggregate(Sum("n", alias_name="n"))
               .materialize())

    g = cellcnt.aggregate(Count(), Sum("n", alias_name="s"))
    ncells = int(g["count()"])
    s_total = int(g["s"])
    if ncells < 2:
        raise ValueError("local Moran needs at least 2 occupied cells")
    sxx = int(cellcnt.map_batches(
        lambda b: pa.table({"xx": b.column("n").to_numpy(
            zero_copy_only=False).astype(np.int64) ** 2}),
        batch_format="pyarrow", zero_copy_batch=True,
    ).aggregate(Sum("xx", alias_name="xx"))["xx"])

    def emit_window(batch: pa.Table) -> pa.Table:
        ck = batch.column("ck").to_numpy(zero_copy_only=False)
        xv = batch.column("n").to_numpy(zero_copy_only=False)
        cx = ck >> np.int64(32)
        lo = ck & np.int64(0xFFFFFFFF)
        cy = np.where(lo >= np.int64(1) << np.int64(31),
                      lo - (np.int64(1) << np.int64(32)), lo)
        outs, vals = [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                outs.append(((cx + dx) << np.int64(32))
                            + ((cy + dy) & np.int64(0xFFFFFFFF)))
                vals.append(xv)
        return pa.table({"ck": pa.array(np.concatenate(outs)),
                         "nx": pa.array(np.concatenate(vals)),
                         "w": pa.array(np.ones(9 * len(ck), np.int64))})

    nbr = (cellcnt.map_batches(emit_window, batch_format="pyarrow",
                               zero_copy_batch=True)
           .groupby("ck").aggregate(Sum("nx", alias_name="nx"),
                                    Sum("w", alias_name="w")))
    joined = bucket_join_attach(cellcnt, nbr, key="ck")
    denom = float(ncells * sxx - s_total * s_total)
    if denom == 0.0:
        # uniform density: numpy would emit ±inf/NaN where the SQL
        # oracle's 0/0 yields NULL — refuse on both sides instead
        # (mirrors the ncells < 2 guard; ADVICE r4)
        raise ValueError("local Moran undefined: zero variance "
                         "(all occupied cells have equal counts)")

    def score(batch: pa.Table) -> pa.Table:
        ck = batch.column("ck").to_numpy(zero_copy_only=False)
        xi = batch.column("n").to_numpy(zero_copy_only=False)
        nx = batch.column("nx").to_numpy(zero_copy_only=False)
        w = batch.column("w").to_numpy(zero_copy_only=False)
        nx_ex = nx - xi
        w_ex = w - 1
        a = (ncells * xi - s_total).astype(np.float64)
        b = (ncells * nx_ex - s_total * w_ex).astype(np.float64)
        li = a * b / denom
        cx = ck >> np.int64(32)
        lo = ck & np.int64(0xFFFFFFFF)
        cy = np.where(lo >= np.int64(1) << np.int64(31),
                      lo - (np.int64(1) << np.int64(32)), lo)
        return pa.table({"ix": pa.array(cx), "iy": pa.array(cy),
                         "n_nbr": pa.array(w_ex.astype(np.int64)),
                         "local_i": pa.array(li)})

    return joined.map_batches(score, batch_format="pyarrow",
                              zero_copy_batch=True)
