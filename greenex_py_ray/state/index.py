"""Cell-bucketed spatial indexes held inside map_batches actors.

Replaces the reference's ad-hoc ``scipy.cKDTree`` builds per call
(`/root/reference/GreenExp/accessibility.py:281`, `visibility.py:706`)
with a grid-hash index built ONCE per actor in ``__init__`` from a
broadcast side table (``ray.put`` once on the driver, read per actor).
Queries are exact: ring expansion continues until no closer candidate
can exist in an unexplored ring.
"""

from __future__ import annotations

import numpy as np


class GridIndex:
    """Point grid index: exact nearest-neighbour + radius queries.

    ``cell_size`` should be on the order of the typical query radius —
    bigger cells mean fewer ring expansions but more candidates per ring.
    """

    def __init__(self, x: np.ndarray, y: np.ndarray, cell_size: float = 500.0):
        self.x = np.asarray(x, dtype=np.float64)
        self.y = np.asarray(y, dtype=np.float64)
        self.cs = float(cell_size)
        ix = np.floor(self.x / self.cs).astype(np.int64)
        iy = np.floor(self.y / self.cs).astype(np.int64)
        order = np.lexsort((iy, ix))
        self._order = order
        six, siy = ix[order], iy[order]
        key = six * (1 << 32) + siy
        uniq, starts = np.unique(key, return_index=True)
        self._bucket_key = uniq
        self._bucket_start = np.concatenate([starts, [len(key)]])
        # populated bucket extent — bounds ring expansion for unlimited
        # nearest() queries (an empty index would otherwise expand to the
        # global cap per query group: an effective hang)
        if len(self.x):
            self._ix_lo, self._ix_hi = int(ix.min()), int(ix.max())
            self._iy_lo, self._iy_hi = int(iy.min()), int(iy.max())
        else:
            self._ix_lo = self._ix_hi = self._iy_lo = self._iy_hi = 0

    def _bucket(self, bix: int, biy: int) -> np.ndarray:
        """Original-array indices of points in grid bucket (bix, biy)."""
        key = bix * (1 << 32) + biy
        j = np.searchsorted(self._bucket_key, key)
        if j >= len(self._bucket_key) or self._bucket_key[j] != key:
            return np.empty(0, dtype=np.int64)
        return self._order[self._bucket_start[j] : self._bucket_start[j + 1]]

    def _ring_indices(self, bix: int, biy: int, ring: int) -> np.ndarray:
        """Points in the Chebyshev ring at distance ``ring`` from the
        query cell, clipped to the populated bucket extent (so a distant
        query against a small index probes O(extent) cells per ring, not
        O(ring))."""
        if ring == 0:
            return self._bucket(bix, biy)
        cells = []
        x0, x1 = bix - ring, bix + ring
        y0, y1 = biy - ring, biy + ring
        for yy in {y0, y1}:
            if self._iy_lo <= yy <= self._iy_hi:
                for xx in range(max(x0, self._ix_lo), min(x1, self._ix_hi) + 1):
                    cells.append((xx, yy))
        for xx in {x0, x1}:
            if self._ix_lo <= xx <= self._ix_hi:
                for yy in range(max(y0 + 1, self._iy_lo),
                                min(y1 - 1, self._iy_hi) + 1):
                    cells.append((xx, yy))
        parts = [self._bucket(x, y) for x, y in cells]
        parts = [p for p in parts if len(p)]
        return np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)

    def _ring_start(self, bix: int, biy: int) -> int:
        """Chebyshev distance from a query cell to the populated extent
        box — rings below this are empty by construction."""
        dx = max(self._ix_lo - bix, 0, bix - self._ix_hi)
        dy = max(self._iy_lo - biy, 0, biy - self._iy_hi)
        return max(dx, dy)

    def nearest(self, qx: np.ndarray, qy: np.ndarray, max_dist: float | None = None):
        """Exact 1-NN for each query point.

        Returns (dist, index); misses (empty index / beyond max_dist)
        get (inf, -1).  Grouped by query cell so ring candidate sets are
        shared; distance math per group is vectorized.
        """
        qx = np.asarray(qx, dtype=np.float64)
        qy = np.asarray(qy, dtype=np.float64)
        n = len(qx)
        best_d = np.full(n, np.inf)
        best_i = np.full(n, -1, dtype=np.int64)
        if len(self.x) == 0:
            return best_d, best_i
        qix = np.floor(qx / self.cs).astype(np.int64)
        qiy = np.floor(qy / self.cs).astype(np.int64)
        gkey = qix * (1 << 32) + qiy
        order = np.argsort(gkey, kind="stable")
        uq, starts = np.unique(gkey[order], return_index=True)
        bounds = np.concatenate([starts, [n]])
        for g in range(len(uq)):
            sel = order[bounds[g] : bounds[g + 1]]
            bix = int(qix[sel[0]])
            biy = int(qiy[sel[0]])
            # past this ring every populated bucket has been visited
            ring_cap = max(
                2,
                max(abs(bix - self._ix_lo), abs(bix - self._ix_hi)),
                max(abs(biy - self._iy_lo), abs(biy - self._iy_hi)),
            )
            if max_dist is not None:
                ring_cap = min(ring_cap, int(np.ceil(max_dist / self.cs)) + 1)
            gx = qx[sel]
            gy = qy[sel]
            gd = best_d[sel]
            gi = best_i[sel]
            ring = self._ring_start(bix, biy)
            if max_dist is not None and (ring - 1) * self.cs > max_dist:
                continue  # populated extent entirely beyond max_dist
            while True:
                cand = self._ring_indices(bix, biy, ring)
                if len(cand):
                    dx = gx[:, None] - self.x[cand][None, :]
                    dy = gy[:, None] - self.y[cand][None, :]
                    d = np.sqrt(dx * dx + dy * dy)
                    j = np.argmin(d, axis=1)
                    dmin = d[np.arange(len(sel)), j]
                    upd = dmin < gd
                    gd[upd] = dmin[upd]
                    gi[upd] = cand[j[upd]]
                # any point in this bucket is at least (ring)*cs away from
                # rings > ring+1; stop when no improvement is possible
                lower_next = ring * self.cs
                finished = np.isfinite(gd) & (gd <= lower_next)
                if finished.all():
                    break
                if max_dist is not None and lower_next > max_dist:
                    break
                ring += 1
                if ring > ring_cap + 1:
                    break
            best_d[sel] = gd
            best_i[sel] = gi
        if max_dist is not None:
            miss = best_d > max_dist
            best_d[miss] = np.inf
            best_i[miss] = -1
        return best_d, best_i

    def candidate_groups(self, qx: np.ndarray, qy: np.ndarray,
                         radius: float):
        """Yield ``(query_indices, candidate_point_indices)`` per
        occupied query cell; candidates are every indexed point within
        ``ceil(radius/cs) + 1`` Chebyshev rings — a strict SUPERSET of
        the radius ball, so the caller applies its own metric/filter
        with its own arithmetic (the grid only prunes, it never
        decides).  This is the scale path for broadcast-facility
        stages: per-batch work drops from O(points x F) dense to
        O(points x local candidates)."""
        qx = np.asarray(qx, dtype=np.float64)
        qy = np.asarray(qy, dtype=np.float64)
        if not len(qx) or not len(self.x):
            return
        rings = int(np.ceil(radius / self.cs)) + 1
        qix = np.floor(qx / self.cs).astype(np.int64)
        qiy = np.floor(qy / self.cs).astype(np.int64)
        gkey = qix * (1 << 32) + qiy
        order = np.argsort(gkey, kind="stable")
        uq, starts = np.unique(gkey[order], return_index=True)
        bounds = np.concatenate([starts, [len(qx)]])
        for g in range(len(uq)):
            sel = order[bounds[g] : bounds[g + 1]]
            bix = int(qix[sel[0]])
            biy = int(qiy[sel[0]])
            parts = [self._ring_indices(bix, biy, r)
                     for r in range(rings + 1)]
            parts = [p for p in parts if len(p)]
            if not parts:
                continue
            yield sel, np.concatenate(parts)

    def within(self, qx: np.ndarray, qy: np.ndarray, radius: float):
        """All index points within ``radius`` of each query point.
        Returns (query_local_index, point_index, dist) flat arrays."""
        qx = np.asarray(qx, dtype=np.float64)
        qy = np.asarray(qy, dtype=np.float64)
        rings = int(np.ceil(radius / self.cs)) + 1
        out_q, out_p, out_d = [], [], []
        qix = np.floor(qx / self.cs).astype(np.int64)
        qiy = np.floor(qy / self.cs).astype(np.int64)
        gkey = qix * (1 << 32) + qiy
        order = np.argsort(gkey, kind="stable")
        uq, starts = np.unique(gkey[order], return_index=True)
        bounds = np.concatenate([starts, [len(qx)]])
        for g in range(len(uq)):
            sel = order[bounds[g] : bounds[g + 1]]
            bix = int(qix[sel[0]])
            biy = int(qiy[sel[0]])
            cand = np.concatenate(
                [self._ring_indices(bix, biy, r) for r in range(rings + 1)]
            ) if rings >= 0 else np.empty(0, np.int64)
            if not len(cand):
                continue
            dx = qx[sel][:, None] - self.x[cand][None, :]
            dy = qy[sel][:, None] - self.y[cand][None, :]
            d = np.sqrt(dx * dx + dy * dy)
            qi, pj = np.nonzero(d <= radius)
            out_q.append(sel[qi])
            out_p.append(cand[pj])
            out_d.append(d[qi, pj])
        if not out_q:
            return (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0))
        return np.concatenate(out_q), np.concatenate(out_p), np.concatenate(out_d)


class RectIndex:
    """Grid index over axis-aligned rectangles (bbox containment joins).

    Buckets every rectangle into each grid cell its bbox touches; point
    queries return candidate rectangles from the point's cell only —
    exact because a rect covering the point necessarily touches the
    point's cell.
    """

    def __init__(self, x0, y0, x1, y1, ids, cell_size: float = 1000.0):
        self.x0 = np.asarray(x0, np.float64)
        self.y0 = np.asarray(y0, np.float64)
        self.x1 = np.asarray(x1, np.float64)
        self.y1 = np.asarray(y1, np.float64)
        self.ids = np.asarray(ids)
        self.cs = float(cell_size)
        buckets: dict[tuple[int, int], list[int]] = {}
        ix0 = np.floor(self.x0 / self.cs).astype(np.int64)
        ix1 = np.floor(self.x1 / self.cs).astype(np.int64)
        iy0 = np.floor(self.y0 / self.cs).astype(np.int64)
        iy1 = np.floor(self.y1 / self.cs).astype(np.int64)
        for i in range(len(self.ids)):
            for bx in range(ix0[i], ix1[i] + 1):
                for by in range(iy0[i], iy1[i] + 1):
                    buckets.setdefault((bx, by), []).append(i)
        self._buckets = {k: np.array(v, dtype=np.int64) for k, v in buckets.items()}

    def containing(self, qx: np.ndarray, qy: np.ndarray):
        """(query_local_index, rect_index) pairs where the rect contains
        the point (closed bounds, matching SQL BETWEEN)."""
        qx = np.asarray(qx, np.float64)
        qy = np.asarray(qy, np.float64)
        bix = np.floor(qx / self.cs).astype(np.int64)
        biy = np.floor(qy / self.cs).astype(np.int64)
        out_q, out_r = [], []
        key = bix * (1 << 32) + biy
        order = np.argsort(key, kind="stable")
        uq, starts = np.unique(key[order], return_index=True)
        bounds = np.concatenate([starts, [len(qx)]])
        for g in range(len(uq)):
            sel = order[bounds[g] : bounds[g + 1]]
            cand = self._buckets.get((int(bix[sel[0]]), int(biy[sel[0]])))
            if cand is None:
                continue
            inside = (
                (qx[sel][:, None] >= self.x0[cand][None, :])
                & (qx[sel][:, None] <= self.x1[cand][None, :])
                & (qy[sel][:, None] >= self.y0[cand][None, :])
                & (qy[sel][:, None] <= self.y1[cand][None, :])
            )
            qi, rj = np.nonzero(inside)
            out_q.append(sel[qi])
            out_r.append(cand[rj])
        if not out_q:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(out_q), np.concatenate(out_r)
