"""Polygon dissolve (D1): merge overlapping greenspace polygons.

Reference: ``unary_union → explode → sjoin → dissolve(aggfunc='first')``
(`accessibility.py:125-127`, `availability.py:937-940`) — overlapping
source polygons become one blob carrying the first source's attributes.

Here: polygons are bucketed by grid cell (bbox cover), overlap candidate
pairs come from shared cells, the exact overlap test is a convex
intersection, and blobs are connected components of the overlap graph
(min-label propagation).  The side table is small relative to the
documents (it is broadcast everywhere else), so components run
driver-side; at larger side-table scale the same pair table feeds an
iterative groupby min-label loop.

Merged blob attributes: member count, union area (inclusion–exclusion,
exact for convex members), area-weighted union centroid, and
representative id = min member id (a deterministic stand-in for the
reference's 'first').
"""

from __future__ import annotations

import numpy as np

from .. import geom


def _bbox_cells(ring: np.ndarray, cs: float):
    x0, y0 = ring.min(axis=0)
    x1, y1 = ring.max(axis=0)
    return (int(np.floor(x0 / cs)), int(np.floor(y0 / cs)),
            int(np.floor(x1 / cs)), int(np.floor(y1 / cs)))


def overlap_pairs(rings: list[np.ndarray], cell_size: float = 1000.0):
    """Candidate pairs from shared grid cells, refined by exact convex
    intersection."""
    buckets: dict[tuple[int, int], list[int]] = {}
    for i, r in enumerate(rings):
        ix0, iy0, ix1, iy1 = _bbox_cells(r, cell_size)
        for bx in range(ix0, ix1 + 1):
            for by in range(iy0, iy1 + 1):
                buckets.setdefault((bx, by), []).append(i)
    pairs = set()
    for members in buckets.values():
        for a in range(len(members)):
            for b in range(a + 1, len(members)):
                i, j = members[a], members[b]
                if (i, j) in pairs:
                    continue
                inter = geom.clip_polygon_convex(rings[i], rings[j])
                if len(inter) >= 3 and geom.polygon_area(inter) > 0.0:
                    pairs.add((i, j))
    return sorted(pairs)


def dissolve_convex(rings: list[np.ndarray], ids: list[int] | None = None,
                    cell_size: float = 1000.0) -> dict:
    """Dissolve overlapping convex polygons into blobs.

    Returns dict with parallel lists per blob:
    ``rep_id`` (min member id), ``member_ids``, ``area`` (union area),
    ``centroid_x/y`` (area-weighted union centroid), and
    ``groups_rings`` (the member rings of each blob, for downstream
    exact clipping)."""
    n = len(rings)
    ids = ids if ids is not None else list(range(n))
    label = np.arange(n)
    pairs = overlap_pairs(rings, cell_size)
    # union-find (path compression)
    def find(a):
        while label[a] != a:
            label[a] = label[label[a]]
            a = label[a]
        return a

    for i, j in pairs:
        ri, rj = find(i), find(j)
        if ri != rj:
            label[max(ri, rj)] = min(ri, rj)
    roots = np.array([find(i) for i in range(n)])
    out = {"rep_id": [], "member_ids": [], "area": [],
           "centroid_x": [], "centroid_y": [], "groups_rings": []}
    for root in np.unique(roots):
        members = np.flatnonzero(roots == root)
        grp = [rings[m] for m in members]
        # union area + centroid by inclusion–exclusion over convex
        # intersections (exact for convex members)
        area = 0.0
        cx = 0.0
        cy = 0.0

        def rec(start, current, sign):
            nonlocal area, cx, cy
            for k in range(start, len(grp)):
                inter = grp[k] if current is None else geom.clip_polygon_convex(
                    current, grp[k]
                )
                if len(inter) < 3:
                    continue
                a = geom.polygon_area(inter)
                if a <= 0.0:
                    continue
                c = geom.polygon_centroid(inter)
                area += sign * a
                cx += sign * a * c[0]
                cy += sign * a * c[1]
                rec(k + 1, inter, -sign)

        rec(0, None, 1.0)
        out["rep_id"].append(min(ids[m] for m in members))
        out["member_ids"].append([ids[m] for m in members])
        out["area"].append(area)
        out["centroid_x"].append(cx / area if area > 0 else float(np.mean([g[:, 0].mean() for g in grp])))
        out["centroid_y"].append(cy / area if area > 0 else float(np.mean([g[:, 1].mean() for g in grp])))
        out["groups_rings"].append(grp)
    return out
