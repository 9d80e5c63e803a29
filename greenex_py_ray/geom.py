"""Vectorized numpy geometry kernels (shapely/geopandas replacement).

The sandbox has no shapely/geopandas/rasterio; every geometric primitive
the reference delegates to those libraries is reimplemented here over
plain float64 arrays.  Polygons are represented as ring coordinate
arrays ``(N, 2)`` (closed implicitly: last vertex need not repeat the
first); multi-ring polygons as lists of rings where ring 0 is the
exterior shell (holes are not needed by any reference operator on the
synthetic fixtures).

Reference citations (what each kernel reproduces):
* ``buffer_ngon``            — ``geometry.buffer(dist)``: GreenExp/availability.py:236
* ``polygon_area``           — ``gdf.area``: GreenExp/accessibility.py:130
* ``polygon_centroid``       — ``geometry.centroid``: GreenExp/accessibility.py:134
* ``points_in_polygon``      — ``sjoin(predicate='within')``: GreenExp/visibility.py:653-660
* ``clip_polygon_convex``    — ``gdf.clip(aoi)``: GreenExp/availability.py:764
* ``interpolate_along``      — ``line.interpolate(d)``: GreenExp/visibility.py:624-650
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# WKT point parsing (the `geom` span payload of the documents table)
# ---------------------------------------------------------------------------


def parse_wkt_points(wkt: "np.ndarray | list[str]") -> tuple[np.ndarray, np.ndarray]:
    """Parse an array of ``POINT(x y)`` WKT strings → (x, y) float64.

    Vectorized via one join+split pass rather than a per-row regex.
    """
    stripped = [w[6:-1] if w.startswith("POINT(") else w[7:-1] for w in wkt]
    if not stripped:
        return np.empty(0), np.empty(0)
    flat = np.array(" ".join(stripped).split(), dtype=np.float64)
    xy = flat.reshape(-1, 2)
    return xy[:, 0].copy(), xy[:, 1].copy()


def format_wkt_points(x: np.ndarray, y: np.ndarray) -> list[str]:
    return [f"POINT({a!r} {b!r})" for a, b in zip(x.tolist(), y.tolist())]


# ---------------------------------------------------------------------------
# Buffers
# ---------------------------------------------------------------------------


def buffer_ngon(x: float, y: float, radius: float, quad_segs: int = 16) -> np.ndarray:
    """Circle-approximation polygon matching shapely's ``buffer`` N-gon
    discretization (``quad_segs`` segments per quarter circle; shapely 1.x
    default ``resolution=16`` used by the reference environment).

    Returns ``(4*quad_segs, 2)`` ring vertices, counter-clockwise,
    starting at angle 0.
    """
    n = 4 * quad_segs
    ang = np.arange(n, dtype=np.float64) * (2.0 * np.pi / n)
    return np.column_stack((x + radius * np.cos(ang), y + radius * np.sin(ang)))


def buffer_ngon_many(x: np.ndarray, y: np.ndarray, radius: float, quad_segs: int = 16) -> np.ndarray:
    """Vectorized ``buffer_ngon`` for many centers → ``(M, 4*quad_segs, 2)``."""
    n = 4 * quad_segs
    ang = np.arange(n, dtype=np.float64) * (2.0 * np.pi / n)
    cx = np.asarray(x, dtype=np.float64)[:, None]
    cy = np.asarray(y, dtype=np.float64)[:, None]
    return np.stack((cx + radius * np.cos(ang)[None, :], cy + radius * np.sin(ang)[None, :]), axis=-1)


# ---------------------------------------------------------------------------
# Areas / centroids
# ---------------------------------------------------------------------------


def polygon_area(ring: np.ndarray) -> float:
    """Shoelace area (positive regardless of orientation)."""
    x = ring[:, 0]
    y = ring[:, 1]
    return abs(float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))) / 2.0


def polygon_area_signed(ring: np.ndarray) -> float:
    x = ring[:, 0]
    y = ring[:, 1]
    return (float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))) / 2.0


def polygon_centroid(ring: np.ndarray) -> tuple[float, float]:
    """Area-weighted centroid (shapely ``geometry.centroid`` semantics)."""
    x = ring[:, 0]
    y = ring[:, 1]
    xn = np.roll(x, -1)
    yn = np.roll(y, -1)
    cross = x * yn - xn * y
    a = cross.sum() / 2.0
    if a == 0.0:
        return float(x.mean()), float(y.mean())
    cx = float(((x + xn) * cross).sum() / (6.0 * a))
    cy = float(((y + yn) * cross).sum() / (6.0 * a))
    return cx, cy


def rings_bbox(ring: np.ndarray) -> tuple[float, float, float, float]:
    return (
        float(ring[:, 0].min()),
        float(ring[:, 1].min()),
        float(ring[:, 0].max()),
        float(ring[:, 1].max()),
    )


# ---------------------------------------------------------------------------
# Point-in-polygon (crossing number), vectorized over points
# ---------------------------------------------------------------------------


def points_in_polygon(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Boolean mask: which points fall inside the polygon ring.

    Crossing-number test, vectorized over points × edges.  Boundary
    behavior follows the half-open edge rule (consistent, matches the
    strict ``within`` predicate closely enough for off-boundary data).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    x0 = ring[:, 0]
    y0 = ring[:, 1]
    x1 = np.roll(x0, -1)
    y1 = np.roll(y0, -1)
    # edges × points: does the horizontal ray from each point cross edge j?
    cond = (y0[None, :] > py[:, None]) != (y1[None, :] > py[:, None])
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0[None, :] + (py[:, None] - y0[None, :]) / (y1 - y0)[None, :] * (x1 - x0)[None, :]
    crossings = (cond & (px[:, None] < xint)).sum(axis=1)
    return (crossings % 2).astype(bool)


# ---------------------------------------------------------------------------
# Convex clipping (Sutherland–Hodgman) — AoI buffers/boxes are convex
# ---------------------------------------------------------------------------


def clip_polygon_convex(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Clip ``subject`` ring by the CONVEX ring ``clip`` (CCW).

    Returns the clipped ring (possibly empty, shape (0,2)).  Used for
    canopy/greenspace % cover (``availability.py:764,997``): the clipped
    area over the AoI area is exact for convex AoIs (circle N-gons,
    boxes).
    """
    out = np.asarray(subject, dtype=np.float64)
    cx = clip[:, 0]
    cy = clip[:, 1]
    nx = np.roll(cx, -1)
    ny = np.roll(cy, -1)
    for j in range(len(clip)):
        if len(out) == 0:
            break
        ex0, ey0, ex1, ey1 = cx[j], cy[j], nx[j], ny[j]
        # signed side of each subject vertex relative to the clip edge
        sx = out[:, 0]
        sy = out[:, 1]
        side = (ex1 - ex0) * (sy - ey0) - (ey1 - ey0) * (sx - ex0)
        inside = side >= 0.0
        if inside.all():
            continue
        nxt = np.roll(np.arange(len(out)), -1)
        new_pts = []
        for i in range(len(out)):
            k = nxt[i]
            if inside[i]:
                new_pts.append(out[i])
                if not inside[k]:
                    new_pts.append(_edge_intersect(out[i], out[k], side[i], side[k]))
            elif inside[k]:
                new_pts.append(_edge_intersect(out[i], out[k], side[i], side[k]))
        out = np.array(new_pts, dtype=np.float64).reshape(-1, 2)
    return out


def _edge_intersect(p0, p1, s0, s1):
    t = s0 / (s0 - s1)
    return p0 + t * (p1 - p0)


def clip_area_convex(subject: np.ndarray, clip: np.ndarray) -> float:
    clipped = clip_polygon_convex(subject, clip)
    if len(clipped) < 3:
        return 0.0
    return polygon_area(clipped)


# ---------------------------------------------------------------------------
# Linestring interpolation (sample-point generation)
# ---------------------------------------------------------------------------


def linestring_lengths(coords: np.ndarray) -> np.ndarray:
    """Cumulative arc length at each vertex of an (N,2) linestring."""
    seg = np.hypot(np.diff(coords[:, 0]), np.diff(coords[:, 1]))
    return np.concatenate(([0.0], np.cumsum(seg)))


def interpolate_along(coords: np.ndarray, distances: np.ndarray) -> np.ndarray:
    """Points at given arc-length distances along a linestring
    (shapely ``line.interpolate`` semantics; distances clamped to
    [0, length])."""
    cum = linestring_lengths(coords)
    total = cum[-1]
    d = np.clip(np.asarray(distances, dtype=np.float64), 0.0, total)
    seg_idx = np.clip(np.searchsorted(cum, d, side="right") - 1, 0, len(cum) - 2)
    seg_len = cum[seg_idx + 1] - cum[seg_idx]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(seg_len > 0, (d - cum[seg_idx]) / seg_len, 0.0)
    p0 = coords[seg_idx]
    p1 = coords[seg_idx + 1]
    return p0 + (p1 - p0) * t[:, None]


# ---------------------------------------------------------------------------
# Segment ↔ circle intersection (edge ∩ PoI-buffer prefilter, SURVEY J9)
# ---------------------------------------------------------------------------


def segments_intersect_circle(
    ax: np.ndarray, ay: np.ndarray, bx: np.ndarray, by: np.ndarray,
    cx: float, cy: float, r: float,
) -> np.ndarray:
    """Boolean mask: does each segment (a→b) come within r of (cx, cy)."""
    ax = np.asarray(ax, dtype=np.float64) - cx
    ay = np.asarray(ay, dtype=np.float64) - cy
    bx = np.asarray(bx, dtype=np.float64) - cx
    by = np.asarray(by, dtype=np.float64) - cy
    dx = bx - ax
    dy = by - ay
    len2 = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(len2 > 0, -(ax * dx + ay * dy) / len2, 0.0)
    t = np.clip(t, 0.0, 1.0)
    px = ax + t * dx
    py = ay + t * dy
    return px * px + py * py <= r * r


# ---------------------------------------------------------------------------
# Mixed WKT parsing (POINT + POLYGON exterior rings)
# ---------------------------------------------------------------------------


def parse_wkt_geoms(wkt: "list[str]"):
    """Parse POINT / POLYGON WKT strings.

    Returns (x, y, kinds, rings): x/y are the point coords or the
    polygon centroid (the reference converts polygon PoIs to centroids
    before point ops — M3, accessibility.py:53-56); ``rings[i]`` is the
    exterior ring ``(N, 2)`` array for polygons, None for points.
    """
    n = len(wkt)
    x = np.full(n, np.nan)
    y = np.full(n, np.nan)
    kinds: list[str] = [""] * n
    rings: list = [None] * n
    for i, w in enumerate(wkt):
        if w.startswith("POINT"):
            body = w[w.index("(") + 1 : w.rindex(")")]
            px, py = body.split()
            x[i] = float(px)
            y[i] = float(py)
            kinds[i] = "POINT"
        elif w.startswith("POLYGON"):
            body = w[w.index("((") + 2 : w.index("))")]
            pts = np.array(
                [[float(a) for a in p.split()] for p in body.split(",")],
                dtype=np.float64,
            )
            if len(pts) > 1 and np.array_equal(pts[0], pts[-1]):
                pts = pts[:-1]
            rings[i] = pts
            cx, cy = polygon_centroid(pts)
            x[i] = cx
            y[i] = cy
            kinds[i] = "POLYGON"
        else:
            kinds[i] = w.split("(", 1)[0]
    return x, y, kinds, rings
