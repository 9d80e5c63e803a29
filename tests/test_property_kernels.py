"""Property-based tests (hypothesis) over the pure-numpy geometry /
projection / dedup kernels — invariants that must hold for ANY input,
complementing the fixed-seed oracle tests.  All pure CPU, no Ray."""

import numpy as np
from hypothesis import given, settings, strategies as st

from greenex_py_ray import geom, geoproj

FIN = dict(allow_nan=False, allow_infinity=False)
coord = st.floats(min_value=-1e4, max_value=1e4, **FIN)
side = st.floats(min_value=1.0, max_value=5e3, **FIN)


def _rect_ring(x0, y0, w, h):
    return np.array([[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]])


rects = st.tuples(coord, coord, side, side)


@settings(max_examples=60, deadline=None)
@given(rects, rects)
def test_overlay_union_inclusion_exclusion(r1, r2):
    """union(A, B) area == |A| + |B| - |A∩B| (closed-form rects)."""
    a = _rect_ring(*r1)
    b = _rect_ring(*r2)
    ix = max(0.0, min(r1[0] + r1[2], r2[0] + r2[2]) - max(r1[0], r2[0]))
    iy = max(0.0, min(r1[1] + r1[3], r2[1] + r2[3]) - max(r1[1], r2[1]))
    expect = r1[2] * r1[3] + r2[2] * r2[3] - ix * iy
    area, _, _ = geom.overlay_moments([[a], [b]], "union")
    assert abs(area - expect) <= 1e-6 * max(expect, 1.0)
    inter, _, _ = geom.overlay_moments([[a], [b]], "intersection")
    assert abs(inter - ix * iy) <= 1e-6 * max(ix * iy, 1.0)


@settings(max_examples=60, deadline=None)
@given(rects, st.floats(min_value=0.05, max_value=0.45, **FIN))
def test_overlay_hole_subtracts(r, frac):
    """even-odd layer with a strictly interior hole: |outer| - |hole|."""
    x0, y0, w, h = r
    outer = _rect_ring(x0, y0, w, h)
    hole = _rect_ring(x0 + frac * w, y0 + frac * h,
                      (1 - 2 * frac) * w, (1 - 2 * frac) * h)
    area, _, _ = geom.overlay_moments([[outer, hole]], "union")
    expect = w * h - (1 - 2 * frac) ** 2 * w * h
    assert abs(area - expect) <= 1e-6 * max(expect, 1.0)


@settings(max_examples=60, deadline=None)
@given(rects, st.lists(st.tuples(coord, coord), min_size=1, max_size=40))
def test_points_in_rings_matches_rect_closed_form(r, pts):
    x0, y0, w, h = r
    ring = _rect_ring(x0, y0, w, h)
    px = np.array([p[0] for p in pts])
    py = np.array([p[1] for p in pts])
    got = geom.points_in_rings(px, py, [ring])
    strict_in = (px > x0) & (px < x0 + w) & (py > y0) & (py < y0 + h)
    strict_out = (px < x0) | (px > x0 + w) | (py < y0) | (py > y0 + h)
    # boundary points are allowed either way (ray-casting tie rule)
    assert (got | ~strict_in).all()      # strictly inside → True
    assert (~got | ~strict_out).all()    # strictly outside → False


@settings(max_examples=40, deadline=None)
@given(rects, st.floats(min_value=0.0, max_value=500.0, **FIN),
       st.lists(st.tuples(coord, coord), min_size=1, max_size=30))
def test_points_within_rings_dist_matches_distance(r, d, pts):
    x0, y0, w, h = r
    ring = _rect_ring(x0, y0, w, h)
    px = np.array([p[0] for p in pts])
    py = np.array([p[1] for p in pts])
    got = geom.points_within_rings_dist(px, py, [ring], d)
    dx = np.maximum(np.maximum(x0 - px, px - (x0 + w)), 0.0)
    dy = np.maximum(np.maximum(y0 - py, py - (y0 + h)), 0.0)
    dist = np.hypot(dx, dy)
    safe = np.abs(dist - d) > 1e-7 * max(d, 1.0) + 1e-9
    assert (got == (dist <= d))[safe].all()


@settings(max_examples=40, deadline=None)
@given(st.sampled_from(["EPSG:3395", "EPSG:32631", "EPSG:27700",
                        "EPSG:28992", "EPSG:3857"]),
       st.lists(st.tuples(st.floats(min_value=-3.0, max_value=8.0, **FIN),
                          st.floats(min_value=46.0, max_value=54.0, **FIN)),
                min_size=1, max_size=20))
def test_geoproj_roundtrip(crs, lonlat):
    """forward∘inverse is identity to ~5 mm over each grid's domain
    (the datum-shifted grids document ~2 mm worked-example precision)."""
    lon = np.array([p[0] for p in lonlat])
    lat = np.array([p[1] for p in lonlat])
    x, y = geoproj.transform(lon, lat, "EPSG:4326", crs)
    lon2, lat2 = geoproj.transform(x, y, crs, "EPSG:4326")
    assert np.allclose(lon, lon2, atol=5e-8)
    assert np.allclose(lat, lat2, atol=5e-8)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=30))
def test_fingerprint_deterministic_and_injective_on_distinct(texts):
    from greenex_py_ray.stages.text import fingerprint64

    a = fingerprint64(texts)
    b = fingerprint64(texts)
    assert (a == b).all()
    # equal texts → equal prints (the dedup invariant the engine uses)
    idx = {}
    for i, t in enumerate(texts):
        if t in idx:
            assert a[i] == a[idx[t]]
        idx[t] = i


@settings(max_examples=30, deadline=None)
@given(rects, rects)
def test_clip_polygon_convex_area_bounds(r1, r2):
    """|clip(A, B)| == |A∩B| for rects (exact closed form)."""
    a = _rect_ring(*r1)
    b = _rect_ring(*r2)
    out = geom.clip_polygon_convex(a, b)
    ix = max(0.0, min(r1[0] + r1[2], r2[0] + r2[2]) - max(r1[0], r2[0]))
    iy = max(0.0, min(r1[1] + r1[3], r2[1] + r2[3]) - max(r1[1], r2[1]))
    got = geom.polygon_area(out) if len(out) >= 3 else 0.0
    assert abs(got - ix * iy) <= 1e-6 * max(ix * iy, 1.0)
