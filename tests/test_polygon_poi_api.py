"""API-level polygon-PoI dispatch (availability.py:80-125, 230-247).

The four availability functions accept POLYGON/MULTIPOLYGON PoIs:

* ``polygon_type='neighbourhood'`` + ``buffer_type=None`` — the row's
  own polygon is the AoI (availability.py:230-234);
* ``... + buffer_type='euclidean'`` — the polygon dilated by
  ``buffer_dist`` (availability.py:235-237);
* ``... + buffer_type='network'`` — centroid-seeded isochrone AoI
  (availability.py:241-247);
* ``polygon_type='house'`` — centroids, then the point path
  (availability.py:90-94).

Rect PoIs keep every direct computation closed-form."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

import greenex_py_ray as gx
from greenex_py_ray import geom
from greenex_py_ray.sources import synth
from greenex_py_ray.sources.synth import DOC_SCHEMA, SPAN_TYPE


def _docs_table(ids, wkts):
    rows = [[{"kind": "geom", "text": w, "media_ref": "", "offset": 0}]
            for w in wkts]
    return pa.table(
        {"doc_id": pa.array(ids, pa.string()),
         "spans": pa.array(rows, pa.list_(SPAN_TYPE))},
        schema=DOC_SCHEMA,
    )


def _rect_docs(n=10, seed=15):
    rng = np.random.default_rng(seed)
    cx = rng.uniform(3000, 17000, n)
    cy = rng.uniform(3000, 17000, n)
    hw = rng.uniform(60, 320, n)
    hh = rng.uniform(60, 320, n)
    x0, y0, x1, y1 = cx - hw, cy - hh, cx + hw, cy + hh
    wkts = [
        f"POLYGON(({x0[i]!r} {y0[i]!r}, {x1[i]!r} {y0[i]!r}, "
        f"{x1[i]!r} {y1[i]!r}, {x0[i]!r} {y1[i]!r}, {x0[i]!r} {y0[i]!r}))"
        for i in range(n)
    ]
    tbl = _docs_table([f"r{i}" for i in range(n)], wkts)
    return tbl, np.column_stack([x0, y0, x1, y1])


def _rect_pix_vals(x0, y0, x1, y1, dilate=0.0):
    """NDVI values (clamped at 0) of pixel centers inside the rect
    dilated by ``dilate`` — distance-to-rect closed form."""
    res = synth.RASTER_RES
    c0 = int(np.floor((x0 - dilate) / res))
    c1 = int(np.floor((x1 + dilate) / res))
    r0 = int(np.floor((y0 - dilate) / res))
    r1 = int(np.floor((y1 + dilate) / res))
    px = (np.arange(c0, c1 + 1, dtype=np.float64) + 0.5) * res
    py = (np.arange(r0, r1 + 1, dtype=np.float64) + 0.5) * res
    gxm, gym = np.meshgrid(px, py, indexing="xy")
    gxm, gym = gxm.ravel(), gym.ravel()
    dx = np.maximum(np.maximum(x0 - gxm, gxm - x1), 0.0)
    dy = np.maximum(np.maximum(y0 - gym, gym - y1), 0.0)
    m = np.hypot(dx, dy) <= dilate if dilate > 0 else (dx == 0) & (dy == 0)
    return gxm[m], gym[m]


def _slab_union_area(rects: np.ndarray) -> float:
    """Exact union area of axis-aligned rects (slab decomposition) —
    the numpy twin of the DuckDB oracle's ``_rect_union_cte``."""
    rects = rects[(rects[:, 2] > rects[:, 0]) & (rects[:, 3] > rects[:, 1])]
    if not len(rects):
        return 0.0
    xs = np.unique(np.concatenate([rects[:, 0], rects[:, 2]]))
    area = 0.0
    for sx0, sx1 in zip(xs[:-1], xs[1:]):
        cov = rects[(rects[:, 0] <= sx0) & (rects[:, 2] >= sx1)]
        if not len(cov):
            continue
        iv = cov[np.argsort(cov[:, 1], kind="stable")][:, [1, 3]]
        ylen, cur0, cur1 = 0.0, iv[0, 0], iv[0, 1]
        for a, b in iv[1:]:
            if a > cur1:
                ylen += cur1 - cur0
                cur0, cur1 = a, b
            else:
                cur1 = max(cur1, b)
        ylen += cur1 - cur0
        area += (sx1 - sx0) * ylen
    return area


def test_polygon_ndvi_self_and_dilated(world):
    tbl, R = _rect_docs()
    for dil, kw in [(0.0, dict(buffer_type=None)),
                    (150.0, dict(buffer_type="euclidean", buffer_dist=150.0))]:
        out = (gx.get_mean_NDVI(rd.from_arrow(tbl), world["tiles"], **kw)
               .to_pandas().set_index("doc_id"))
        for i in range(len(R)):
            pxm, pym = _rect_pix_vals(*R[i], dilate=dil)
            vals = np.maximum(synth.field_ndvi(pxm, pym), 0.0)
            row = out.loc[f"r{i}"]
            assert row["mean_NDVI"] == round(vals.mean(), 3), (dil, i)
            assert row["std_NDVI"] == round(vals.std(), 3), (dil, i)


def test_polygon_house_equals_point_path(world):
    tbl, R = _rect_docs(n=8, seed=21)
    cx = (R[:, 0] + R[:, 2]) / 2.0
    cy = (R[:, 1] + R[:, 3]) / 2.0
    pts = _docs_table([f"r{i}" for i in range(len(R))],
                      [f"POINT({cx[i]!r} {cy[i]!r})" for i in range(len(R))])
    cols = ["doc_id", "mean_NDVI", "std_NDVI"]
    house = (gx.get_mean_NDVI(rd.from_arrow(tbl), world["tiles"],
                              polygon_type="house", buffer_type="euclidean",
                              buffer_dist=200.0)
             .to_pandas()[cols].sort_values("doc_id").reset_index(drop=True))
    point = (gx.get_mean_NDVI(rd.from_arrow(pts), world["tiles"],
                              buffer_type="euclidean", buffer_dist=200.0)
             .to_pandas()[cols].sort_values("doc_id").reset_index(drop=True))
    assert house.equals(point)


def test_polygon_network_seeds_centroid_isochrone(world):
    tbl, R = _rect_docs(n=6, seed=33)
    cx = (R[:, 0] + R[:, 2]) / 2.0
    cy = (R[:, 1] + R[:, 3]) / 2.0
    pts = _docs_table([f"r{i}" for i in range(len(R))],
                      [f"POINT({cx[i]!r} {cy[i]!r})" for i in range(len(R))])
    kw = dict(buffer_type="network", buffer_dist=400.0,
              network_nodes_file=world["network_nodes"],
              network_edges_file=world["network_edges"])
    cols = ["doc_id", "mean_NDVI", "std_NDVI"]
    poly = (gx.get_mean_NDVI(rd.from_arrow(tbl), world["tiles"], **kw)
            .to_pandas()[cols].sort_values("doc_id").reset_index(drop=True))
    point = (gx.get_mean_NDVI(rd.from_arrow(pts), world["tiles"], **kw)
             .to_pandas()[cols].sort_values("doc_id").reset_index(drop=True))
    assert poly.equals(point)


def test_polygon_landcover_self(world):
    tbl, R = _rect_docs()
    out = (gx.get_landcover_percentages(
        rd.from_arrow(tbl), world["tiles"], buffer_type=None,
        stringify=False).to_pandas().set_index("doc_id"))
    pct_cols = [c for c in out.columns if c.startswith("pct_")]
    assert np.allclose(out[pct_cols].sum(axis=1), 100.0, atol=0.05)
    # closed-form parity on every rect
    for i in range(len(R)):
        pxm, pym = _rect_pix_vals(*R[i])
        codes = synth.field_lulc(pxm, pym)
        row = out.loc[f"r{i}"]
        for code, nm in [(10, "pct_tree"), (30, "pct_grass"),
                         (40, "pct_crop"), (50, "pct_builtup"),
                         (60, "pct_bare"), (80, "pct_water")]:
            want = round(float((codes == code).sum()) / len(codes) * 100, 3)
            assert row[nm] == want, (i, nm, row[nm], want)


def test_polygon_canopy_clip_sum(world):
    import pyarrow.parquet as pq

    tbl, R = _rect_docs()
    can = pq.read_table(world["canopy"])
    cx0 = can.column("x0").to_numpy()
    cy0 = can.column("y0").to_numpy()
    cx1 = can.column("x1").to_numpy()
    cy1 = can.column("y1").to_numpy()
    out = (gx.get_canopy_percentage(
        rd.from_arrow(tbl), world["canopy"], buffer_type=None,
        stringify=False).to_pandas().set_index("doc_id"))
    for i in range(len(R)):
        x0, y0, x1, y1 = R[i]
        w = np.maximum(np.minimum(cx1, x1) - np.maximum(cx0, x0), 0.0)
        h = np.maximum(np.minimum(cy1, y1) - np.maximum(cy0, y0), 0.0)
        want = (w * h).sum() / ((x1 - x0) * (y1 - y0)) * 100.0
        got = out.loc[f"r{i}", "canopy_cover"]
        assert abs(got - want) < 0.011, (i, got, want)


def test_polygon_greenspace_union(world):
    import pyarrow.parquet as pq

    tbl, R = _rect_docs()
    gs = pq.read_table(world["greenspace"])
    G = np.column_stack([gs.column(c).to_numpy()
                         for c in ("x0", "y0", "x1", "y1")])
    out = (gx.get_greenspace_percentage(
        rd.from_arrow(tbl), world["greenspace"], buffer_type=None,
        stringify=False).to_pandas().set_index("doc_id"))
    for i in range(len(R)):
        x0, y0, x1, y1 = R[i]
        clipped = np.column_stack([
            np.maximum(G[:, 0], x0), np.maximum(G[:, 1], y0),
            np.minimum(G[:, 2], x1), np.minimum(G[:, 3], y1)])
        want = _slab_union_area(clipped) / ((x1 - x0) * (y1 - y0)) * 100.0
        got = out.loc[f"r{i}", "greenspace_cover"]
        assert abs(got - want) < 0.011, (i, got, want)


def test_polygon_dispatch_validation(world):
    tbl, _ = _rect_docs(n=2)
    poly = rd.from_arrow(tbl)
    with pytest.raises(ValueError, match="polygon_type"):
        gx.get_mean_NDVI(poly, world["tiles"], polygon_type="block")
    with pytest.raises(ValueError, match="buffer_type"):
        gx.get_mean_NDVI(poly, world["tiles"], polygon_type="house",
                         buffer_type=None)
    with pytest.raises(ValueError, match="buffer_dist"):
        gx.get_mean_NDVI(poly, world["tiles"], buffer_type="euclidean",
                         buffer_dist=None)
    pts = _docs_table(["p0"], ["POINT(5000.0 5000.0)"])
    with pytest.raises(ValueError, match="point"):
        gx.get_mean_NDVI(rd.from_arrow(pts), world["tiles"],
                         buffer_type=None)
