"""Golden-run parity against the reference's OWN TestData fixtures.

The reference ships no test suite; its correctness record is the stored
notebook/README outputs (SURVEY.md §5).  Everything here replays those
runs on the actual ``/root/reference/TestData`` files through the new
engine's pure-python GPKG/GeoTIFF readers and asserts the published
numbers:

* ``get_canopy_percentage`` (README.md:200-223): AMS point +
  EPSG:3857 canopy segments, euclidean 250 m → ``"12.31%"`` — the one
  pipeline whose inputs are ALL local (every other golden run pulls
  rasters from Planetary Computer or networks from OSM at runtime, so
  they cannot be replayed offline; their kernels are covered by the
  synthetic-fixture parity tests instead).
* fixture geometry round trips: the exact POINT coordinates printed in
  README.md:107-111 and Viewshed.ipynb cell 9.
* raster fixtures: shapes/dtypes/value domains per FIXTURES.md §2.
* CRS engine: published worked examples for EPSG:27700 (OS "A guide to
  coordinate systems in Great Britain", Annex C) and EPSG:28992 (EPSG
  Guidance Note 7-2 §3.2.2 oblique stereographic example).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from greenex_py_ray import geom, geoproj
from greenex_py_ray.sources.geotiff import read_geotiff
from greenex_py_ray.sources.gpkg import polygons_to_rings, read_gpkg

TD = "/root/reference/TestData"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TD), reason="reference TestData not present"
)


# ---------------------------------------------------------------------------
# GPKG reader vs the coordinates the reference itself printed
# ---------------------------------------------------------------------------


def test_gpkg_ams_points_match_readme():
    # README.md:107-111 prints the AMS example points to 3 decimals
    t = read_gpkg(os.path.join(TD, "AMS_example_data.gpkg"))
    assert t.schema.metadata[b"crs"] == b"EPSG:28992"
    xy = sorted(zip(np.round(t.column("x").to_numpy(), 3),
                    np.round(t.column("y").to_numpy(), 3)))
    assert xy == [(118246.855, 488082.089), (118883.345, 485054.641),
                  (122483.550, 487728.517)]


def test_gpkg_gm_points_match_viewshed_notebook():
    # Viewshed.ipynb cell 9 prints the GM points (EPSG:27700)
    t = read_gpkg(os.path.join(TD, "GM_home_locations3.gpkg"))
    assert t.schema.metadata[b"crs"] == b"EPSG:27700"
    assert t.num_rows == 3
    # the fixture's own id column is NULL — the notebook's ids 1..3 come
    # from the reference's id-assignment step (M4), which numbers rows
    # in file order
    assert t.column("id").null_count == 3
    xy = [(round(x, 3), round(y, 3)) for x, y in
          zip(t.column("x").to_numpy(), t.column("y").to_numpy())]
    assert xy == [(388644.249, 392861.634), (385981.911, 393805.494),
                  (388631.230, 395322.181)]


def test_gpkg_fixture_inventory():
    # row counts / geometry kinds per FIXTURES.md §1
    cases = {
        "AMS_points_1000.gpkg": (1000, "x"),
        "AMS_points_500.gpkg": (518, "x"),
        "AMS_neighborhoods.gpkg": (518, "ring_x"),
        "AMS_canopy_segment.gpkg": (274, "ring_x"),
        "GM_home_location1.gpkg": (1, "x"),
        "GM_polygon1.gpkg": (1, "ring_x"),
        "GM_canopy_single_home_500m.gpkg": (3505, "ring_x"),
    }
    for fname, (rows, col) in cases.items():
        t = read_gpkg(os.path.join(TD, fname))
        assert t.num_rows == rows, fname
        assert col in t.column_names, fname


# ---------------------------------------------------------------------------
# GeoTIFF reader vs FIXTURES.md §2
# ---------------------------------------------------------------------------


def test_geotiff_ndvi_fixture():
    arr, meta = read_geotiff(os.path.join(TD, "GM_NDVI_data_test.tif"))
    assert arr.shape == (459, 694)
    assert meta["res_x"] == 10.0 and meta["res_y"] == 10.0
    finite = arr[np.isfinite(arr)]
    assert finite.size > 0.9 * arr.size
    assert -1.0 <= finite.min() and finite.max() <= 1.0


def test_geotiff_landcover_fixture():
    # the GM landcover fixture is NOT ESA WorldCover: its int16 codes
    # are class*100 + quintile (10xx..20xx, xx in 01..05) with -32768
    # nodata — assert that observed structure, not the product guess
    arr, meta = read_geotiff(os.path.join(TD, "GM_landcover_data_test.tif"))
    assert arr.shape == (460, 694)
    finite = arr[np.isfinite(arr)].astype(int)
    assert finite.size > 0.9 * arr.size  # nodata fringe only
    classes, quint = finite // 100, finite % 100
    assert set(classes.tolist()) <= set(range(10, 21))
    assert set(quint.tolist()) <= {1, 2, 3, 4, 5}


def test_geotiff_trees_fixture():
    arr, _ = read_geotiff(os.path.join(TD, "GM_trees_binary.tif"))
    assert arr.shape == (460, 694)
    vals = set(np.unique(arr[np.isfinite(arr)]).tolist())
    assert vals <= {0.0, 1.0}


def test_geotiff_rasters_share_gm_extent():
    # the three GM rasters cover the same 10 m grid area as the GM
    # points (EPSG:27700 Greater Manchester)
    _, meta = read_geotiff(os.path.join(TD, "GM_NDVI_data_test.tif"))
    pts = read_gpkg(os.path.join(TD, "GM_home_locations3.gpkg"))
    x = pts.column("x").to_numpy()
    y = pts.column("y").to_numpy()
    assert np.all(x > meta["x0"]) and np.all(x < meta["x0"] + 694 * 10.0)
    assert np.all(y < meta["y0"]) and np.all(y > meta["y0"] - 459 * 10.0)


# ---------------------------------------------------------------------------
# CRS worked examples (published truth, not self-derived)
# ---------------------------------------------------------------------------


def test_epsg27700_os_worked_example():
    # OS "A guide to coordinate systems in Great Britain", Annex C:
    # φ 52°39'27.2531"N, λ 1°43'4.5177"E (on OSGB36/Airy) →
    # E 651409.903, N 313177.270
    grid = geoproj.GRIDS["EPSG:27700"]
    lat = np.deg2rad(np.array([52.0 + 39.0 / 60.0 + 27.2531 / 3600.0]))
    lon = np.deg2rad(np.array([1.0 + 43.0 / 60.0 + 4.5177 / 3600.0]))
    e, n = grid.forward(lon, lat)
    assert abs(e[0] - 651409.903) < 2e-3
    assert abs(n[0] - 313177.270) < 2e-3
    lon2, lat2 = grid.inverse(e, n)
    assert abs(lon2[0] - lon[0]) < 1e-12 and abs(lat2[0] - lat[0]) < 1e-12


def test_epsg28992_epsg_gn7_worked_example():
    # EPSG Guidance Note 7-2 §3.2.2 (oblique stereographic, RD New):
    # φ 53°N, λ 6°E (on Amersfoort/Bessel) → E 196105.283, N 557057.739
    grid = geoproj.GRIDS["EPSG:28992"]
    e, n = grid.forward(np.deg2rad(np.array([6.0])),
                        np.deg2rad(np.array([53.0])))
    assert abs(e[0] - 196105.283) < 2e-3
    assert abs(n[0] - 557057.739) < 2e-3
    lon2, lat2 = grid.inverse(e, n)
    assert abs(np.rad2deg(lon2[0]) - 6.0) < 1e-11
    assert abs(np.rad2deg(lat2[0]) - 53.0) < 1e-11


def test_grid_transform_round_trips():
    rng = np.random.default_rng(7)
    # points around Amsterdam / Manchester in the grids' native frames
    for crs, (ex, ey) in {
        "EPSG:27700": (388000.0, 393000.0),
        "EPSG:28992": (120000.0, 487000.0),
        "EPSG:3857": (500000.0, 6800000.0),
    }.items():
        x = ex + rng.uniform(-5000, 5000, 32)
        y = ey + rng.uniform(-5000, 5000, 32)
        lon, lat = geoproj.transform(x, y, crs, "EPSG:4326")
        x2, y2 = geoproj.transform(lon, lat, "EPSG:4326", crs)
        # national grids round-trip to ~1 mm, not machine precision: the
        # 2D hub drops the ellipsoidal height a Helmert shift induces
        # (~50 m for OSGB36), the same convention pyproj's 2D transforms
        # use; the Helmert sets themselves are only metre-accurate vs
        # the national correction grids anyway
        assert np.max(np.abs(x2 - x)) < 2e-3
        assert np.max(np.abs(y2 - y)) < 2e-3


# ---------------------------------------------------------------------------
# THE golden run: get_canopy_percentage → "12.31%"
# ---------------------------------------------------------------------------


def _canopy_inputs():
    poi = read_gpkg(os.path.join(TD, "AMS_canopy_example.gpkg"))
    seg = read_gpkg(os.path.join(TD, "AMS_canopy_segment.gpkg"))
    # reference: "Adjusting CRS of Greenspace file to match with Point
    # of Interest CRS" — canopy 3857 → PoI 28992 (availability.py:633-637)
    can = polygons_to_rings(seg, dst_crs="EPSG:28992")
    return poi, can


def test_canopy_percentage_golden_kernel():
    """Straight-line replay of availability.py:764 on the real fixtures:
    sum(clip(aoi).area) / aoi.area, 64-gon buffer (geopandas default
    resolution=16), no dissolve → the README's published 12.31%."""
    poi, can = _canopy_inputs()
    px = poi.column("x")[0].as_py()
    py = poi.column("y")[0].as_py()
    aoi = geom.buffer_ngon(px, py, 250.0, 16)
    aoi_area = geom.polygon_area(aoi)
    tot = 0.0
    for rlist in can.column("rings").to_pylist():
        rings = [np.array([[p["x"], p["y"]] for p in ring]) for ring in rlist]
        tot += geom.overlay_area([rings, [aoi]], "intersection")
    assert round(tot / aoi_area * 100.0, 2) == 12.31


def test_canopy_percentage_golden_api_files(ray_session):
    """The golden 12.31% through the PUBLIC API handed the reference's
    own file paths — the exact call a reference user makes
    (README.md:200-205): gpkg PoI + gpkg canopy, 3857→28992 reproject,
    euclidean 250 m, stringified output."""
    import greenex_py_ray as gx

    out = gx.get_canopy_percentage(
        os.path.join(TD, "AMS_canopy_example.gpkg"),
        os.path.join(TD, "AMS_canopy_segment.gpkg"),
        buffer_dist=250.0,
    ).to_pandas()
    assert out["canopy_cover"].tolist() == ["12.31%"]


def test_mean_ndvi_api_real_raster(ray_session):
    """get_mean_NDVI over the reference's ACTUAL GM fixtures (gpkg
    points + GeoTIFF NDVI raster) — engine output vs a straight-line
    numpy replay of availability.py:289 on the same raster.  (The
    README's published NDVI numbers used a live Planetary Computer
    scene, so the reference's own values are not offline-replayable;
    this pins the full file→ingest→shift→zonal path instead.)"""
    import greenex_py_ray as gx

    poi_path = os.path.join(TD, "GM_home_locations3.gpkg")
    tif = os.path.join(TD, "GM_NDVI_data_test.tif")
    out = gx.get_mean_NDVI(poi_path, tif, buffer_dist=300.0).to_pandas()
    out = out.set_index("doc_id")
    assert len(out) == 3

    # straight-line oracle: same clamp>=0 / population-std / round-3
    arr, meta = read_geotiff(tif)
    south = np.flipud(arr)
    res = meta["res_x"]
    sw_x, sw_y = meta["x0"], meta["y0"] - arr.shape[0] * res
    pts = read_gpkg(poi_path)
    for i, (x, y) in enumerate(zip(pts.column("x").to_numpy(),
                                   pts.column("y").to_numpy())):
        lx, ly = x - sw_x, y - sw_y
        rr, cc = np.meshgrid(np.arange(south.shape[0]),
                             np.arange(south.shape[1]), indexing="ij")
        px = (cc + 0.5) * res
        py = (rr + 0.5) * res
        m = (px - lx) ** 2 + (py - ly) ** 2 <= 300.0 ** 2
        vals = south[m]
        vals = vals[np.isfinite(vals)]
        vals = np.maximum(vals, 0.0)
        want_mean = round(float(vals.mean()), 3)
        want_std = round(float(vals.std()), 3)
        got = out.loc[str(i + 1)]
        assert got["mean_NDVI"] == want_mean, (i, got["mean_NDVI"], want_mean)
        assert got["std_NDVI"] == want_std


def test_landcover_api_real_raster(ray_session):
    """get_landcover_percentages over the real GM fixtures (gpkg points
    + int16 landcover GeoTIFF with a user classmap) — engine per-class
    percentages vs a direct numpy replay.  All three PoI disks are
    interior to the raster, so extent/padding effects cannot blur the
    comparison."""
    import greenex_py_ray as gx

    poi_path = os.path.join(TD, "GM_home_locations3.gpkg")
    tif = os.path.join(TD, "GM_landcover_data_test.tif")
    arr, meta = read_geotiff(tif)
    res = meta["res_x"]
    south = np.flipud(arr)
    sw_x, sw_y = meta["x0"], meta["y0"] - arr.shape[0] * res
    codes = sorted(set(np.unique(arr[np.isfinite(arr)]).astype(int).tolist()))
    classmap = {c: f"lc_{c}" for c in codes}
    classmap[-32768] = "nodata"

    out = gx.get_landcover_percentages(
        poi_path, tif, buffer_dist=500.0, stringify=False, classmap=classmap,
    ).to_pandas().set_index("doc_id")
    assert len(out) == 3

    pts = read_gpkg(poi_path)
    canvas = np.where(np.isfinite(south), south, -32768.0)
    for i, (x, y) in enumerate(zip(pts.column("x").to_numpy(),
                                   pts.column("y").to_numpy())):
        lx, ly = x - sw_x, y - sw_y
        rr, cc = np.meshgrid(np.arange(south.shape[0]),
                             np.arange(south.shape[1]), indexing="ij")
        m = (((cc + 0.5) * res - lx) ** 2
             + ((rr + 0.5) * res - ly) ** 2) <= 500.0 ** 2
        vals = canvas[m]
        got = out.loc[str(i + 1)]
        for c in sorted(classmap):
            want = round(float((vals == c).sum()) / vals.size * 100.0, 3)
            assert got[classmap[c]] == want, (i, c, got[classmap[c]], want)


def test_landcover_api_default_classmap_from_raster(ray_session):
    """With classmap=None a .tif input derives its classmap from the
    raster's own distinct codes (numeric passthrough for codes outside
    the WorldCover legend — reference availability.py:556
    ``classmap.get(x, x)``) instead of the synth-world default, which
    would silently histogram nothing."""
    import greenex_py_ray as gx

    out = gx.get_landcover_percentages(
        os.path.join(TD, "GM_home_locations3.gpkg"),
        os.path.join(TD, "GM_landcover_data_test.tif"),
        buffer_dist=500.0, stringify=False,
    ).to_pandas().set_index("doc_id")
    # GM raster is UK CEH-coded (1001..2005): numeric passthrough columns
    assert "1001" in out.columns and "nodata" in out.columns
    pct = out.drop(columns=["spans"])
    # every PoI's class percentages sum to ~100 (nodata included)
    assert np.allclose(pct.sum(axis=1).to_numpy(), 100.0, atol=0.1)
    assert (pct["1001"] > 0).all()  # broadleaf woodland present at all 3


def test_canopy_percentage_golden_pipeline(ray_session):
    """The same golden number through the DISTRIBUTED path: Ray Dataset
    of the PoI → broadcast canopy table → PolygonCoverage actor pool
    with the reference's stringified output ("12.31%")."""
    import pyarrow as pa

    import ray

    from greenex_py_ray.stages.coverage import PolygonCoverage

    poi, can = _canopy_inputs()
    ds = ray.data.from_arrow(
        pa.table({
            "doc_id": pa.array(["poi-0"]),
            "x": poi.column("x"),
            "y": poi.column("y"),
        })
    )
    out = ds.map_batches(
        PolygonCoverage,
        fn_constructor_kwargs=dict(
            polys_ref=ray.put(can), buffer_dist=250.0, key_col="doc_id",
            name="canopy_cover", stringify=True, quad_segs=16,
            dissolve=False,
        ),
        batch_format="pyarrow", concurrency=(1, 2), num_cpus=0.25,
    ).to_pandas()
    assert out["canopy_cover"].tolist() == ["12.31%"]


def test_mean_ndvi_network_buffer_tif_frame(ray_session, tmp_path):
    """Regression: get_mean_NDVI(buffer_type='network') with a .tif
    raster must move the street graph into the tile-local frame WITH
    the PoIs.  Before the fix the nodes stayed in the GM frame
    (~(385k, 393k)) while points/tiles were shifted to ~(0..4k), so
    every isochrone window missed the tile store and every row came
    back NULL."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import greenex_py_ray as gx

    poi_path = os.path.join(TD, "GM_home_locations3.gpkg")
    tif = os.path.join(TD, "GM_NDVI_data_test.tif")
    pts = read_gpkg(poi_path)
    px = pts.column("x").to_numpy()
    py = pts.column("y").to_numpy()
    # a small connected path network threaded through the PoIs, in the
    # ORIGINAL (unshifted) GM frame — exactly what a user's OSM-derived
    # parquet would carry
    nx = np.concatenate([px, px + 80.0])
    ny = np.concatenate([py, py + 60.0])
    nid = np.arange(len(nx), dtype=np.int64)
    order = np.argsort(nx, kind="stable")
    u = nid[order][:-1]
    v = nid[order][1:]
    ln = np.hypot(nx[v] - nx[u], ny[v] - ny[u])
    nodes = tmp_path / "nodes.parquet"
    edges = tmp_path / "edges.parquet"
    pq.write_table(pa.table({"node_id": nid, "x": nx, "y": ny}), nodes)
    pq.write_table(pa.table({"u": u, "v": v, "length": ln}), edges)

    out = gx.get_mean_NDVI(
        poi_path, tif, buffer_dist=300.0, buffer_type="network",
        network_nodes_file=str(nodes), network_edges_file=str(edges),
    ).to_pandas()
    assert len(out) == 3
    got = out["mean_NDVI"].to_numpy(dtype=np.float64)
    # before the fix EVERY row was NULL (the graph stayed in the GM
    # frame, so every isochrone window missed the shifted tile store);
    # after it, PoIs whose capsule lands on finite pixels get values.
    # (Two of the three fixture PoIs sit in nodata pockets at this
    # 100 m capsule scale — a property of the GM fixture, not of the
    # frame handling.)
    fin = got[np.isfinite(got)]
    assert fin.size >= 1, out
    assert ((fin >= 0.0) & (fin <= 1.0)).all(), got


def test_gpkg_wkb_zm_and_multipoint():
    """WKB edge cases (round-3 review fixes): ZM geometries stride 4
    doubles per vertex; EWKB M-flag detected; multi-member MULTIPOINT
    refuses loudly instead of silently dropping coordinates."""
    import struct

    import pytest

    from greenex_py_ray.sources.gpkg import _Cursor, _parse_wkb

    k, xy = _parse_wkb(_Cursor(struct.pack("<BIdddd", 1, 3001, 1.5, 2.5,
                                           5.0, 6.0), 0))
    assert (k, xy) == ("point", (1.5, 2.5))
    k, xy = _parse_wkb(_Cursor(struct.pack("<BIddd", 1, 0x40000001,
                                           3.0, 4.0, 9.0), 0))
    assert xy == (3.0, 4.0)
    one = struct.pack("<BII", 1, 4, 1) + struct.pack("<BIdd", 1, 1, 7.0, 8.0)
    assert _parse_wkb(_Cursor(one, 0))[1] == (7.0, 8.0)
    two = (struct.pack("<BII", 1, 4, 2)
           + struct.pack("<BIdd", 1, 1, 1.0, 2.0)
           + struct.pack("<BIdd", 1, 1, 3.0, 4.0))
    with pytest.raises(ValueError, match="MULTIPOINT"):
        _parse_wkb(_Cursor(two, 0))
    # EWKB SRID flag (0x20000000): 4-byte SRID after the type word
    srid = struct.pack("<BIIdd", 1, 0x20000001, 4326, 9.0, 10.0)
    assert _parse_wkb(_Cursor(srid, 0))[1] == (9.0, 10.0)
    srid_z = struct.pack("<BIIddd", 1, 0xA0000001, 28992, 1.0, 2.0, 3.0)
    assert _parse_wkb(_Cursor(srid_z, 0))[1] == (1.0, 2.0)
    # POLYGON ZM: one square ring, stride-4 vertices
    ring = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
    blob = struct.pack("<BII", 1, 3003, 1) + struct.pack("<I", len(ring))
    for x, y in ring:
        blob += struct.pack("<dddd", x, y, 1.0, 2.0)
    k, rings = _parse_wkb(_Cursor(blob, 0))
    assert k == "polygon" and rings[0].shape == (5, 2)
    assert rings[0][2].tolist() == [4.0, 4.0]
