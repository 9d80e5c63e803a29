"""Round-3 advice fixes: geotiff tag validation, pad sentinel,
point-PoI buffer validation, ingest-cache ownership, plotmap escaping."""

import os
import struct

import numpy as np
import pyarrow as pa
import pytest

import greenex_py_ray as gx
from greenex_py_ray import api
from greenex_py_ray.sources.geotiff import ingest_to_tiles, read_geotiff


def _mk_tiff(path, w=2, h=2, spp=1, tiled=False, data=None, res=None):
    """Minimal little-endian classic strip TIFF (uint8, one strip);
    ``res`` adds a ModelPixelScale tag (3 doubles, stored externally)."""
    if data is None:
        data = bytes(range(w * h * spp))
    entries = []

    def ent(tag, typ, cnt, val):
        entries.append(struct.pack("<HHI4s", tag, typ, cnt, val))

    n_entries = 8 + (1 if tiled else 0) + (1 if res else 0)
    data_off = 8 + 2 + n_entries * 12 + 4
    scale_off = data_off + len(data)
    i4 = lambda v: struct.pack("<I", v)
    h2 = lambda v: struct.pack("<HH", v, 0)
    ent(256, 4, 1, i4(w))
    ent(257, 4, 1, i4(h))
    ent(258, 3, 1, h2(8))
    ent(259, 3, 1, h2(1))
    ent(273, 4, 1, i4(data_off))
    ent(277, 3, 1, h2(spp))
    ent(278, 4, 1, i4(h))
    ent(279, 4, 1, i4(len(data)))
    if tiled:
        ent(322, 4, 1, i4(16))  # TileWidth
    tail = b""
    if res:
        ent(33550, 12, 3, i4(scale_off))
        tail = struct.pack("<3d", res, res, 0.0)
    hdr = b"II" + struct.pack("<HI", 42, 8)
    ifd = struct.pack("<H", n_entries) + b"".join(sorted(entries)) + i4(0)
    with open(path, "wb") as f:
        f.write(hdr + ifd + data + tail)


def test_geotiff_rejects_multiband(tmp_path):
    p = str(tmp_path / "multi.tif")
    _mk_tiff(p, spp=3)
    with pytest.raises(ValueError, match="SamplesPerPixel"):
        read_geotiff(p)


def test_geotiff_rejects_tiled(tmp_path):
    p = str(tmp_path / "tiled.tif")
    _mk_tiff(p, tiled=True)
    with pytest.raises(ValueError, match="tiled TIFF"):
        read_geotiff(p)


def test_geotiff_single_band_still_reads(tmp_path):
    p = str(tmp_path / "ok.tif")
    _mk_tiff(p, w=3, h=2, data=bytes([1, 2, 3, 4, 5, 6]))
    arr, meta = read_geotiff(p)
    assert arr.shape == (2, 3)
    np.testing.assert_array_equal(arr, [[1, 2, 3], [4, 5, 6]])


def test_int_pad_sentinel_outside_code_set(tmp_path):
    """Integer rasters without a nodata tag must pad edge tiles with a
    sentinel OUTSIDE the observed class codes (class 0 exists here) and
    record it in codes so the classmap labels it 'nodata'."""
    p = str(tmp_path / "lc.tif")
    # 3x2 landcover raster containing a genuine class 0
    _mk_tiff(p, w=3, h=2, data=bytes([0, 10, 20, 0, 30, 10]))
    info = ingest_to_tiles(p, str(tmp_path / "tiles"), "lulc")
    assert info["nodata_code"] not in (0, 10, 20, 30)
    assert info["nodata_code"] in info["codes"]
    # derived classmap labels the sentinel 'nodata', not class 0
    nodata = info["nodata_code"]
    cm = {c: ("nodata" if c == nodata else str(c)) for c in info["codes"]}
    assert cm[0] == "0" and cm[nodata] == "nodata"


def test_point_poi_requires_buffer_dist(world):
    with pytest.raises(ValueError, match="buffer distance required"):
        gx.get_mean_NDVI(world["documents"], world["tiles"],
                         buffer_dist=None)


def test_ingest_cache_per_user(tmp_path, monkeypatch):
    p = str(tmp_path / "nd.tif")
    _mk_tiff(p, w=2, h=2, res=10.0)
    import tempfile
    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    out, shift, info = api._tiles.__wrapped__(p, "dsm") if hasattr(
        api._tiles, "__wrapped__") else api._tiles(p, "dsm")
    root = tmp_path / f"greenex_cache_{os.getuid()}"
    assert root.is_dir()
    assert (os.stat(root).st_mode & 0o777) == 0o700


def test_plotmap_escapes_title_and_tooltips(tmp_path):
    from greenex_py_ray import plotmap

    out = str(tmp_path / "m.html")
    plotmap.write_map_html(
        out,
        [{"name": "L", "kind": "points",
          "data": [{"doc_id": "<img src=x onerror=alert(1)>",
                    "x": 0.0, "y": 0.0}],
          "tooltip_fields": ["doc_id"]}],
        src_crs="EPSG:3857", title="<script>alert(1)</script>")
    html = open(out).read()
    assert "<script>alert(1)</script>" not in html
    assert "&lt;script&gt;" in html
    # tooltip values go through the DOM escaper, not raw interpolation
    assert "esc(f.properties[k])" in html


def test_plotmap_script_breakout_escaped(tmp_path):
    """A literal '</script>' inside any JSON-interpolated value must not
    terminate the inline script element (json.dumps alone is not
    script-safe; _js escapes '</' as '<\\/')."""
    from greenex_py_ray import plotmap

    payload = "</script><script>alert(1)</script>"
    out = str(tmp_path / "m.html")
    plotmap.write_map_html(
        out,
        [{"name": payload, "kind": "points",
          "data": [{"doc_id": payload, "x": 0.0, "y": 0.0}],
          "tooltip_fields": ["doc_id"]}],
        src_crs="EPSG:3857", title=None)
    html = open(out).read()
    body = html.split("<script>", 1)[1] if "<script>" in html else html
    # the only legitimate '</script>' closes the map script block
    assert body.count("</script>") == 1
    assert "<\\/script>" in body  # the escaped payload survives as JS


def test_rings_list_empty_row_yields_empty_ring():
    """A row whose rings list is EMPTY must map to a (0, 2) ring, not
    silently steal the next row's geometry (or IndexError on the last
    row)."""
    import numpy as np
    import pyarrow as pa

    from greenex_py_ray.stages.coverage import _rings_list

    pt = pa.struct([("x", pa.float64()), ("y", pa.float64())])
    ring_t = pa.list_(pa.list_(pt))
    sq = [[{"x": 0.0, "y": 0.0}, {"x": 1.0, "y": 0.0},
           {"x": 1.0, "y": 1.0}, {"x": 0.0, "y": 1.0}]]
    tri = [[{"x": 5.0, "y": 5.0}, {"x": 6.0, "y": 5.0},
            {"x": 5.0, "y": 6.0}]]
    # empty row in the middle AND at the end
    tbl = pa.table({"rings": pa.array([sq, [], tri, []], ring_t)})
    rings = _rings_list(tbl)
    assert len(rings) == 4
    assert rings[0].shape == (4, 2)
    assert rings[1].shape == (0, 2)
    assert rings[2].shape == (3, 2)  # NOT the empty row's neighbour
    assert np.allclose(rings[2][0], [5.0, 5.0])
    assert rings[3].shape == (0, 2)


def test_gpkg_sink_stamps_working_crs(tmp_path, world):
    """write_to_file + src_crs: coordinates are reprojected into the
    EPSG:3395 working frame, so the .gpkg must be stamped 3395 — not
    the source CRS (metre coords labelled as degrees render off-planet)."""
    import glob
    import os

    from greenex_py_ray import api
    from greenex_py_ray.sources.gpkg import gpkg_crs

    out_dir = str(tmp_path / "gpkg_out")
    api.get_mean_NDVI(
        world["documents"], world["tiles"], buffer_dist=100.0,
        src_crs="EPSG:3857",  # genuinely reprojected into 3395
        write_to_file=True, output_format="gpkg", output_dir=out_dir)
    path = glob.glob(os.path.join(out_dir, "*.gpkg"))[0]
    assert gpkg_crs(path) == "EPSG:3395"
