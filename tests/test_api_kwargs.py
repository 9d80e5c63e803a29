"""Reference-parity kwargs added in round 3: ``min_greenspace_area`` /
``network_type`` (accessibility.py:81-84,129-131,142-149),
``write_to_file`` / ``output_dir`` / ``plot_aoi`` (every entry,
availability.py:294-300), ``crop_by_road_centres``
(visibility.py:906-949)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

import greenex_py_ray as gx
from greenex_py_ray import api


def _poi_ids(n=40):
    return [f"doc-{i:08d}" for i in range(n)]


def test_min_greenspace_area_equals_prefiltered(world, tmp_path):
    gs = pq.read_table(world["greenspace"])
    thresh = float(np.median(gs.column("area").to_numpy()))
    pre = gs.filter(pc.greater_equal(gs.column("area"), thresh))
    assert 0 < len(pre) < len(gs)
    prefile = str(tmp_path / "gs_pre.parquet")
    pq.write_table(pre, prefile)
    cols = ["doc_id", "distance_to_greenspace"]
    a = (gx.get_shortest_distance_greenspace(
            world["documents"], world["greenspace"], target_dist=500.0,
            min_greenspace_area=thresh)
         .to_pandas()[cols].sort_values("doc_id").reset_index(drop=True))
    b = (gx.get_shortest_distance_greenspace(
            world["documents"], prefile, target_dist=500.0)
         .to_pandas()[cols].sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)


def test_min_greenspace_area_validation(world):
    with pytest.raises(ValueError):
        gx.get_shortest_distance_greenspace(
            world["documents"], world["greenspace"],
            min_greenspace_area=-5)


def test_network_type_validation_and_filter(world):
    with pytest.raises(ValueError):
        gx.get_shortest_distance_greenspace(
            world["documents"], world["greenspace"], network_type="boat")
    # no highway column on the edges table → explicit error, not a
    # silent no-op
    edges = pq.read_table(world["network_edges"])
    with pytest.raises(ValueError):
        api._filter_network_type(edges, "walk")
    # with a highway column: excluded classes are dropped, others kept
    hw = ["residential", "motorway", "footway", "cycleway"] * (
        len(edges) // 4 + 1)
    tagged = edges.append_column(
        "highway", pa.array(hw[: len(edges)]))
    walk = api._filter_network_type(tagged, "walk")
    assert "motorway" not in walk.column("highway").to_pylist()
    assert "footway" in walk.column("highway").to_pylist()
    drive = api._filter_network_type(tagged, "drive")
    assert "footway" not in drive.column("highway").to_pylist()
    assert "motorway" in drive.column("highway").to_pylist()
    assert api._filter_network_type(tagged, "all") is tagged


def test_write_to_file_roundtrip(world, tmp_path):
    out = str(tmp_path / "results")
    ds = gx.get_mean_NDVI(world["documents"], world["tiles"],
                          buffer_dist=150.0, write_to_file=True,
                          output_dir=out)
    df = ds.to_pandas()
    written = pads.dataset(
        [os.path.join(out, "mean_NDVI", f)
         for f in os.listdir(os.path.join(out, "mean_NDVI"))
         if f.endswith(".parquet")]).to_table().to_pandas()
    cols = ["doc_id", "mean_NDVI", "std_NDVI"]
    assert (written[cols].sort_values("doc_id").reset_index(drop=True)
            .equals(df[cols].sort_values("doc_id").reset_index(drop=True)))


def test_plot_aoi_writes_leaflet_html(world, tmp_path):
    out = str(tmp_path / "plots")
    gx.get_mean_NDVI(world["documents"], world["tiles"], buffer_dist=150.0,
                     plot_aoi=True, output_dir=out)
    html = open(os.path.join(out, "mean_NDVI_aoi.html")).read()
    assert "L.geoJSON" in html and "Polygon" in html  # buffer rings


def test_crop_by_road_centres_quarters_kernel():
    from greenex_py_ray.stages.visibility import FakeSegmentation, SegmentationGVI

    scorer = SegmentationGVI(crop_by_road_centres=False)
    seg = FakeSegmentation().segment("img-00000042")
    got = scorer._gvi_pano_quarters(seg)
    # manual crop arithmetic (visibility.py:855-873 over the
    # bottom-20%-cropped segmentation)
    s = seg[: int(seg.shape[0] * 0.8), :]
    hh, ww = s.shape
    w4, h4 = ww // 4, hh // 4
    h43 = int(w4 * 3 / 4)
    band = s[h4:h4 + h43, : 4 * w4]
    assert got == (band == 8).sum() / band.size


def test_crop_by_road_centres_api_smoke(world):
    rollup, _ = gx.get_streetview_GVI(
        world["documents"], world["network_nodes"], world["network_edges"],
        world["image_features"], buffer_dist=150.0,
        crop_by_road_centres=False, concurrency=2)
    df = rollup.to_pandas()
    ok = df["GVI"].dropna()
    assert len(ok) and ((ok >= 0) & (ok <= 1)).all()
