import numpy as np

from greenex_py_ray import cells, geom


def test_cell_roundtrip():
    x = np.array([0.0, 499.9, 500.0, 12345.6])
    y = np.array([0.0, 10.0, 999.9, 54321.0])
    c = cells.cell_of(x, y, 500.0)
    ix, iy = cells.cell_to_indices(c)
    assert (ix == np.floor(x / 500)).all()
    assert (iy == np.floor(y / 500)).all()


def test_cover_disk_contains_center_cell():
    x = np.array([1234.0, 8000.0])
    y = np.array([777.0, 9000.0])
    idx, cov = cells.cover_disk(x, y, 600.0, 500.0)
    own = cells.cell_of(x, y, 500.0)
    for i in range(2):
        assert own[i] in cov[idx == i]
    # 600 m radius over 500 m cells → 3-4 cells per axis
    assert (np.bincount(idx) >= 9).all()


def test_zorder_distinct_and_local():
    ix = np.arange(100)
    iy = np.arange(100)
    z = cells.zorder(ix, iy)
    assert len(np.unique(z)) == 100


def test_parse_wkt_roundtrip():
    x = np.array([1.5, 2e-3, 19999.125])
    y = np.array([7.25, 0.0, 3.5])
    wkt = geom.format_wkt_points(x, y)
    px, py = geom.parse_wkt_points(wkt)
    assert np.array_equal(px, x)
    assert np.array_equal(py, y)


def test_polygon_area_centroid_square():
    ring = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])
    assert geom.polygon_area(ring) == 4.0
    assert geom.polygon_centroid(ring) == (1.0, 1.0)


def test_points_in_polygon():
    ring = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])
    px = np.array([1.0, 5.0, 3.9, -0.1])
    py = np.array([1.0, 1.0, 3.9, 2.0])
    assert geom.points_in_polygon(px, py, ring).tolist() == [True, False, True, False]


def test_clip_area_convex_half_overlap():
    subject = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])
    clip = np.array([[1.0, 0.0], [3.0, 0.0], [3.0, 2.0], [1.0, 2.0]])
    assert abs(geom.clip_area_convex(subject, clip) - 2.0) < 1e-12


def test_clip_disjoint_is_zero():
    subject = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    clip = np.array([[5.0, 5.0], [6.0, 5.0], [6.0, 6.0], [5.0, 6.0]])
    assert geom.clip_area_convex(subject, clip) == 0.0


def test_buffer_ngon_area_close_to_circle():
    ring = geom.buffer_ngon(10.0, 10.0, 5.0, quad_segs=16)
    area = geom.polygon_area(ring)
    assert abs(area - np.pi * 25.0) / (np.pi * 25.0) < 0.005


def test_interpolate_along():
    line = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0]])
    pts = geom.interpolate_along(line, np.array([0.0, 5.0, 10.0, 15.0, 20.0]))
    assert np.allclose(pts, [[0, 0], [5, 0], [10, 0], [10, 5], [10, 10]])


def test_segments_intersect_circle():
    mask = geom.segments_intersect_circle(
        np.array([0.0, 10.0]), np.array([0.0, 10.0]),
        np.array([10.0, 20.0]), np.array([0.0, 10.0]),
        5.0, 1.0, 2.0,
    )
    assert mask.tolist() == [True, False]
