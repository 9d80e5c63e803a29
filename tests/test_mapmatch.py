"""Map matching (stages/mapmatch): grid-index snap vs dense brute force."""

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _world(n_pts=800, n_seg=60, seed=9, world=10_000.0):
    rng = np.random.default_rng(seed)
    px = rng.uniform(0, world, n_pts)
    py = rng.uniform(0, world, n_pts)
    ax = rng.uniform(0, world, n_seg)
    ay = rng.uniform(0, world, n_seg)
    bx = ax + rng.uniform(-800, 800, n_seg)
    by = ay + rng.uniform(-800, 800, n_seg)
    ek = rng.permutation(np.arange(100, 100 + n_seg)).astype(np.int64)
    return px, py, pa.table({"edge_key": pa.array(ek), "ax": pa.array(ax),
                             "ay": pa.array(ay), "bx": pa.array(bx),
                             "by": pa.array(by)})


def _brute(px, py, edges, radius):
    ek = edges.column("edge_key").to_numpy()
    o = np.argsort(ek)
    ek = ek[o]
    ax = edges.column("ax").to_numpy()[o]
    ay = edges.column("ay").to_numpy()[o]
    dx = edges.column("bx").to_numpy()[o] - ax
    dy = edges.column("by").to_numpy()[o] - ay
    len2 = dx * dx + dy * dy
    out = {}
    for i in range(len(px)):
        dot = (px[i] - ax) * dx + (py[i] - ay) * dy
        t = np.divide(dot, len2, out=np.zeros_like(dot), where=len2 != 0.0)
        tc = np.minimum(np.maximum(t, 0.0), 1.0)
        ex = px[i] - (ax + tc * dx)
        ey = py[i] - (ay + tc * dy)
        d2 = ex * ex + ey * ey
        j = int(np.argmin(d2))
        if d2[j] <= radius * radius:
            out[i] = (int(ek[j]), float(tc[j]), float(np.sqrt(d2[j])))
    return out


def test_snap_matches_bruteforce(ray_session):
    from greenex_py_ray.stages.mapmatch import snap_to_segments

    px, py, edges = _world()
    radius = 600.0
    pts = pa.table({"doc_id": pa.array(np.arange(len(px), dtype=np.int64)),
                    "x": pa.array(px), "y": pa.array(py)})
    out = (snap_to_segments(ray.data.from_arrow(pts).repartition(6),
                            edges, radius)
           .to_pandas().set_index("doc_id").sort_index())

    exp = _brute(px, py, edges, radius)
    assert set(out.index) == set(exp)
    for i, (ek, tc, d) in exp.items():
        assert out.loc[i, "edge_key"] == ek
        assert out.loc[i, "snap_t"] == tc
        assert out.loc[i, "snap_dist"] == d


def test_snap_zero_length_segment(ray_session):
    """A degenerate A==B segment snaps as a point (t=0) without a
    divide-by-zero."""
    from greenex_py_ray.stages.mapmatch import snap_to_segments

    edges = pa.table({"edge_key": pa.array([7], pa.int64()),
                      "ax": pa.array([100.0]), "ay": pa.array([100.0]),
                      "bx": pa.array([100.0]), "by": pa.array([100.0])})
    pts = pa.table({"doc_id": pa.array([1], pa.int64()),
                    "x": pa.array([103.0]), "y": pa.array([104.0])})
    out = snap_to_segments(ray.data.from_arrow(pts), edges, 50.0).to_pandas()
    assert len(out) == 1
    assert out["snap_t"][0] == 0.0
    assert out["snap_dist"][0] == 5.0
