"""End-to-end parity: Ray zonal pipelines vs a straight-line numpy oracle
that reimplements the reference formulas directly (clamp ≥0, population
std, round 3 — availability.py:289; class % round 3 — :1068-1082)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from greenex_py_ray.pipelines import availability
from greenex_py_ray.sources import documents as doc_src
from greenex_py_ray.sources import synth


def oracle_disk_values(band, x, y, radius):
    res = synth.RASTER_RES
    c0 = int(np.floor((x - radius) / res))
    c1 = int(np.floor((x + radius) / res))
    r0 = int(np.floor((y - radius) / res))
    r1 = int(np.floor((y + radius) / res))
    px = (np.arange(c0, c1 + 1, dtype=np.float64) + 0.5) * res
    py = (np.arange(r0, r1 + 1, dtype=np.float64) + 0.5) * res
    gx, gy = np.meshgrid(px, py, indexing="xy")
    mask = (gx - x) * (gx - x) + (gy - y) * (gy - y) <= radius * radius
    # world clip: only pixels inside the tiled extent exist in the store
    mask &= (gx >= 0) & (gx <= synth.WORLD) & (gy >= 0) & (gy <= synth.WORLD)
    vals = synth._FIELDS[band](gx, gy)[mask]
    return vals


def decode_world_docs(world):
    t = pq.read_table(world["documents"])
    spans = t.column("spans").combine_chunks()
    x, y = doc_src._first_geom_texts(spans)
    return t.column("doc_id").to_pylist(), x, y


def test_decode_geom_matches_source(world):
    doc_ids, x, y = decode_world_docs(world)
    assert len(doc_ids) == 300
    assert np.isfinite(x).all() and np.isfinite(y).all()
    assert (x >= 0).all() and (x < synth.WORLD).all()


def test_mean_ndvi_parity(world):
    radius = 300.0
    doc_ids, x, y = decode_world_docs(world)
    ds = doc_src.decode_geom(doc_src.read_documents(world["documents"]))
    out = (
        availability.mean_ndvi(
            ds.select_columns(["doc_id", "x", "y"]), world["tiles"], radius,
            concurrency=2,
        )
        .to_pandas()
        .set_index("doc_id")
    )
    assert len(out) == len(doc_ids)
    for i in np.random.default_rng(7).choice(len(doc_ids), 40, replace=False):
        vals = np.maximum(oracle_disk_values("ndvi", x[i], y[i], radius), 0.0)
        exp_mean = round(vals.mean(), 3)
        exp_std = round(vals.std(), 3)
        row = out.loc[doc_ids[i]]
        assert row["mean_NDVI"] == exp_mean, (i, row["mean_NDVI"], exp_mean)
        assert row["std_NDVI"] == exp_std, (i, row["std_NDVI"], exp_std)


def test_landcover_parity(world):
    radius = 500.0
    doc_ids, x, y = decode_world_docs(world)
    ds = doc_src.decode_geom(doc_src.read_documents(world["documents"]))
    out = (
        availability.landcover_percentages(
            ds.select_columns(["doc_id", "x", "y"]), world["tiles"], radius,
            concurrency=2,
        )
        .to_pandas()
        .set_index("doc_id")
    )
    classmap = availability.DEFAULT_CLASSMAP
    for i in np.random.default_rng(11).choice(len(doc_ids), 20, replace=False):
        vals = oracle_disk_values("lulc", x[i], y[i], radius)
        total = vals.size
        row = out.loc[doc_ids[i]]
        for cls, name in classmap.items():
            exp = round((vals == cls).sum() / total * 100.0, 3)
            assert row[name] == exp, (i, name, row[name], exp)


def test_span_passthrough(world):
    """Per-row invariant: output spans == input spans, byte-identical."""
    out = availability.get_mean_ndvi_documents(
        world["documents"], world["tiles"], buffer_dist=200.0, concurrency=2
    )
    got = out.to_pandas().set_index("doc_id")
    src = pq.read_table(world["documents"]).to_pandas().set_index("doc_id")
    assert len(got) == len(src)
    for doc_id in src.index[:50]:
        a = src.loc[doc_id, "spans"]
        b = got.loc[doc_id, "spans"]
        assert len(a) == len(b)
        for sa, sb in zip(a, b):
            assert dict(sa) == dict(sb)


def test_line_buffer_zonal_polyline_matches_grid(world):
    """LineZonalLocal on a curved polyline vs brute-force capsule mask."""
    import pyarrow as pa

    from greenex_py_ray.stages.zonal import LineZonalLocal

    g = np.array([[3000.0, 3000.0], [3400.0, 3100.0], [3500.0, 3600.0]])
    batch = pa.table({
        "edge_id": pa.array([5], pa.int64()),
        "ax": pa.array([g[0, 0]]), "ay": pa.array([g[0, 1]]),
        "bx": pa.array([g[-1, 0]]), "by": pa.array([g[-1, 1]]),
        "geom_x": pa.array([g[:, 0].tolist()], pa.list_(pa.float64())),
        "geom_y": pa.array([g[:, 1].tolist()], pa.list_(pa.float64())),
    })
    lz = LineZonalLocal(world["tiles"], "ndvi", buffer_dist=60.0,
                        key_col="edge_id")
    out = lz(batch).to_pandas()
    # brute force: pixel centers within 60 m of any sub-segment
    res = synth.RASTER_RES
    d = 60.0
    c0 = int(np.floor((g[:, 0].min() - d) / res))
    c1 = int(np.floor((g[:, 0].max() + d) / res))
    r0 = int(np.floor((g[:, 1].min() - d) / res))
    r1 = int(np.floor((g[:, 1].max() + d) / res))
    px = (np.arange(c0, c1 + 1) + 0.5) * res
    py = (np.arange(r0, r1 + 1) + 0.5) * res
    gx, gy = np.meshgrid(px, py, indexing="xy")
    fx, fy = gx.ravel(), gy.ravel()
    best = np.full(len(fx), np.inf)
    for s in range(len(g) - 1):
        dx, dy = g[s + 1, 0] - g[s, 0], g[s + 1, 1] - g[s, 1]
        t = np.clip(((fx - g[s, 0]) * dx + (fy - g[s, 1]) * dy)
                    / (dx * dx + dy * dy), 0, 1)
        best = np.minimum(best, (fx - g[s, 0] - t * dx) ** 2
                          + (fy - g[s, 1] - t * dy) ** 2)
    mask = best <= d * d
    vals = np.maximum(synth.field_ndvi(fx[mask], fy[mask]), 0.0)
    assert out.loc[0, "mean_NDVI"] == round(vals.mean(), 3)
    assert out.loc[0, "std_NDVI"] == round(vals.std(), 3)


def test_zonal_median_matches_bruteforce(ray_session, tmp_path):
    """ZonalMedianLocal vs a direct per-point mask + np.median, and
    the DuckDB quantile_cont interpolation identity on even counts."""
    import duckdb

    from greenex_py_ray.sources import synth
    from greenex_py_ray.stages.zonal import MEDIAN_Q, ZonalMedianLocal

    paths = synth.ensure_world(str(tmp_path / "w"), n_docs=20, seed=5)
    rng = np.random.default_rng(8)
    x = rng.uniform(500, 4500, 40)
    y = rng.uniform(500, 4500, 40)
    batch = pa.table({"doc_id": pa.array([f"p{i}" for i in range(40)]),
                      "x": pa.array(x), "y": pa.array(y)})
    out = ZonalMedianLocal(paths["tiles"], "ndvi", 120.0)(batch)

    res = synth.RASTER_RES
    for i in range(40):
        c0 = int(np.floor((x[i] - 120.0) / res))
        c1 = int(np.floor((x[i] + 120.0) / res))
        r0 = int(np.floor((y[i] - 120.0) / res))
        r1 = int(np.floor((y[i] + 120.0) / res))
        cs = np.arange(c0, c1 + 1)
        rs = np.arange(r0, r1 + 1)
        cx = cs * res + res / 2.0
        cy = rs * res + res / 2.0
        vals = []
        for rr, yy in zip(rs, cy):
            for cc, xx in zip(cs, cx):
                if (xx - x[i]) ** 2 + (yy - y[i]) ** 2 <= 120.0 ** 2:
                    v = float(synth.field_ndvi(np.array([xx]),
                                               np.array([yy]))[0])
                    vals.append(np.floor(max(v, 0.0) * MEDIAN_Q + 0.5))
        exp = np.median(np.array(vals, dtype=np.int64))
        assert out.column("median_q")[i].as_py() == exp
        assert out.column("n_pix")[i].as_py() == len(vals)

    # even-count interpolation: numpy (a+b)/2 == duckdb quantile_cont
    got = duckdb.sql(
        "SELECT quantile_cont(v, 0.5) FROM (VALUES (3), (8)) t(v)"
    ).fetchone()[0]
    assert got == np.median(np.array([3, 8], dtype=np.int64)) == 5.5
