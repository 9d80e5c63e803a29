"""Reference-parity public API.

The reference package exposes exactly seven functions
(`/root/reference/README.md:28-33`, one Documentation/*.md each):

    availability:  get_mean_NDVI, get_landcover_percentages,
                   get_canopy_percentage, get_greenspace_percentage
    accessibility: get_shortest_distance_greenspace
    visibility:    get_viewshed_GVI, get_streetview_GVI

This module mirrors those names and their kwargs over the
interleaved-document table: ``poi`` is a path to (or Dataset of) the
spans documents table; side inputs are paths to the corresponding
parquet side tables (the analog of the reference's
``*_vector_file`` / ``*_raster_file`` / ``network_file`` overrides,
SURVEY §2.10).  Results come back as Ray Datasets carrying the original
``spans`` untouched plus the reference's metric columns (same names,
same rounding, same stringified percent formats).

Argument validation follows the reference (M5): positive distances,
enum checks, speed/time → buffer_dist conversion
(``travel_speed * 1000 / 60 * trip_time``, availability.py:117-119).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow.parquet as pq

import ray.data

from .functions.joins import bucket_join_attach
from .pipelines import accessibility as _acc
from .pipelines import availability as _av
from .pipelines import visibility as _vis
from .sources import documents as doc_src


def _validate_positive(name: str, value) -> None:
    if value is None:
        return
    if not isinstance(value, (int, float)) or value <= 0:
        raise TypeError(f"{name} must be a positive number, got {value!r}")


def _resolve_buffer(buffer_dist, travel_speed, trip_time):
    """Speed/time → buffer distance (availability.py:96-125)."""
    if travel_speed is not None or trip_time is not None:
        if buffer_dist is not None:
            raise ValueError("provide either buffer_dist or travel_speed+trip_time")
        _validate_positive("travel_speed", travel_speed)
        _validate_positive("trip_time", trip_time)
        return travel_speed * 1000 / 60 * trip_time
    _validate_positive("buffer_dist", buffer_dist)
    return buffer_dist


def _docs_from_gpkg(path: str) -> "ray.data.Dataset":
    """GeoPackage point layer → a spans-documents-shaped Dataset.

    Reference users hand every function a ``.gpkg`` path
    (``gpd.read_file``, availability.py:45-48); this adapter reads it
    with the stdlib GPKG reader and wraps each point as a one-geom-span
    document, so every downstream stage (decode, joins, span
    passthrough) runs unchanged.  ``doc_id`` follows the reference's id
    assignment (M4): the layer's ``id`` column when present and
    non-null, else 1..n in file order."""
    import pyarrow as pa

    from .sources.gpkg import read_gpkg

    t = read_gpkg(path)
    n = t.num_rows
    if "id" in t.column_names and t.column("id").null_count == 0:
        ids = [str(v) for v in t.column("id").to_pylist()]
    else:
        ids = [str(i + 1) for i in range(n)]
    x = t.column("x").to_pylist()
    y = t.column("y").to_pylist()
    spans = [[{"kind": "geom", "text": f"POINT({x[i]!r} {y[i]!r})",
               "media_ref": "", "offset": 0}] for i in range(n)]
    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()), ("offset", pa.int32())])
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.string()),
        "spans": pa.array(spans, pa.list_(span_t)),
    }))


def _poi(poi) -> "ray.data.Dataset":
    if isinstance(poi, str) and poi.lower().endswith(".gpkg"):
        return _docs_from_gpkg(poi)
    docs = doc_src.read_documents(poi) if isinstance(poi, str) else poi
    return docs


def _poi_crs(poi) -> str | None:
    """CRS tag of a ``.gpkg`` PoI input (None for spans tables, which
    live in the engine's working frame) — the target CRS for vector
    side inputs, like the reference's ``to_crs(poi.crs)``."""
    if isinstance(poi, str) and poi.lower().endswith(".gpkg"):
        from .sources.gpkg import gpkg_crs

        return gpkg_crs(poi)
    return None


def _vector_table(src, dst_crs: str | None = None):
    """Polygon side input: parquet rings table, or a ``.gpkg`` polygon
    layer converted into the engine's rings model (reprojected to the
    PoI CRS like the reference's ``to_crs``, availability.py:633-637)
    with area/centroid columns appended."""
    if not (isinstance(src, str) and src.lower().endswith(".gpkg")):
        return pq.read_table(src)
    import numpy as np
    import pyarrow as pa

    from . import geom
    from .sources.gpkg import polygons_to_rings, read_gpkg

    t = polygons_to_rings(read_gpkg(src), dst_crs=dst_crs)
    areas, cxs, cys = [], [], []
    for rlist in t.column("rings").to_pylist():
        rings = [np.array([[p["x"], p["y"]] for p in ring]) for ring in rlist]
        a, cx, cy = geom.overlay_moments([rings], "union")
        areas.append(a)
        cxs.append(cx)
        cys.append(cy)
    return (t.append_column("area", pa.array(areas, pa.float64()))
             .append_column("centroid_x", pa.array(cxs, pa.float64()))
             .append_column("centroid_y", pa.array(cys, pa.float64())))


#: ESA WorldCover class legend (public; the reference's only landcover
#: source is the esa-worldcover collection, availability.py:439, whose
#: STAC classification metadata carries exactly these descriptions)
_WORLDCOVER_LEGEND = {
    10: "Tree cover", 20: "Shrubland", 30: "Grassland", 40: "Cropland",
    50: "Built-up", 60: "Bare / sparse vegetation", 70: "Snow and ice",
    80: "Permanent water bodies", 90: "Herbaceous wetland",
    95: "Mangroves", 100: "Moss and lichen",
}


def _tiles(src: str, band: str):
    """Raster side input: a tile-store dir, or a ``.tif`` ingested into
    one (cached under /tmp keyed by path+mtime).  Returns
    ``(tile_dir, (shift_x, shift_y))`` — the translation into the tile
    store's local frame, to be applied to the PoI coordinates (areas and
    distances are translation-invariant)."""
    if not (isinstance(src, str) and src.lower().endswith((".tif", ".tiff"))):
        return src, (0.0, 0.0), {}
    import hashlib
    import json
    import os

    from .sources.geotiff import ingest_to_tiles

    import tempfile

    st = os.stat(src)
    key = hashlib.md5(
        f"{os.path.abspath(src)}:{st.st_mtime_ns}:{band}".encode()
    ).hexdigest()[:12]
    # per-user 0700 cache root: a predictable world-writable /tmp path
    # could be pre-created by another local user, making the engine
    # silently trust attacker-controlled tiles (round-3 advice)
    root = os.path.join(tempfile.gettempdir(),
                        f"greenex_cache_{os.getuid()}")
    os.makedirs(root, mode=0o700, exist_ok=True)
    rst = os.stat(root)
    if rst.st_uid != os.getuid():
        raise PermissionError(
            f"ingest cache dir {root} is owned by uid {rst.st_uid}, "
            "not the current user — refusing to trust it")
    os.chmod(root, 0o700)
    out = os.path.join(root, f"ingest_{key}")
    marker = os.path.join(out, "DONE")
    if os.path.exists(marker) and os.stat(out).st_uid != os.getuid():
        raise PermissionError(
            f"cached ingest {out} is not owned by the current user")
    if not os.path.exists(marker):
        info = ingest_to_tiles(src, out, band)
        with open(marker, "w") as f:
            json.dump(info, f)
    with open(marker) as f:
        info = json.load(f)
    from .sources import synth as _synth

    if abs(info["res"] - _synth.RASTER_RES) > 1e-9:
        raise ValueError(
            f"{src}: pixel size {info['res']} != the engine lattice "
            f"{_synth.RASTER_RES}; regrid first (stages/regrid.py)"
        )
    return out, (float(info["shift_x"]), float(info["shift_y"])), info


def _shift_xy(pts: "ray.data.Dataset", dx: float, dy: float):
    """Translate the decoded coordinate columns (``x``/``y`` and, when
    present, the ``ring_x``/``ring_y`` polygon columns) into the tile
    store's local frame."""
    if dx == 0.0 and dy == 0.0:
        return pts

    def add(b: "pa.Table") -> "pa.Table":
        return _shift_table(b, dx, dy, xcols=("x", "ring_x"),
                            ycols=("y", "ring_y"))

    return pts.map_batches(add, batch_format="pyarrow")


def _shift_table(tab: "pa.Table", dx: float, dy: float,
                 xcols=("x",), ycols=("y",)) -> "pa.Table":
    """Translate coordinate columns of a small side-input pa.Table into
    the tile store's local frame (the same shift `_shift_xy` applies to
    the PoI stream — graph nodes / edge geometries must move WITH the
    points or snapping and raster windows run in mismatched frames).
    Handles plain float64 columns and list<double> polyline columns."""
    if dx == 0.0 and dy == 0.0:
        return tab
    import pyarrow as pa
    import pyarrow.compute as pc

    def add(col, d):
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            ca = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            cls = (pa.LargeListArray if pa.types.is_large_list(ca.type)
                   else pa.ListArray)
            mask = ca.is_null() if ca.null_count else None
            # keep the list flavor and the validity bitmap — from_arrays
            # without a mask would silently turn null rows into []
            return cls.from_arrays(
                ca.offsets, pc.add(ca.values, pa.scalar(d, pa.float64())),
                mask=mask)
        return pc.add(col, pa.scalar(d, pa.float64()))

    for names, d in ((xcols, dx), (ycols, dy)):
        for name in names:
            if name in tab.column_names:
                i = tab.schema.get_field_index(name)
                tab = tab.set_column(i, name, add(tab.column(name), d))
    return tab


def _attach(docs, metrics):
    return bucket_join_attach(docs, metrics, key="doc_id")


#: OSM highway-class exclusions per network_type — the engine's analog
#: of the reference's osmnx download filter (accessibility.py:142-149),
#: following osmnx 1.x's published filter strings restricted to the
#: highway tag (walk drops motorways+cycleways but NOT trunk; bike
#: drops motorways+foot-only ways but NOT trunk; drive drops every
#: non-motor class).  Applied to the edges table's ``highway`` column.
_NETWORK_TYPE_EXCLUDES = {
    "all": frozenset(),
    "walk": frozenset({"motorway", "motorway_link", "cycleway",
                       "bus_guideway", "construction", "abandoned",
                       "planned", "platform", "proposed", "raceway"}),
    "bike": frozenset({"motorway", "motorway_link", "footway", "steps",
                       "corridor", "elevator", "escalator",
                       "bus_guideway", "construction", "abandoned",
                       "planned", "platform", "proposed", "raceway"}),
    "drive": frozenset({"footway", "path", "pedestrian", "cycleway",
                        "steps", "corridor", "bridleway", "track",
                        "elevator", "escalator", "bus_guideway",
                        "construction", "abandoned", "planned",
                        "platform", "proposed", "raceway", "service"}),
}


def _filter_network_type(edges: "pa.Table", network_type: str) -> "pa.Table":
    """Validate ``network_type`` (accessibility.py:142-144) and filter
    the edges table by its ``highway`` column.  File-based networks
    without a ``highway`` column must already be of the requested type —
    asking for a subtype then is an error, not a silent no-op."""
    if network_type not in ("walk", "bike", "drive", "all"):
        raise ValueError(
            "network_type must be 'walk', 'bike', 'drive' or 'all'")
    if network_type == "all":
        return edges
    if "highway" not in edges.column_names:
        raise ValueError(
            f"network_type={network_type!r} needs a 'highway' column on "
            "the edges table to filter by (or pass a pre-filtered "
            f"{network_type} network with network_type='all')")
    import pyarrow as pa
    import pyarrow.compute as pc

    drop = pa.array(sorted(_NETWORK_TYPE_EXCLUDES[network_type]))
    return edges.filter(
        pc.invert(pc.is_in(edges.column("highway"), value_set=drop)))


def _gs_polys(gs: "pa.Table") -> list:
    """Greenspace rows → list of polygons (lists of ``(N, 2)`` ring
    arrays) for the driver dissolve.  Built from the Arrow flat ring
    buffers via :func:`~greenex_py_ray.stages.dissolve.flat_rings_table`
    — numpy slices per ring, never per-vertex Python."""
    import numpy as np

    from .stages.dissolve import flat_rings_table

    flat = flat_rings_table(gs)
    rx = flat.column("ring_x").combine_chunks()
    xs = rx.values.to_numpy(zero_copy_only=False)
    ys = (flat.column("ring_y").combine_chunks()
          .values.to_numpy(zero_copy_only=False))
    row_off = rx.offsets.to_numpy()
    sizes_col = flat.column("ring_sizes").combine_chunks()
    sizes = sizes_col.values.to_numpy(zero_copy_only=False)
    size_off = sizes_col.offsets.to_numpy()
    out = []
    for i in range(len(flat)):
        rings = []
        s = row_off[i]
        for sz in sizes[size_off[i]:size_off[i + 1]]:
            rings.append(np.column_stack([xs[s:s + sz], ys[s:s + sz]]))
            s += sz
        out.append(rings)
    return out


def _dissolve_units(gs: "pa.Table") -> "pa.Table":
    """accessibility.py:125-128: the reference merges overlapping
    greenspaces into one unit (``unary_union`` + dissolve) before any
    distance computation.  Each row keeps its stored boundary geometry
    (entrance detection tests member boundaries — interior shared
    boundaries of a merged unit still count, a documented deviation)
    but carries its dissolved blob's id (first member's id, the
    reference's ``aggfunc='first'``), exact union centroid and union
    area, so ``destination='centroids'`` measures to the MERGED unit's
    centroid and ``min_greenspace_area`` thresholds merged-unit areas.
    Identity on disjoint tables."""
    import numpy as np
    import pyarrow as pa

    from .stages.dissolve import dissolve_polygons

    if not len(gs):
        return gs
    if len(gs) > _DISSOLVE_DRIVER_MAX:
        return _dissolve_units_distributed(gs)
    has_cen = ("centroid_x" in gs.column_names
               and "centroid_y" in gs.column_names)
    has_area = "area" in gs.column_names
    blobs = dissolve_polygons(_gs_polys(gs))
    if has_cen and has_area and all(
            len(m) == 1 for m in blobs["member_ids"]):
        return gs
    # stored gs_id/centroid/area of single-member (disjoint) rows are
    # preserved, so adding an unrelated overlap elsewhere in the table
    # never changes a disjoint row's answer; MERGED blobs get their
    # exact union moments, and ABSENT columns are synthesized for every
    # row from its blob (a singleton blob's moments ARE the row's) —
    # always into fresh float64 arrays so integer-typed stored columns
    # can't truncate union values
    n = len(gs)
    ids = gs.column("gs_id").to_numpy(zero_copy_only=False)
    rep = ids.copy()
    cx = (gs.column("centroid_x").to_numpy(zero_copy_only=False)
          .astype(np.float64) if has_cen else np.empty(n))
    cy = (gs.column("centroid_y").to_numpy(zero_copy_only=False)
          .astype(np.float64) if has_cen else np.empty(n))
    area = (gs.column("area").to_numpy(zero_copy_only=False)
            .astype(np.float64) if has_area else np.empty(n))
    for bi, members in enumerate(blobs["member_ids"]):
        merged = len(members) >= 2
        m = np.asarray(members, dtype=np.int64)
        if merged:
            rep[m] = ids[m.min()]
        if merged or not has_cen:
            cx[m] = blobs["centroid_x"][bi]
            cy[m] = blobs["centroid_y"][bi]
        if merged or not has_area:
            area[m] = blobs["area"][bi]
    cols = dict(zip(gs.column_names, gs.columns))
    cols["gs_id"] = pa.array(rep)
    cols["centroid_x"] = pa.array(cx)
    cols["centroid_y"] = pa.array(cy)
    cols["area"] = pa.array(area)
    return pa.table(cols)


#: Above this many greenspace rows the API dissolve routes through the
#: distributed cell-shuffle path (mirrors near_dedup's driver_threshold
#: pattern, stages/dedup.py) instead of the driver union-find.  The
#: env override exists so tests can force the distributed branch on
#: small tables.
import os as _os

_DISSOLVE_DRIVER_MAX = int(
    _os.environ.get("GREENEX_DISSOLVE_DRIVER_MAX", "200000"))


def _dissolve_units_distributed(gs: "pa.Table") -> "pa.Table":
    """Scale path of :func:`_dissolve_units`: the same per-row
    (gs_id, centroid, area) rewrite, but with overlap pairs, connected
    components and blob union moments computed by
    :func:`~greenex_py_ray.stages.dissolve.dissolve_dataset`
    (``per_member=True``) instead of the driver union-find.  Keys are
    row positions (the driver path's positional ids) so stored
    ``gs_id`` values need not be unique; blob members are processed in
    row order in BOTH paths, so union moments are bit-identical
    (parity-tested in tests/test_api_kwargs.py)."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from .stages.dissolve import dissolve_dataset, flat_rings_table

    n = len(gs)
    has_cen = ("centroid_x" in gs.column_names
               and "centroid_y" in gs.column_names)
    has_area = "area" in gs.column_names
    polys = ray.data.from_arrow(flat_rings_table(gs, key_col="__row"))
    mem = dissolve_dataset(polys, key_col="__row",
                           per_member=True).to_pandas()
    rows = mem["__row"].to_numpy()
    inv = np.empty(n, dtype=np.int64)
    inv[rows] = np.arange(len(rows))
    rep_row = mem["rep_id"].to_numpy()[inv]
    nm = mem["n_members"].to_numpy()[inv]
    b_area = mem["area"].to_numpy()[inv]
    b_cx = mem["centroid_x"].to_numpy()[inv]
    b_cy = mem["centroid_y"].to_numpy()[inv]
    if has_cen and has_area and not (nm >= 2).any():
        return gs
    ids = gs.column("gs_id").to_numpy(zero_copy_only=False)
    rep = ids.copy()
    cx = (gs.column("centroid_x").to_numpy(zero_copy_only=False)
          .astype(np.float64) if has_cen else np.empty(n))
    cy = (gs.column("centroid_y").to_numpy(zero_copy_only=False)
          .astype(np.float64) if has_cen else np.empty(n))
    area = (gs.column("area").to_numpy(zero_copy_only=False)
            .astype(np.float64) if has_area else np.empty(n))
    merged = nm >= 2
    rep[merged] = ids[rep_row[merged]]
    cmask = merged if has_cen else np.ones(n, dtype=bool)
    amask = merged if has_area else np.ones(n, dtype=bool)
    cx[cmask] = b_cx[cmask]
    cy[cmask] = b_cy[cmask]
    area[amask] = b_area[amask]
    cols = dict(zip(gs.column_names, gs.columns))
    cols["gs_id"] = pa.array(rep)
    cols["centroid_x"] = pa.array(cx)
    cols["centroid_y"] = pa.array(cy)
    cols["area"] = pa.array(area)
    return pa.table(cols)


def _min_area_filter(gs: "pa.Table", min_area) -> "pa.Table":
    """accessibility.py:81-84,129-131: keep units with area >=
    ``min_greenspace_area`` — applied AFTER :func:`_dissolve_units`, so
    the ``area`` column already holds merged-unit union areas."""
    if min_area is None:
        return gs
    if not isinstance(min_area, (int, float)) or min_area <= 0:
        raise ValueError(
            "min_greenspace_area must be a positive number")
    import pyarrow.compute as pc

    if "area" in gs.column_names:
        area = gs.column("area")
    else:  # rect side tables (rings tables get 'area' from the dissolve)
        area = pc.multiply(
            pc.subtract(gs.column("x1"), gs.column("x0")),
            pc.subtract(gs.column("y1"), gs.column("y0")))
    return gs.filter(pc.greater_equal(area, float(min_area)))


def _emit(ds, name: str, docs, src_crs, write_to_file: bool,
          output_dir, plot_aoi: bool, buffer_dist=None,
          output_format: str = "parquet"):
    """Shared ``write_to_file`` / ``output_dir`` / ``plot_aoi`` tail —
    every reference entry writes its result GPKG and plots the AoI
    (availability.py:294-300, accessibility.py:185-204).  Here: a
    resumable key-partitioned parquet set (S13) by default, or — with
    ``output_format='gpkg'`` — a single GeoPackage like the reference's
    ``to_file`` (accessibility.py:173-180), with the PoI geometry
    re-attached so QGIS/geopandas read it directly.  Both default OFF
    (a documented deviation: a streaming engine must not write the CWD
    by default).  The GPKG sink is driver-side by design (one sqlite
    file of per-PoI metric rows — the QGIS-interop path, not the scale
    path)."""
    if not (write_to_file or plot_aoi):
        return ds
    import os

    if output_format not in ("parquet", "gpkg"):
        raise ValueError("output_format must be 'parquet' or 'gpkg'")
    out = output_dir or os.getcwd()
    os.makedirs(out, exist_ok=True)
    if write_to_file and output_format == "gpkg":
        import pandas as pd
        import pyarrow as pa

        import ray as _ray

        from .sources.gpkg import write_gpkg

        ds = ds.materialize()
        tbl = pa.concat_tables(
            [_ray.get(r) for r in ds.to_arrow_refs()],
            promote_options="default")
        flat = tbl.select([c for c in tbl.column_names
                           if not pa.types.is_nested(
                               tbl.schema.field(c).type)])
        poly = _geom_kind(docs) in ("POLYGON", "MULTIPOLYGON")
        geo_cols = (["doc_id", "ring_x", "ring_y", "ring_sizes"]
                    if poly else ["doc_id", "x", "y"])
        gt = pa.concat_tables(
            [_ray.get(r) for r in docs.map_batches(
                doc_src.DecodeGeom(parse_polygons=poly, src_crs=src_crs),
                batch_format="pyarrow", zero_copy_batch=True,
            ).select_columns(geo_cols).materialize().to_arrow_refs()],
            promote_options="default")
        idx = pd.Index(gt.column("doc_id").to_pylist()).get_indexer(
            flat.column("doc_id").to_pylist())
        if (idx < 0).any():
            raise ValueError("result rows with no matching PoI geometry")
        aligned = gt.take(pa.array(idx))
        for c in geo_cols[1:]:
            flat = flat.append_column(c, aligned.column(c))
        # DecodeGeom reprojected src_crs inputs into its EPSG:3395
        # working frame above, so the written coordinates are ALWAYS
        # 3395 metres — stamping the file with src_crs would label
        # metre coordinates as e.g. degrees and place features
        # off-planet in QGIS
        write_gpkg(flat, os.path.join(out, f"{name}.gpkg"), layer=name,
                   crs="EPSG:3395")
    elif write_to_file:
        from .lineage import resumable_write

        ds = ds.materialize()
        resumable_write(ds, os.path.join(out, name), key="doc_id")
    if plot_aoi:
        from . import plotmap

        poly = _geom_kind(docs) in ("POLYGON", "MULTIPOLYGON")
        pts = docs.map_batches(
            doc_src.DecodeGeom(parse_polygons=poly, src_crs=src_crs),
            batch_format="pyarrow", zero_copy_batch=True,
        ).select_columns(["doc_id", "x", "y"]).limit(10_000)
        rows = pts.take_all()
        kind = "points"
        if buffer_dist:
            rows = [dict(r, radius=float(buffer_dist)) for r in rows]
            kind = "buffers"
        # DecodeGeom reprojects src_crs inputs into its EPSG:3395
        # working frame — the plot transform must start from THAT
        # frame, not the input's; without a src_crs the synthetic
        # working frame has no real CRS, so label it spherical-Mercator
        # metres as the closest visualization approximation
        plotmap.write_map_html(
            os.path.join(out, f"{name}_aoi.html"),
            [{"name": "PoI", "data": rows, "kind": kind,
              "tooltip_fields": ["doc_id"]}],
            src_crs="EPSG:3395" if src_crs else "EPSG:3857",
            title=name,
        )
    return ds


def _geom_kind(docs) -> str:
    """Geometry type of the first PoI row's first geom span — the
    reference samples ``poi.iloc[0]['geometry'].geom_type``
    (availability.py:80-82); homogeneity is validated separately (M1,
    :func:`~greenex_py_ray.sources.documents.validate_geometry_homogeneous`)."""
    rows = docs.limit(1).take(1)
    if rows:
        for span in rows[0]["spans"]:
            if span["kind"] == "geom":
                return span["text"].split("(", 1)[0].strip().upper()
    return "POINT"


def _route_poi(docs, src_crs, polygon_type, buffer_type, dist):
    """Geometry dispatch shared by the four availability functions
    (availability.py:80-125, 230-247).  Returns ``(mode, decoded)``:

    * ``("point", pts)`` — point PoIs (or polygon PoIs collapsed to
      centroids: ``polygon_type='house'``, or ``buffer_type='network'``
      where isochrones need a seed point); columns ``doc_id, x, y``.
    * ``("polygon", polys)`` — ``polygon_type='neighbourhood'`` rows
      whose own (optionally euclidean-dilated) polygon is the AoI;
      columns ``doc_id, ring_x, ring_y, ring_sizes``.
    """
    if buffer_type is not None and buffer_type not in ("euclidean", "network"):
        raise ValueError("buffer_type must be 'euclidean', 'network' or None")
    kind = _geom_kind(docs)
    is_poly = kind in ("POLYGON", "MULTIPOLYGON")
    if (buffer_type == "euclidean" and dist is None
            and (not is_poly or polygon_type == "house")):
        # the reference raises this BEFORE any geometry work
        # (availability.py:97-99); without it a point-mode call with
        # buffer_dist=None crashed deep in the zonal kernel with an
        # obscure TypeError ('house' polygons collapse to centroid
        # points, so the point rule applies to them too)
        raise ValueError(
            "buffer distance required for point geometries "
            "(buffer_type='euclidean' needs a positive buffer_dist, or "
            "travel_speed + trip_time)")
    if is_poly:
        if polygon_type not in ("neighbourhood", "house"):
            raise ValueError(
                "polygon_type must be 'neighbourhood' or 'house'")
        decoded = docs.map_batches(
            doc_src.DecodeGeom(parse_polygons=True, src_crs=src_crs),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        if polygon_type == "house" or buffer_type == "network":
            # centroid conversion (availability.py:90-94, 241-247); after
            # it the rows ARE points, so the reference's point check
            # (availability.py:97-99) applies: a buffer type is required
            if buffer_type is None:
                raise ValueError(
                    "buffer_type must be 'euclidean' or 'network' when "
                    "polygon_type='house' (centroids are points)")
            return "point", decoded.select_columns(["doc_id", "x", "y"])
        if buffer_type == "euclidean" and dist is None:
            raise ValueError(
                "buffer_dist must be set when buffer_type='euclidean'")
        return "polygon", decoded.select_columns(
            ["doc_id", "ring_x", "ring_y", "ring_sizes"])
    if buffer_type is None:
        raise ValueError(
            "buffer_type must be 'euclidean' or 'network' for point PoIs")
    pts = doc_src.decode_geom(docs, src_crs=src_crs).select_columns(
        ["doc_id", "x", "y"])
    return "point", pts


def get_mean_NDVI(poi, ndvi_tile_dir: str, buffer_dist: float | None = 300.0,
                  buffer_type: str | None = "euclidean",
                  polygon_type: str = "neighbourhood",
                  network_type: str = "all",
                  network_nodes_file: str | None = None,
                  network_edges_file: str | None = None,
                  travel_speed: float | None = None,
                  trip_time: float | None = None,
                  plot_aoi: bool = False, write_to_file: bool = False,
                  output_dir: str | None = None,
                  output_format: str = "parquet",
                  concurrency: int | None = None,
                  src_crs: str | None = None) -> "ray.data.Dataset":
    """availability.get_mean_NDVI (availability.py:41-342).

    Polygon PoIs follow the reference's dispatch: their own geometry is
    the AoI (``buffer_type=None``), euclidean-dilated by ``buffer_dist``
    (``buffer_type='euclidean'``), or collapsed to centroids for
    isochrones (``buffer_type='network'``) / ``polygon_type='house'``."""
    dist = _resolve_buffer(buffer_dist, travel_speed, trip_time)
    docs = _poi(poi)
    mode, pts = _route_poi(docs, src_crs, polygon_type, buffer_type, dist)
    tile_dir, shift, _ = _tiles(ndvi_tile_dir, "ndvi")
    pts = _shift_xy(pts, *shift)
    if mode == "polygon":
        metrics = _av.mean_ndvi_polygon_aoi(
            pts, tile_dir, concurrency=concurrency,
            dilate=(dist if buffer_type == "euclidean" else 0.0),
        )
    elif buffer_type == "euclidean":
        metrics = _av.mean_ndvi(pts, tile_dir, dist, concurrency=concurrency)
    else:
        # the street graph must move into the tile-local frame WITH the
        # points: nearest-node snapping and the isochrone's raster
        # windows otherwise compare shifted PoIs against unshifted
        # node coordinates (silently wrong snaps / empty windows)
        nodes = _shift_table(pq.read_table(network_nodes_file), *shift)
        metrics = _av.mean_ndvi_isochrone(
            pts, nodes,
            _filter_network_type(pq.read_table(network_edges_file),
                                 network_type),
            tile_dir, buffer_dist=dist, concurrency=concurrency,
        )
    return _emit(_attach(docs, metrics), "mean_NDVI", docs, src_crs,
                 write_to_file, output_dir, plot_aoi,
                 buffer_dist=(dist if mode == "point" else None),
                 output_format=output_format)


def get_landcover_percentages(poi, landcover_tile_dir: str,
                              buffer_dist: float | None = 500.0,
                              buffer_type: str | None = "euclidean",
                              polygon_type: str = "neighbourhood",
                              network_type: str = "all",
                              network_nodes_file: str | None = None,
                              network_edges_file: str | None = None,
                              travel_speed: float | None = None,
                              trip_time: float | None = None,
                              stringify: bool = True,
                              plot_aoi: bool = False,
                              write_to_file: bool = False,
                              output_dir: str | None = None,
                  output_format: str = "parquet",
                              concurrency: int | None = None,
                              classmap: dict[int, str] | None = None,
                  src_crs: str | None = None) -> "ray.data.Dataset":
    """availability.get_landcover_percentages (availability.py:344-597).

    ``classmap`` maps raster class codes to column names.  Default: for
    a ``.tif`` input the classmap is derived from the raster's own
    distinct codes — ESA WorldCover legend names where the codes match
    that public legend, the numeric code otherwise — mirroring the
    reference, which takes the legend from the source's classification
    metadata and passes unknown codes through numerically
    (availability.py:447-450,556); for a prebuilt tile store it defaults
    to the synthetic world's classes."""
    dist = _resolve_buffer(buffer_dist, travel_speed, trip_time)
    docs = _poi(poi)
    mode, pts = _route_poi(docs, src_crs, polygon_type, buffer_type, dist)
    tile_dir, shift, info = _tiles(landcover_tile_dir, "lulc")
    if classmap is None and info.get("codes"):
        nodata = info.get("nodata_code")
        classmap = {c: _WORLDCOVER_LEGEND.get(
                        c, "nodata" if c == nodata else str(c))
                    for c in info["codes"]}
    pts = _shift_xy(pts, *shift)
    if mode == "polygon":
        metrics = _av.landcover_percentages_polygon_aoi(
            pts, tile_dir, classmap=classmap, stringify=stringify,
            concurrency=concurrency,
            dilate=(dist if buffer_type == "euclidean" else 0.0),
        )
    elif buffer_type == "network":
        # graph moves into the tile-local frame WITH the points (same
        # frame rule as the NDVI network branch)
        nodes = _shift_table(pq.read_table(network_nodes_file), *shift)
        metrics = _av.landcover_percentages_isochrone(
            pts, nodes,
            _filter_network_type(pq.read_table(network_edges_file),
                                 network_type),
            tile_dir, dist,
            stringify=stringify, concurrency=concurrency, classmap=classmap,
        )
    else:
        metrics = _av.landcover_percentages(
            pts, tile_dir, dist, stringify=stringify,
            concurrency=concurrency, classmap=classmap,
        )
    return _emit(_attach(docs, metrics), "landcover_percentages", docs,
                 src_crs, write_to_file, output_dir, plot_aoi,
                 buffer_dist=(dist if mode == "point" else None),
                 output_format=output_format)


def get_canopy_percentage(poi, canopy_vector_file: str,
                          buffer_dist: float | None = 250.0,
                          buffer_type: str | None = "euclidean",
                          polygon_type: str = "neighbourhood",
                          network_type: str = "all",
                          network_nodes_file: str | None = None,
                          network_edges_file: str | None = None,
                          travel_speed: float | None = None,
                          trip_time: float | None = None,
                          stringify: bool = True,
                          plot_aoi: bool = False,
                          write_to_file: bool = False,
                          output_dir: str | None = None,
                  output_format: str = "parquet",
                          concurrency: int | None = None,
                  src_crs: str | None = None) -> "ray.data.Dataset":
    """availability.get_canopy_percentage (availability.py:600-780);
    ``buffer_type='network'`` uses the isochrone AoI
    (availability.py:682-710 + make_iso_poly); polygon PoIs use their
    own (optionally dilated) geometry as the AoI."""
    dist = _resolve_buffer(buffer_dist, travel_speed, trip_time)
    docs = _poi(poi)
    mode, pts = _route_poi(docs, src_crs, polygon_type, buffer_type, dist)
    canopy = _vector_table(canopy_vector_file, dst_crs=_poi_crs(poi))
    if mode == "polygon":
        metrics = _av.coverage_percentage_polygon_aoi(
            pts, canopy, stringify=stringify, concurrency=concurrency,
            name="canopy_cover", dissolve=False,
            dilate=(dist if buffer_type == "euclidean" else 0.0),
        )
    elif buffer_type == "network":
        metrics = _av.canopy_percentage_isochrone(
            pts, pq.read_table(network_nodes_file),
            _filter_network_type(pq.read_table(network_edges_file),
                                 network_type),
            canopy, dist,
            stringify=stringify, concurrency=concurrency, dissolve=False,
        )
    else:
        metrics = _av.canopy_percentage(
            pts, canopy, dist, stringify=stringify, concurrency=concurrency,
            dissolve=False,
        )
    return _emit(_attach(docs, metrics), "canopy_percentage", docs,
                 src_crs, write_to_file, output_dir, plot_aoi,
                 buffer_dist=(dist if mode == "point" else None),
                 output_format=output_format)


def get_greenspace_percentage(poi, greenspace_vector_file: str,
                              buffer_dist: float | None = 300.0,
                              buffer_type: str | None = "euclidean",
                              polygon_type: str = "neighbourhood",
                              network_type: str = "all",
                              network_nodes_file: str | None = None,
                              network_edges_file: str | None = None,
                              travel_speed: float | None = None,
                              trip_time: float | None = None,
                              stringify: bool = True,
                              plot_aoi: bool = False,
                              write_to_file: bool = False,
                              output_dir: str | None = None,
                  output_format: str = "parquet",
                              concurrency: int | None = None,
                  src_crs: str | None = None) -> "ray.data.Dataset":
    """availability.get_greenspace_percentage (availability.py:783-1010);
    ``buffer_type='network'`` uses the isochrone AoI
    (availability.py:943-997); polygon PoIs use their own (optionally
    dilated) geometry as the AoI with dissolved-union membership."""
    dist = _resolve_buffer(buffer_dist, travel_speed, trip_time)
    docs = _poi(poi)
    mode, pts = _route_poi(docs, src_crs, polygon_type, buffer_type, dist)
    gs = _vector_table(greenspace_vector_file, dst_crs=_poi_crs(poi))
    if mode == "polygon":
        metrics = _av.coverage_percentage_polygon_aoi(
            pts, gs, stringify=stringify, concurrency=concurrency,
            name="greenspace_cover", dissolve=True,
            dilate=(dist if buffer_type == "euclidean" else 0.0),
        )
    elif buffer_type == "network":
        # dissolved-union semantics: membership in ANY greenspace
        metrics = _av.canopy_percentage_isochrone(
            pts, pq.read_table(network_nodes_file),
            _filter_network_type(pq.read_table(network_edges_file),
                                 network_type),
            gs, dist,
            stringify=stringify, concurrency=concurrency,
            name="greenspace_cover", dissolve=True,
        )
    else:
        metrics = _av.greenspace_percentage(
            pts, gs, dist, stringify=stringify, concurrency=concurrency,
        )
    return _emit(_attach(docs, metrics), "greenspace_percentage", docs,
                 src_crs, write_to_file, output_dir, plot_aoi,
                 buffer_dist=(dist if mode == "point" else None),
                 output_format=output_format)


def get_shortest_distance_greenspace(poi, greenspace_vector_file: str,
                                     target_dist: float = 300.0,
                                     distance_type: str = "euclidean",
                                     destination: str = "centroids",
                                     network_type: str = "all",
                                     min_greenspace_area: float | None = None,
                                     network_nodes_file: str | None = None,
                                     network_edges_file: str | None = None,
                                     plot_aoi: bool = False,
                                     write_to_file: bool = False,
                                     output_dir: str | None = None,
                  output_format: str = "parquet",
                                     concurrency: int | None = None,
                  src_crs: str | None = None) -> "ray.data.Dataset":
    """accessibility.get_shortest_distance_greenspace
    (accessibility.py:24-223).  Polygon/MultiPolygon PoIs are collapsed
    to centroids first, exactly like the reference
    (accessibility.py:52-55 'Changing geometry type to Point by
    computing polygon centroids…').  ``min_greenspace_area`` keeps only
    greenspaces of at least that area (accessibility.py:129-131);
    ``network_type`` filters the street network by highway class
    (accessibility.py:142-149)."""
    if distance_type not in ("euclidean", "network"):
        raise TypeError("distance_type must be 'euclidean' or 'network'")
    if destination not in ("centroids", "entrance"):
        raise TypeError("destination must be 'centroids' or 'entrance'")
    # network_type is validated only when a network is actually used
    # (reference accessibility.py:142-146), by _filter_network_type
    _validate_positive("target_dist", target_dist)
    docs = _poi(poi)
    if _geom_kind(docs) in ("POLYGON", "MULTIPOLYGON"):
        pts = docs.map_batches(
            doc_src.DecodeGeom(parse_polygons=True, src_crs=src_crs),
            batch_format="pyarrow", zero_copy_batch=True,
        ).select_columns(["doc_id", "x", "y"])
    else:
        pts = doc_src.decode_geom(docs, src_crs=src_crs).select_columns(["doc_id", "x", "y"])
    flag = f"greenspace_within_{int(target_dist)}m"
    gs = _vector_table(greenspace_vector_file, dst_crs=_poi_crs(poi))
    if (destination == "centroids" or min_greenspace_area is not None
            or "centroid_x" not in gs.column_names):
        # merged-unit centroids / areas are only consumed by the
        # centroids destination and the area threshold (the entrance
        # branches read member boundaries — if a future entrance branch
        # starts consuming gs_id/centroid/area, drop this skip); the
        # third clause synthesizes centroid columns for tables that
        # lack them, which every network/entrance stage requires
        gs = _min_area_filter(_dissolve_units(gs), min_greenspace_area)
    if distance_type == "euclidean" and destination == "centroids":
        import pyarrow as pa

        # dissolved members carry identical (gs_id, centroid) rows;
        # duplicates are harmless for a min-distance and deduping by
        # gs_id alone would fabricate a phantom centroid if distinct
        # rows ever shared an id, so pass rows through as-is
        centroids = pa.table({"gs_id": gs.column("gs_id"),
                              "cx": gs.column("centroid_x"),
                              "cy": gs.column("centroid_y")})
        metrics = _acc.nearest_greenspace(
            pts, centroids, target_dist, concurrency=concurrency, flag_name=flag,
        ).select_columns(["doc_id", "distance_to_greenspace", flag])
    else:
        metrics = _acc.network_distance_greenspace(
            pts, pq.read_table(network_nodes_file),
            _filter_network_type(pq.read_table(network_edges_file),
                                 network_type),
            gs, target_dist=target_dist, destination=destination,
            distance_type=distance_type, concurrency=concurrency,
        )
        metrics = metrics.map_batches(
            lambda b: b.rename_columns(
                ["doc_id", "distance_to_greenspace", flag]
            ),
            batch_format="pyarrow",
        )
    return _emit(_attach(docs, metrics), "shortest_distance_greenspace",
                 docs, src_crs, write_to_file, output_dir, plot_aoi,
                 buffer_dist=target_dist,
                 output_format=output_format)


def _vis_poi(docs, src_crs, polygon_type, buffer_dist):
    """Visibility-function PoI dispatch (visibility.py:59-99, 305-344):
    polygon PoIs with ``polygon_type='house'`` collapse to centroids;
    ``'neighbourhood'`` keeps the polygon itself as the AoI
    (``buffer_dist`` optional); point-type PoIs (incl. centroids)
    require a positive ``buffer_dist``.  Returns ``(poi_kind, ds)``."""
    kind = _geom_kind(docs)
    if kind in ("POLYGON", "MULTIPOLYGON"):
        if polygon_type not in ("neighbourhood", "house"):
            raise ValueError(
                "polygon_type must be 'neighbourhood' or 'house'")
        decoded = docs.map_batches(
            doc_src.DecodeGeom(parse_polygons=True, src_crs=src_crs),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        if polygon_type == "house":
            _require_positive_buffer(buffer_dist)
            return "point", decoded.select_columns(["doc_id", "x", "y"])
        if buffer_dist is not None:
            _require_positive_buffer(buffer_dist)
        return "polygon", decoded.select_columns(
            ["doc_id", "ring_x", "ring_y", "ring_sizes"])
    _require_positive_buffer(buffer_dist)
    return "point", doc_src.decode_geom(docs, src_crs=src_crs).select_columns(
        ["doc_id", "x", "y"])


def _require_positive_buffer(buffer_dist) -> None:
    """visibility.py:97-98 / :343-344: point-type PoIs (incl. house
    centroids) hard-require a positive ``buffer_dist``."""
    if (buffer_dist is None or not isinstance(buffer_dist, (int, float))
            or buffer_dist <= 0):
        raise ValueError(
            "buffer_dist must be a positive number for point-type PoIs "
            f"(got {buffer_dist!r})")


def get_viewshed_GVI(poi, dsm_tile_dir: str,
                     network_nodes_file: str, network_edges_file: str,
                     buffer_dist: float | None = None,
                     viewing_dist: float = 250.0,
                     sample_dist: float = 50.0, observer_height: float = 1.7,
                     polygon_type: str = "neighbourhood",
                     write_to_file: bool = False,
                     output_dir: str | None = None,
                  output_format: str = "parquet",
                     concurrency: int | None = None,
                  src_crs: str | None = None):
    """visibility.get_viewshed_GVI (visibility.py:50-293).  Returns
    (poi-with-metrics Dataset, per-sample-point Dataset)."""
    for n, v in [("viewing_dist", viewing_dist),
                 ("sample_dist", sample_dist), ("observer_height", observer_height)]:
        _validate_positive(n, v)
    docs = _poi(poi)
    poi_kind, pts = _vis_poi(docs, src_crs, polygon_type, buffer_dist)
    if isinstance(dsm_tile_dir, str) and dsm_tile_dir.lower().endswith(
            (".tif", ".tiff")):
        # the viewshed kernel reads THREE co-registered bands
        # (dsm/dtm/green) from one tile store; a single GeoTIFF cannot
        # supply them — ingest each with sources.geotiff.ingest_to_tiles
        # into one directory and pass that
        raise ValueError(
            "get_viewshed_GVI needs a tile-store directory with dsm, dtm "
            "and green bands; ingest each GeoTIFF via "
            "sources.geotiff.ingest_to_tiles(path, out_dir, band=...) "
            "into the same out_dir first")
    edges = _vis.edge_coords_table(network_nodes_file, network_edges_file)
    rollup, per_point = _vis.viewshed_gvi(
        pts, edges, dsm_tile_dir, buffer_dist=buffer_dist,
        viewing_dist=viewing_dist, sample_dist=sample_dist,
        observer_height=observer_height, concurrency=concurrency,
        poi_kind=poi_kind,
    )
    out = _emit(_attach(docs, rollup), "viewshed_GVI", docs, src_crs,
                write_to_file, output_dir, False,
                 output_format=output_format)
    return out, per_point


def get_streetview_GVI(poi, network_nodes_file: str, network_edges_file: str,
                       image_features_file: str,
                       buffer_dist: float | None = None,
                       polygon_type: str = "neighbourhood",
                       crop_by_road_centres: bool = True,
                       write_to_file: bool = False,
                       output_dir: str | None = None,
                  output_format: str = "parquet",
                       concurrency: int | None = None,
                  src_crs: str | None = None):
    """visibility.get_streetview_GVI (visibility.py:296-437) with the
    deterministic segmentation stub.  Returns (poi-with-metrics Dataset,
    per-point Dataset).  ``crop_by_road_centres=False`` scores panoramas
    over four equal central-band crops instead of the road-centre crops
    (visibility.py:944-949)."""
    docs = _poi(poi)
    # Dataset PoI side: broadcast below streetview_gvi's size threshold,
    # cell-bucketed shuffle join above it (no driver materialization)
    poi_kind, poi_ds = _vis_poi(docs, src_crs, polygon_type, buffer_dist)
    edges = _vis.edge_coords_table(network_nodes_file, network_edges_file)
    features = pq.read_table(image_features_file)
    rollup, per_point = _vis.streetview_gvi(
        poi_ds, edges, features, buffer_dist=buffer_dist, concurrency=concurrency,
        poi_kind=poi_kind, crop_by_road_centres=crop_by_road_centres,
    )
    out = _emit(_attach(docs, rollup), "streetview_GVI", docs, src_crs,
                write_to_file, output_dir, False,
                 output_format=output_format)
    return out, per_point


def get_mean_NDVI_streets(network_nodes_file: str, network_edges_file: str,
                          ndvi_tile_dir: str, buffer_dist: float = 10.0,
                          concurrency: int | None = None):
    """get_mean_NDVI with a street network as the PoI set — the README
    place-query flow (availability.py:52-61): each edge becomes a PoI
    row whose AoI is the edge geometry buffered by ``buffer_dist``
    (:134).  Curved ``geom_x``/``geom_y`` polylines are honored when the
    edges file carries them."""
    _validate_positive("buffer_dist", buffer_dist)
    import numpy as np
    import pyarrow as pa

    tile_dir, shift, _ = _tiles(ndvi_tile_dir, "ndvi")
    edges_tbl = _shift_table(
        _vis.edge_coords_table(network_nodes_file, network_edges_file), *shift,
        xcols=("ax", "bx", "geom_x"), ycols=("ay", "by", "geom_y"))
    edges_tbl = edges_tbl.append_column(
        "edge_id", pa.array(np.arange(len(edges_tbl), dtype=np.int64)))
    return _av.mean_ndvi_line_aoi(
        ray.data.from_arrow(edges_tbl), tile_dir,
        buffer_dist=buffer_dist, key_col="edge_id", concurrency=concurrency,
    )
