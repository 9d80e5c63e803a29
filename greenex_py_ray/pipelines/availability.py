"""Availability pillar pipelines (mean NDVI, landcover percentages).

Ray-Data-native reimplementation of
``GreenExp/availability.py::get_mean_NDVI`` (`:41-342`) and
``::get_landcover_percentages`` (`:344-597`): euclidean-buffer AoIs,
zonal statistics against a tiled raster store, per-key rollup.

Each function takes an already-decoded PoI dataset (columns ``key, x,
y``) and returns a metrics Dataset keyed by ``key``; ``*_documents``
wrappers run the whole flow from the interleaved spans table and join
the metrics back so the output keeps the untouched ``spans`` column
(per-row span-sequence invariant).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from ..functions.joins import as_pool, bucket_join_attach, heavy_pool
from ..sources import documents as doc_src
from ..stages import zonal

#: default classmap for the synthetic lulc band (ESA-WorldCover-style
#: values produced by sources/synth.field_lulc)
DEFAULT_CLASSMAP = {10: "pct_tree", 30: "pct_grass", 40: "pct_crop",
                    50: "pct_builtup", 60: "pct_bare", 80: "pct_water"}


def mean_ndvi(
    poi: "ray.data.Dataset",
    tile_root: str,
    radius: float,
    key_col: str = "doc_id",
    concurrency: int | None = None,
    batch_size: int = 2048,
    locality_sort: bool = False,
) -> "ray.data.Dataset":
    """poi(key,x,y) → (key, mean_NDVI, std_NDVI); semantics of
    availability.py:289 (clamp ≥0, population std, round 3).

    ``locality_sort=True`` switches to the partial+final path with a
    ``tile_key`` co-location sort — for radii spanning many tiles or
    when the tile working set exceeds the per-actor cache.  The default
    is the FUSED local path (``ZonalStatsLocal``): a disk spans ≤4 tiles
    at typical radii, so per-key aggregation is actor-local and the
    pipeline has NO shuffle at all.
    """
    if locality_sort:
        cov = poi.map_batches(
            zonal.TileCover(radius, key_col), batch_format="pyarrow",
            zero_copy_batch=True,
        ).sort("tile_key")
        part = cov.map_batches(
            zonal.ZonalStatsPartial,
            fn_constructor_kwargs=dict(
                tile_root=tile_root, band="ndvi", radius=radius, key_col=key_col
            ),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=as_pool(concurrency),
            num_cpus=0.25,
        )
        agg = part.groupby(key_col).aggregate(Sum("psum"), Sum("psumsq"), Sum("pcount"))
        return agg.map_batches(
            lambda b: zonal.finish_mean_std(b, key_col), batch_format="pyarrow"
        )
    return poi.map_batches(
        zonal.ZonalStatsLocal,
        fn_constructor_kwargs=dict(
            tile_root=tile_root, band="ndvi", radius=radius, key_col=key_col
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        **heavy_pool(concurrency),
    )


def landcover_percentages(
    poi: "ray.data.Dataset",
    tile_root: str,
    radius: float,
    key_col: str = "doc_id",
    classmap: dict[int, str] | None = None,
    concurrency: int | None = None,
    batch_size: int = 4096,
    stringify: bool = False,
    locality_sort: bool = False,
) -> "ray.data.Dataset":
    """poi(key,x,y) → (key, pct_<class>...); availability.py:1068-1082
    semantics (count/total*100 round 3; ``stringify=True`` reproduces the
    reference's ``"12.345%"`` string columns)."""
    classmap = classmap or DEFAULT_CLASSMAP
    names = [classmap[c] for c in sorted(classmap)]
    if locality_sort:
        cov = poi.map_batches(
            zonal.TileCover(radius, key_col), batch_format="pyarrow",
            zero_copy_batch=True,
        ).sort("tile_key")
        part = cov.map_batches(
            zonal.LandcoverPartial,
            fn_constructor_kwargs=dict(
                tile_root=tile_root, radius=radius, classmap=classmap, key_col=key_col
            ),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=as_pool(concurrency),
            num_cpus=0.25,
        )
        aggs = [Sum(f"cnt_{n}") for n in names] + [Sum("cnt_total")]
        agg = part.groupby(key_col).aggregate(*aggs)
        return agg.map_batches(
            lambda b: zonal.finish_landcover(b, names, key_col, stringify=stringify),
            batch_format="pyarrow",
        )
    return poi.map_batches(
        zonal.LandcoverLocal,
        fn_constructor_kwargs=dict(
            tile_root=tile_root, radius=radius, classmap=classmap, key_col=key_col,
            stringify=stringify,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        **heavy_pool(concurrency),
    )


# ---------------------------------------------------------------------------
# Interleaved-document entry points (reference public-API parity)
# ---------------------------------------------------------------------------


def get_mean_ndvi_documents(
    documents_path: str, tile_root: str, buffer_dist: float = 300.0,
    concurrency: int | None = None, num_join_partitions: int | None = None,
    batch_size: int = 2048,
) -> "ray.data.Dataset":
    """Flagship pipeline: spans documents → decode geom → zonal NDVI →
    join metrics back onto the untouched documents (span passthrough).

    ``batch_size``: raise toward 16384 on large inputs — the SAT-chord
    kernel runs one vectorized pass per (tile, point-group), so larger
    batches amortize numpy dispatch (+40 % single-thread measured);
    keep small on small inputs so the actor pool stays fed."""
    docs = doc_src.read_documents(documents_path)
    poi = doc_src.decode_geom(docs).select_columns(["doc_id", "x", "y"])
    metrics = mean_ndvi(poi, tile_root, buffer_dist, key_col="doc_id",
                        concurrency=as_pool(concurrency),
                        batch_size=batch_size)
    # metrics schema passed explicitly: .schema() on the lazy zonal
    # pipeline would execute a probe slice of it
    return bucket_join_attach(
        docs, metrics, key="doc_id", num_buckets=num_join_partitions,
        right_fields=[pa.field("doc_id", pa.string()),
                      pa.field("mean_NDVI", pa.float64()),
                      pa.field("std_NDVI", pa.float64())],
    )


def get_landcover_percentages_documents(
    documents_path: str, tile_root: str, buffer_dist: float = 500.0,
    concurrency: int | None = None, num_join_partitions: int | None = None, stringify: bool = True,
) -> "ray.data.Dataset":
    docs = doc_src.read_documents(documents_path)
    poi = doc_src.decode_geom(docs).select_columns(["doc_id", "x", "y"])
    metrics = landcover_percentages(
        poi, tile_root, buffer_dist, key_col="doc_id", concurrency=as_pool(concurrency),
        stringify=stringify,
    )
    pct_t = pa.string() if stringify else pa.float64()
    names = [DEFAULT_CLASSMAP[c] for c in sorted(DEFAULT_CLASSMAP)]
    return bucket_join_attach(
        docs, metrics, key="doc_id", num_buckets=num_join_partitions,
        right_fields=[pa.field("doc_id", pa.string())]
        + [pa.field(n, pct_t) for n in names],
    )


def canopy_percentage(
    poi: "ray.data.Dataset",
    canopy: "pa.Table",
    buffer_dist: float = 250.0,
    key_col: str = "doc_id",
    concurrency: int | None = None,
    stringify: bool = False,
    name: str = "canopy_cover",
    aoi_shape: str = "circle",
    dissolve: bool = True,
) -> "ray.data.Dataset":
    """get_canopy_percentage (availability.py:600-780): percent of the
    buffer AoI covered by canopy polygons (broadcast small side).
    ``aoi_shape="square"`` is the SQL-verifiable gate form (exact square
    AoI instead of the shapely 64-gon buffer); ``dissolve=False``
    reproduces the reference's raw ``clip().area.sum()`` (overlaps
    double-count, availability.py:764)."""
    import pyarrow as pa  # noqa: F811

    import ray as _ray

    from ..stages.coverage import PolygonCoverage

    ref = _ray.put(canopy)
    return poi.map_batches(
        PolygonCoverage,
        fn_constructor_kwargs=dict(
            polys_ref=ref, buffer_dist=buffer_dist, key_col=key_col,
            name=name, stringify=stringify, aoi_shape=aoi_shape,
            dissolve=dissolve,
        ),
        batch_format="pyarrow", concurrency=as_pool(concurrency), num_cpus=0.25,
    )


def greenspace_percentage(
    poi: "ray.data.Dataset",
    greenspace: "pa.Table",
    buffer_dist: float = 300.0,
    key_col: str = "doc_id",
    concurrency: int | None = None,
    stringify: bool = False,
    aoi_shape: str = "circle",
) -> "ray.data.Dataset":
    """get_greenspace_percentage (availability.py:783-1010): same
    machinery with the dissolved greenspace table."""
    return canopy_percentage(
        poi, greenspace, buffer_dist, key_col, concurrency, stringify,
        name="greenspace_cover", aoi_shape=aoi_shape,
    )


def mean_ndvi_isochrone(
    poi: "ray.data.Dataset",
    nodes: "pa.Table",
    edges: "pa.Table",
    tile_root: str,
    buffer_dist: float = 500.0,
    key_col: str = "doc_id",
    concurrency: int | None = None,
) -> "ray.data.Dataset":
    """get_mean_NDVI with buffer_type='network' (availability.py:263-275):
    per-PoI isochrone AoI from the street graph, zonal stats inside the
    GraphActor pool."""
    import ray as _ray

    from ..stages.netaccess import IsochroneZonal

    from ..functions.joins import heavy_pool as _hp

    return poi.map_batches(
        IsochroneZonal,
        fn_constructor_kwargs=dict(
            nodes_ref=_ray.put(nodes), edges_ref=_ray.put(edges),
            tile_root=tile_root, buffer_dist=buffer_dist, key_col=key_col,
        ),
        batch_format="pyarrow", batch_size=256,
        **_hp(concurrency),
    )


def landcover_percentages_isochrone(
    poi: "ray.data.Dataset",
    nodes: "pa.Table",
    edges: "pa.Table",
    tile_root: str,
    buffer_dist: float = 500.0,
    classmap: dict[int, str] | None = None,
    key_col: str = "doc_id",
    concurrency: int | None = None,
    stringify: bool = False,
) -> "ray.data.Dataset":
    """get_landcover_percentages with buffer_type='network'
    (availability.py:505-516): per-PoI isochrone AoI, per-class pixel
    percentages inside the GraphActor pool."""
    import ray as _ray

    from ..functions.joins import heavy_pool as _hp
    from ..stages.netaccess import IsochroneLandcover

    classmap = classmap or DEFAULT_CLASSMAP
    return poi.map_batches(
        IsochroneLandcover,
        fn_constructor_kwargs=dict(
            nodes_ref=_ray.put(nodes), edges_ref=_ray.put(edges),
            tile_root=tile_root, buffer_dist=buffer_dist, classmap=classmap,
            key_col=key_col, stringify=stringify,
        ),
        batch_format="pyarrow", batch_size=256,
        **_hp(concurrency),
    )


def canopy_percentage_isochrone(
    poi: "ray.data.Dataset",
    nodes: "pa.Table",
    edges: "pa.Table",
    polys: "pa.Table",
    buffer_dist: float = 500.0,
    key_col: str = "doc_id",
    concurrency: int | None = None,
    stringify: bool = False,
    name: str = "canopy_cover",
    dissolve: bool = True,
) -> "ray.data.Dataset":
    """get_canopy_percentage / get_greenspace_percentage with
    buffer_type='network' (availability.py:710-764 / 943-997): percent
    of the isochrone AoI covered by the vector layer (see the
    raster-analog deviation note on
    :class:`~greenex_py_ray.stages.netaccess.IsochroneCoverage`)."""
    import ray as _ray

    from ..functions.joins import heavy_pool as _hp
    from ..stages.netaccess import IsochroneCoverage

    return poi.map_batches(
        IsochroneCoverage,
        fn_constructor_kwargs=dict(
            nodes_ref=_ray.put(nodes), edges_ref=_ray.put(edges),
            polys_ref=_ray.put(polys), buffer_dist=buffer_dist,
            key_col=key_col, name=name, stringify=stringify,
            dissolve=dissolve,
        ),
        batch_format="pyarrow", batch_size=256,
        **_hp(concurrency),
    )


def _polygon_cover(poi_polygons, key_col: str, dilate: float):
    ring_cols = [key_col, "ring_x", "ring_y"]
    if "ring_sizes" in poi_polygons.schema().names:
        ring_cols.append("ring_sizes")
    return poi_polygons.select_columns(ring_cols).map_batches(
        lambda b: zonal.polygon_tile_cover_batch(b, key_col, margin=dilate),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def mean_ndvi_polygon_aoi(
    poi_polygons: "ray.data.Dataset",
    tile_root: str,
    key_col: str = "doc_id",
    concurrency: int | None = None,
    batch_size: int = 4096,
    dilate: float = 0.0,
) -> "ray.data.Dataset":
    """get_mean_NDVI with POLYGON PoIs — the AoI is each row's own
    polygon (``buffer_type=None``, availability.py:230-234), dilated by
    ``dilate`` for the buffered-polygon form (``buffer_type='euclidean'``
    on polygon PoIs, availability.py:235-237).  Input must carry
    ``ring_x``/``ring_y`` columns (DecodeGeom(parse_polygons=True))."""
    part = _polygon_cover(poi_polygons, key_col, dilate).map_batches(
        zonal.PolygonZonalPartial,
        fn_constructor_kwargs=dict(tile_root=tile_root, band="ndvi",
                                   key_col=key_col, dilate=dilate),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=as_pool(concurrency), num_cpus=0.25,
    )
    agg = part.groupby(key_col).aggregate(Sum("psum"), Sum("psumsq"), Sum("pcount"))
    return agg.map_batches(
        lambda b: zonal.finish_mean_std(b, key_col), batch_format="pyarrow"
    )


def landcover_percentages_polygon_aoi(
    poi_polygons: "ray.data.Dataset",
    tile_root: str,
    classmap: dict[int, str] | None = None,
    key_col: str = "doc_id",
    concurrency: int | None = None,
    batch_size: int = 4096,
    dilate: float = 0.0,
    stringify: bool = False,
) -> "ray.data.Dataset":
    """get_landcover_percentages with POLYGON PoIs (availability.py:
    361-377): per-class pixel percentages of each row's own (optionally
    dilated) polygon AoI."""
    classmap = classmap or DEFAULT_CLASSMAP
    names = [classmap[c] for c in sorted(classmap)]
    part = _polygon_cover(poi_polygons, key_col, dilate).map_batches(
        zonal.PolygonLandcoverPartial,
        fn_constructor_kwargs=dict(tile_root=tile_root, classmap=classmap,
                                   key_col=key_col, dilate=dilate),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=as_pool(concurrency), num_cpus=0.25,
    )
    aggs = [Sum(f"cnt_{n}") for n in names] + [Sum("cnt_total")]
    agg = part.groupby(key_col).aggregate(*aggs)
    return agg.map_batches(
        lambda b: zonal.finish_landcover(b, names, key_col, stringify=stringify),
        batch_format="pyarrow",
    )


def coverage_percentage_polygon_aoi(
    poi_polygons: "ray.data.Dataset",
    polys: "pa.Table",
    key_col: str = "doc_id",
    concurrency: int | None = None,
    stringify: bool = False,
    name: str = "canopy_cover",
    dissolve: bool = False,
    dilate: float = 0.0,
) -> "ray.data.Dataset":
    """get_canopy_percentage / get_greenspace_percentage with POLYGON
    PoIs: percent of each row's own polygon AoI covered by the vector
    layer — exact scanline overlay at ``dilate=0``, pixel-center analog
    of the buffered-polygon AoI at ``dilate>0`` (see
    :class:`~greenex_py_ray.stages.coverage.PolygonCoverage`)."""
    import ray as _ray

    from ..stages.coverage import PolygonCoverage

    ring_cols = [key_col, "ring_x", "ring_y"]
    if "ring_sizes" in poi_polygons.schema().names:
        ring_cols.append("ring_sizes")
    return poi_polygons.select_columns(ring_cols).map_batches(
        PolygonCoverage,
        fn_constructor_kwargs=dict(
            polys_ref=_ray.put(polys), buffer_dist=dilate, key_col=key_col,
            name=name, stringify=stringify, dissolve=dissolve,
            aoi_shape="self",
        ),
        batch_format="pyarrow", batch_size=256,
        concurrency=as_pool(concurrency), num_cpus=0.5,
    )


def mean_ndvi_line_aoi(
    edges: "ray.data.Dataset",
    tile_root: str,
    buffer_dist: float,
    key_col: str = "edge_id",
    concurrency: int | None = None,
    batch_size: int = 512,
) -> "ray.data.Dataset":
    """get_mean_NDVI over STREET EDGES as PoI rows — the reference's
    place-query flow (availability.py:52-61): each edge's AoI is its
    buffered polyline (``poi.geometry.buffer(buffer_dist)``, :134).

    ``edges`` needs (key_col, ax, ay, bx, by) and optionally
    ``geom_x``/``geom_y`` polyline columns."""
    return edges.map_batches(
        zonal.LineZonalLocal,
        fn_constructor_kwargs=dict(tile_root=tile_root, band="ndvi",
                                   buffer_dist=buffer_dist, key_col=key_col),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=as_pool(concurrency), num_cpus=0.25,
    )


def landcover_majority(
    poi: "ray.data.Dataset",
    tile_root: str,
    radius: float,
    key_col: str = "doc_id",
    classmap: dict[int, str] | None = None,
    concurrency: int | None = None,
    batch_size: int = 4096,
) -> "ray.data.Dataset":
    """Zonal MAJORITY (dominant landcover class) per PoI buffer — the
    standard GIS zonal-statistics mode, derived from the same per-class
    integer pixel counts as :func:`landcover_percentages`.  Ties break
    to the smallest class code (np.argmax first-hit == SQL
    ``ORDER BY n DESC, cls ASC``).  Same physical plan as the
    ``locality_sort`` percentage path: per-(PoI, tile) count partials
    (a disk spanning tiles emits one partial per tile), ONE integer
    groupby-sum per PoI, then a per-row argmax — exact int64 counts,
    so the majority can't wobble across engines."""
    classmap = classmap or DEFAULT_CLASSMAP
    codes = sorted(classmap)
    names = [classmap[c] for c in codes]

    cov = poi.map_batches(
        zonal.TileCover(radius, key_col), batch_format="pyarrow",
        zero_copy_batch=True,
    )
    part = cov.map_batches(
        zonal.LandcoverPartial,
        fn_constructor_kwargs=dict(
            tile_root=tile_root, radius=radius, classmap=classmap,
            key_col=key_col,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=as_pool(concurrency),
        num_cpus=0.25,
    )
    aggs = [Sum(f"cnt_{n}") for n in names] + [Sum("cnt_total")]
    agg = part.groupby(key_col).aggregate(*aggs)

    import numpy as np

    def finish(b: "pa.Table") -> "pa.Table":
        cnts = np.stack(
            [b.column(f"sum(cnt_{n})").to_numpy(zero_copy_only=False)
             for n in names], axis=1).astype(np.int64)
        total = b.column("sum(cnt_total)").to_numpy(zero_copy_only=False)
        idx = np.argmax(cnts, axis=1)
        rows = np.arange(len(idx))
        empty = total == 0
        return pa.table({
            key_col: b.column(key_col),
            "majority_class": pa.array(
                np.asarray(codes, dtype=np.int64)[idx], mask=empty),
            "cnt_major": pa.array(cnts[rows, idx], mask=empty),
            "cnt_total": pa.array(total.astype(np.int64)),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)
