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


def _poi(poi) -> "ray.data.Dataset":
    docs = doc_src.read_documents(poi) if isinstance(poi, str) else poi
    return docs


def _attach(docs, metrics):
    return bucket_join_attach(docs, metrics, key="doc_id")


def get_mean_NDVI(poi, ndvi_tile_dir: str, buffer_dist: float | None = 300.0,
                  buffer_type: str = "euclidean",
                  network_nodes_file: str | None = None,
                  network_edges_file: str | None = None,
                  travel_speed: float | None = None,
                  trip_time: float | None = None,
                  concurrency: int | None = None,
                  src_crs: str | None = None) -> "ray.data.Dataset":
    """availability.get_mean_NDVI (availability.py:41-342)."""
    if buffer_type not in ("euclidean", "network"):
        raise TypeError("buffer_type must be 'euclidean' or 'network'")
    dist = _resolve_buffer(buffer_dist, travel_speed, trip_time)
    docs = _poi(poi)
    pts = doc_src.decode_geom(docs, src_crs=src_crs).select_columns(["doc_id", "x", "y"])
    if buffer_type == "euclidean":
        metrics = _av.mean_ndvi(pts, ndvi_tile_dir, dist, concurrency=concurrency)
    else:
        metrics = _av.mean_ndvi_isochrone(
            pts, pq.read_table(network_nodes_file), pq.read_table(network_edges_file),
            ndvi_tile_dir, buffer_dist=dist, concurrency=concurrency,
        )
    return _attach(docs, metrics)


def get_landcover_percentages(poi, landcover_tile_dir: str,
                              buffer_dist: float = 500.0,
                              stringify: bool = True,
                              concurrency: int | None = None,
                  src_crs: str | None = None) -> "ray.data.Dataset":
    """availability.get_landcover_percentages (availability.py:344-597)."""
    _validate_positive("buffer_dist", buffer_dist)
    docs = _poi(poi)
    pts = doc_src.decode_geom(docs, src_crs=src_crs).select_columns(["doc_id", "x", "y"])
    metrics = _av.landcover_percentages(
        pts, landcover_tile_dir, buffer_dist, stringify=stringify,
        concurrency=concurrency,
    )
    return _attach(docs, metrics)


def get_canopy_percentage(poi, canopy_vector_file: str,
                          buffer_dist: float = 250.0, stringify: bool = True,
                          concurrency: int | None = None,
                  src_crs: str | None = None) -> "ray.data.Dataset":
    """availability.get_canopy_percentage (availability.py:600-780)."""
    _validate_positive("buffer_dist", buffer_dist)
    docs = _poi(poi)
    pts = doc_src.decode_geom(docs, src_crs=src_crs).select_columns(["doc_id", "x", "y"])
    metrics = _av.canopy_percentage(
        pts, pq.read_table(canopy_vector_file), buffer_dist,
        stringify=stringify, concurrency=concurrency,
    )
    return _attach(docs, metrics)


def get_greenspace_percentage(poi, greenspace_vector_file: str,
                              buffer_dist: float | None = 300.0,
                              travel_speed: float | None = None,
                              trip_time: float | None = None,
                              stringify: bool = True,
                              concurrency: int | None = None,
                  src_crs: str | None = None) -> "ray.data.Dataset":
    """availability.get_greenspace_percentage (availability.py:783-1010)."""
    dist = _resolve_buffer(buffer_dist, travel_speed, trip_time)
    docs = _poi(poi)
    pts = doc_src.decode_geom(docs, src_crs=src_crs).select_columns(["doc_id", "x", "y"])
    metrics = _av.greenspace_percentage(
        pts, pq.read_table(greenspace_vector_file), dist,
        stringify=stringify, concurrency=concurrency,
    )
    return _attach(docs, metrics)


def get_shortest_distance_greenspace(poi, greenspace_vector_file: str,
                                     target_dist: float = 300.0,
                                     distance_type: str = "euclidean",
                                     destination: str = "centroids",
                                     network_nodes_file: str | None = None,
                                     network_edges_file: str | None = None,
                                     concurrency: int | None = None,
                  src_crs: str | None = None) -> "ray.data.Dataset":
    """accessibility.get_shortest_distance_greenspace
    (accessibility.py:24-223)."""
    if distance_type not in ("euclidean", "network"):
        raise TypeError("distance_type must be 'euclidean' or 'network'")
    if destination not in ("centroids", "entrance"):
        raise TypeError("destination must be 'centroids' or 'entrance'")
    _validate_positive("target_dist", target_dist)
    docs = _poi(poi)
    pts = doc_src.decode_geom(docs, src_crs=src_crs).select_columns(["doc_id", "x", "y"])
    flag = f"greenspace_within_{int(target_dist)}m"
    gs = pq.read_table(greenspace_vector_file)
    if distance_type == "euclidean" and destination == "centroids":
        import pyarrow as pa

        centroids = pa.table({"gs_id": gs.column("gs_id"),
                              "cx": gs.column("centroid_x"),
                              "cy": gs.column("centroid_y")})
        metrics = _acc.nearest_greenspace(
            pts, centroids, target_dist, concurrency=concurrency, flag_name=flag,
        ).select_columns(["doc_id", "distance_to_greenspace", flag])
    else:
        metrics = _acc.network_distance_greenspace(
            pts, pq.read_table(network_nodes_file), pq.read_table(network_edges_file),
            gs, target_dist=target_dist, destination=destination,
            distance_type=distance_type, concurrency=concurrency,
        )
        metrics = metrics.map_batches(
            lambda b: b.rename_columns(
                ["doc_id", "distance_to_greenspace", flag]
            ),
            batch_format="pyarrow",
        )
    return _attach(docs, metrics)


def get_viewshed_GVI(poi, dsm_tile_dir: str,
                     network_nodes_file: str, network_edges_file: str,
                     buffer_dist: float = 100.0, viewing_dist: float = 250.0,
                     sample_dist: float = 50.0, observer_height: float = 1.7,
                     concurrency: int | None = None,
                  src_crs: str | None = None):
    """visibility.get_viewshed_GVI (visibility.py:50-293).  Returns
    (poi-with-metrics Dataset, per-sample-point Dataset)."""
    for n, v in [("buffer_dist", buffer_dist), ("viewing_dist", viewing_dist),
                 ("sample_dist", sample_dist), ("observer_height", observer_height)]:
        _validate_positive(n, v)
    docs = _poi(poi)
    pts = doc_src.decode_geom(docs, src_crs=src_crs).select_columns(["doc_id", "x", "y"])
    edges = _vis.edge_coords_table(network_nodes_file, network_edges_file)
    rollup, per_point = _vis.viewshed_gvi(
        pts, edges, dsm_tile_dir, buffer_dist=buffer_dist,
        viewing_dist=viewing_dist, sample_dist=sample_dist,
        observer_height=observer_height, concurrency=concurrency,
    )
    return _attach(docs, rollup), per_point


def get_streetview_GVI(poi, network_nodes_file: str, network_edges_file: str,
                       image_features_file: str, buffer_dist: float = 100.0,
                       concurrency: int | None = None,
                  src_crs: str | None = None):
    """visibility.get_streetview_GVI (visibility.py:296-437) with the
    deterministic segmentation stub.  Returns (poi-with-metrics Dataset,
    per-point Dataset)."""
    _validate_positive("buffer_dist", buffer_dist)
    docs = _poi(poi)
    # Dataset PoI side: broadcast below streetview_gvi's size threshold,
    # cell-bucketed shuffle join above it (no driver materialization)
    poi_ds = doc_src.decode_geom(docs, src_crs=src_crs).select_columns(["doc_id", "x", "y"])
    edges = _vis.edge_coords_table(network_nodes_file, network_edges_file)
    features = pq.read_table(image_features_file)
    rollup, per_point = _vis.streetview_gvi(
        poi_ds, edges, features, buffer_dist=buffer_dist, concurrency=concurrency,
    )
    return _attach(docs, rollup), per_point


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

    edges_tbl = _vis.edge_coords_table(network_nodes_file, network_edges_file)
    edges_tbl = edges_tbl.append_column(
        "edge_id", pa.array(np.arange(len(edges_tbl), dtype=np.int64)))
    return _av.mean_ndvi_line_aoi(
        ray.data.from_arrow(edges_tbl), ndvi_tile_dir,
        buffer_dist=buffer_dist, key_col="edge_id", concurrency=concurrency,
    )
