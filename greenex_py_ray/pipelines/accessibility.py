"""Accessibility pillar pipelines (nearest greenspace).

Ray-Data-native reimplementation of
``GreenExp/accessibility.py::get_shortest_distance_greenspace``
(`:24-223`), euclidean/centroids branch; the network branch is added by
``pipelines/netaccess`` (GraphActor pool).
"""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data

from ..functions.joins import as_pool, bucket_join_attach, heavy_pool
from ..sources import documents as doc_src
from ..stages.access import NearestGreenspace


def nearest_greenspace(
    poi: "ray.data.Dataset",
    centroids: "pa.Table",
    target_dist: float,
    key_col: str = "doc_id",
    concurrency: int | None = None,
    batch_size: int = 8192,
    dist_name: str = "distance_to_greenspace",
    flag_name: str = "greenspace_within_target",
) -> "ray.data.Dataset":
    """poi(key,x,y) + small centroid table (broadcast via ray.put) →
    (key, distance_to_greenspace, within flag, nearest_gs_id)."""
    ref = ray.put(centroids)
    return poi.map_batches(
        NearestGreenspace,
        fn_constructor_kwargs=dict(
            centroids_ref=ref, target_dist=target_dist, key_col=key_col,
            dist_name=dist_name, flag_name=flag_name,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=as_pool(concurrency),
        num_cpus=0.25,
    )


def get_shortest_distance_greenspace_documents(
    documents_path: str,
    greenspace_path: str,
    target_dist: float = 300.0,
    concurrency: int | None = None,
    num_join_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Spans documents + greenspace table → documents + distance/flag
    columns, spans untouched.  Greenspace centroids come from the side
    table's precomputed centroid columns (accessibility.py:134-135)."""
    import pyarrow.parquet as pq

    docs = doc_src.read_documents(documents_path)
    poi = doc_src.decode_geom(docs).select_columns(["doc_id", "x", "y"])
    gs = pq.read_table(greenspace_path, columns=["gs_id", "centroid_x", "centroid_y"])
    centroids = pa.table(
        {"gs_id": gs.column("gs_id"), "cx": gs.column("centroid_x"),
         "cy": gs.column("centroid_y")}
    )
    metrics = nearest_greenspace(
        poi, centroids, target_dist, key_col="doc_id", concurrency=as_pool(concurrency),
        flag_name=f"greenspace_within_{int(target_dist)}m",
    )
    return bucket_join_attach(docs, metrics, key="doc_id",
                              num_buckets=num_join_partitions)


def network_distance_greenspace(
    poi: "ray.data.Dataset",
    nodes: "pa.Table",
    edges: "pa.Table",
    greenspace: "pa.Table",
    target_dist: float = 300.0,
    destination: str = "centroids",
    distance_type: str = "network",
    key_col: str = "doc_id",
    concurrency: int | None = None,
) -> "ray.data.Dataset":
    """Network/entrance branches of get_shortest_distance_greenspace
    (accessibility.py:226-301): GraphActor pool with broadcast graph +
    greenspace tables; ``distance_type='euclidean'`` +
    ``destination='entrance'`` gives the straight-line-to-entrance
    variant."""
    import ray as _ray

    from ..stages.netaccess import NetworkDistance

    return poi.map_batches(
        NetworkDistance,
        fn_constructor_kwargs=dict(
            nodes_ref=_ray.put(nodes), edges_ref=_ray.put(edges),
            greenspace_ref=_ray.put(greenspace), target_dist=target_dist,
            destination=destination, distance_type=distance_type, key_col=key_col,
        ),
        batch_format="pyarrow", batch_size=512,
        **heavy_pool(concurrency),
    )


def od_cost_matrix(
    poi: "ray.data.Dataset",
    nodes: "pa.Table",
    edges: "pa.Table",
    cutoff: float = 500.0,
    dest_mod: int | None = 16,
    dest_ids=None,
    key_col: str = "doc_id",
    concurrency: int | None = None,
) -> "ray.data.Dataset":
    """Many-to-many origin→destination network cost matrix: one row per
    (PoI, destination node) pair within ``cutoff`` network metres, cost
    = snap penalty + shortest-path length (the reference's one-to-one
    shortest-distance semantics, applied as an OD matrix)."""
    import ray as _ray

    from ..stages.netaccess import ODMatrix

    return poi.map_batches(
        ODMatrix,
        fn_constructor_kwargs=dict(
            nodes_ref=_ray.put(nodes), edges_ref=_ray.put(edges),
            cutoff=cutoff, dest_mod=dest_mod, dest_ids=dest_ids,
            key_col=key_col,
        ),
        batch_format="pyarrow", batch_size=256,
        **heavy_pool(concurrency),
    )
