"""Visibility pillar pipelines: viewshed GVI + streetview GVI.

Ray-Data-native reimplementation of
``GreenExp/visibility.py::get_viewshed_GVI`` (`:50-293`) and
``::get_streetview_GVI`` (`:296-437`).  Both return the reference's two
tables: per-PoI rollup (``GVI`` mean rounded 3 + ``nr_of_points``) and
the per-sample-point table.
"""

from __future__ import annotations

from ..functions.joins import as_pool, heavy_pool

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data
from ray.data.aggregate import Count, Mean, Sum

from ..sources import documents as doc_src
from ..stages import visibility as vis


def edge_coords_table(nodes_path: str, edges_path: str) -> pa.Table:
    """(u, v, length) edge table + node coords → (ax, ay, bx, by, length)
    straight-segment geometry.  If the edges parquet carries per-edge
    polyline columns ``geom_x``/``geom_y`` (list<double> vertex chains —
    real OSM networks' curved LineStrings, reference
    visibility.py:581-586,633-641), they are passed through and the
    sampling stages interpolate along the true polyline instead of the
    node-to-node chord."""
    nodes = pq.read_table(nodes_path)
    edges = pq.read_table(edges_path)
    nid = nodes.column("node_id").to_numpy(zero_copy_only=False)
    nx = nodes.column("x").to_numpy(zero_copy_only=False)
    ny = nodes.column("y").to_numpy(zero_copy_only=False)
    u = edges.column("u").to_numpy(zero_copy_only=False)
    v = edges.column("v").to_numpy(zero_copy_only=False)
    # node-id → position via searchsorted over the sorted id array —
    # pure vector (the per-edge dict lookup this replaces was minutes
    # of driver time on a 10^8-edge continental network); endpoints
    # missing from the node table raise like the dict KeyError did
    order = np.argsort(nid, kind="stable")
    sn = nid[order]
    iu = np.searchsorted(sn, u).clip(0, len(sn) - 1)
    iv = np.searchsorted(sn, v).clip(0, len(sn) - 1)
    if not ((sn[iu] == u).all() and (sn[iv] == v).all()):
        raise KeyError("edge endpoint missing from the node table")
    pu = order[iu]
    pv = order[iv]
    cols = {
        "ax": pa.array(nx[pu]), "ay": pa.array(ny[pu]),
        "bx": pa.array(nx[pv]), "by": pa.array(ny[pv]),
        "length": edges.column("length"),
    }
    if "geom_x" in edges.column_names and "geom_y" in edges.column_names:
        cols["geom_x"] = edges.column("geom_x")
        cols["geom_y"] = edges.column("geom_y")
    return pa.table(cols)


def _finish_rollup(batch: pa.Table, key_col: str) -> pa.Table:
    mean = batch.column("mean_gvi_raw").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            key_col: batch.column(key_col),
            "GVI": pa.array(np.round(mean, 3)),  # visibility.py:564 round(3)
            "nr_of_points": batch.column("nr_of_points"),
        }
    )


def viewshed_gvi(
    poi: "ray.data.Dataset",
    edges_coords: pa.Table,
    tile_root: str,
    buffer_dist: float = 100.0,
    viewing_dist: float = 250.0,
    sample_dist: float = 50.0,
    observer_height: float = 1.7,
    key_col: str = "doc_id",
    concurrency: int | None = None,
    batch_size: int = 512,
    poi_kind: str = "point",
    sample_batch_size: int = 64,
) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """poi(key,x,y) → (per-PoI rollup, per-sample-point GVI rows).

    Stage plan: sample-point actor (broadcast edge index) → flat explode
    → ViewshedGVI actor pool (precomputed rays + tile cache) →
    groupby(key) Mean/Count rollup.

    ``poi_kind='polygon'`` expects ``key, ring_x, ring_y, ring_sizes``
    rows instead (``polygon_type='neighbourhood'``): edges intersecting
    each PoI's own polygon (dilated by ``buffer_dist`` when set) are
    sampled (visibility.py:568-572); ``buffer_dist`` may be ``None``.
    """
    kernel_conc = concurrency
    if kernel_conc is None:
        # the Bresenham kernel is ~95 % of this pipeline's compute and
        # its feed (decode + sample expansion) is cheap, so the default
        # heavy_pool width of cpus//2 leaves near-half the box idle —
        # measured 152 s vs 92 s at 32 cores / 400k PoIs for 16 vs 28
        # actors.  cpus-4 keeps 4 whole CPUs for the feed stages and the
        # rollup shuffle; the cpus//2 floor keeps small boxes (<8 CPUs)
        # at the old width instead of collapsing to 1 actor
        from ..functions.joins import cluster_cpus

        cpus = cluster_cpus()
        kernel_conc = max(1, cpus // 2, cpus - 4)
    eref = ray.put(edges_coords)
    sampler = (vis.SamplePointsViewshedPolygon if poi_kind == "polygon"
               else vis.SamplePointsViewshed)
    pts = poi.map_batches(
        sampler,
        fn_constructor_kwargs=dict(
            edges_ref=eref, buffer_dist=buffer_dist, sample_dist=sample_dist,
            key_col=key_col,
        ),
        # one sampler batch → one kernel-feed block: 256-PoI batches
        # collapse a 2k-PoI input to 8 blocks, starving a 28-actor
        # kernel pool (Ray warned 'operator only received 8 inputs');
        # 64 keeps the pool fed at gate scale and is noise at 400k PoIs
        batch_format="pyarrow", batch_size=sample_batch_size,
        concurrency=as_pool(concurrency), num_cpus=0.25,
    )
    scored = pts.map_batches(
        vis.ViewshedGVI,
        fn_constructor_kwargs=dict(
            tile_root=tile_root, viewing_dist=viewing_dist,
            observer_height=observer_height, key_col=key_col,
        ),
        batch_format="pyarrow", batch_size=batch_size,
        **heavy_pool(kernel_conc),
    )
    # partial pre-aggregation: a PoI's sample points are generated
    # contiguously, so per-batch (key, Σgvi, n) partials shrink the
    # rollup shuffle from one row per sample point to ~one row per
    # (PoI, block) — the Aggregate otherwise owns the pipeline tail
    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        g = batch.column("GVI").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(keys, return_inverse=True)
        s = np.zeros(len(uniq))
        c = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, inv, g)
        np.add.at(c, inv, 1)
        return pa.table({key_col: pa.array(uniq), "gvi_sum": pa.array(s),
                         "gvi_n": pa.array(c)})

    agg = scored.map_batches(partial, batch_format="pyarrow").groupby(key_col).aggregate(
        Sum("gvi_sum", alias_name="s"), Sum("gvi_n", alias_name="n")
    )

    def finish(batch: pa.Table) -> pa.Table:
        sv = batch.column("s").to_numpy(zero_copy_only=False)
        nv = batch.column("n").to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = sv / nv
        return pa.table({
            key_col: batch.column(key_col),
            "GVI": pa.array(np.round(mean, 3)),  # visibility.py:564 round(3)
            "nr_of_points": pa.array(nv),
        })

    rollup = agg.map_batches(finish, batch_format="pyarrow")
    return rollup, scored


def streetview_gvi(
    poi_table: "pa.Table | ray.data.Dataset",
    edges_coords: pa.Table,
    features: pa.Table,
    buffer_dist: float = 100.0,
    interval: float = 50.0,
    key_col: str = "doc_id",
    concurrency: int | None = None,
    broadcast_threshold: int = 100_000,
    poi_kind: str = "point",
    crop_by_road_centres: bool = True,
) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """Streetview GVI with the stubbed segmentation scorer.

    edges → points every ``interval`` m → exact dedup (groupby point key)
    → semi-join vs PoI buffers → nearest image feature ≤100 m →
    SegmentationGVI actor → explode to PoIs → null-skipping Mean +
    non-null Count (pandas ``mean``/``count`` semantics,
    visibility.py:1048-1049).

    The PoI side may be a pyarrow Table (broadcast into the join actors)
    or a Dataset: Datasets over ``broadcast_threshold`` rows take the
    cell-bucketed shuffle join
    (:func:`~greenex_py_ray.stages.spatial_join.cell_buffer_join`) —
    the 10^12-doc path where the PoI table fits no single machine.
    """
    edges_ds = ray.data.from_arrow(edges_coords)
    pts = edges_ds.map_batches(
        lambda b: vis.streetview_sample_batch(b, interval), batch_format="pyarrow"
    )

    from ..stages.dedup import bucket_dedup
    from ..stages.spatial_join import cell_buffer_join

    pts = bucket_dedup(pts, subset=["sp_x", "sp_y"])  # D2: exact geometry dedup

    # the semi filter (before the feature/scoring stages) and the
    # rollup explode (after) are the SAME join with semi toggled; pick
    # its implementation once per PoI side so the shared middle
    # pipeline exists exactly once
    if poi_kind == "polygon":
        # polygon PoIs (polygon_type='neighbourhood') are a SIDE table
        # like greenspace/canopy — neighbourhood sets are orders of
        # magnitude smaller than the network/point sides, so the
        # broadcast membership join is the scale path here
        poly_cols = [key_col, "ring_x", "ring_y", "ring_sizes"]
        if isinstance(poi_table, ray.data.Dataset):
            poi_table = pa.concat_tables(
                t.select(poly_cols) for t in ray.get(
                    poi_table.select_columns(poly_cols).to_arrow_refs()))
        pref = ray.put(poi_table)

        def join_stage(ds, semi: bool):
            return ds.map_batches(
                vis.PointsToPolygonPoi,
                fn_constructor_kwargs=dict(
                    poly_ref=pref, buffer_dist=buffer_dist,
                    key_col=key_col, semi=semi),
                batch_format="pyarrow", concurrency=as_pool(concurrency),
                num_cpus=0.25,
            )
    else:
        poi_is_ds = isinstance(poi_table, ray.data.Dataset)
        if poi_is_ds:
            # materialize the 3-column projection ONCE: it feeds count()
            # and both join stages (fanning out an unmaterialized shared
            # lineage — especially one containing a limit() — re-executes
            # the decode per consumer and can stall the streaming
            # executor); 3 columns spill fine at scale
            poi_ds = poi_table.select_columns([key_col, "x", "y"]).materialize()
            use_shuffle = poi_ds.count() > broadcast_threshold
        else:
            poi_ds = None
            use_shuffle = False
        if use_shuffle:
            def join_stage(ds, semi: bool):
                return cell_buffer_join(ds, poi_ds, buffer_dist,
                                        key_col=key_col, semi=semi)
        else:
            if poi_is_ds:
                poi_table = pa.concat_tables(
                    t.select([key_col, "x", "y"])
                    for t in ray.get(poi_ds.to_arrow_refs())
                )
            pref = ray.put(poi_table)

            def join_stage(ds, semi: bool):
                return ds.map_batches(
                    vis.PointsToPoi,
                    fn_constructor_kwargs=dict(
                        poi_ref=pref, buffer_dist=buffer_dist,
                        key_col=key_col, semi=semi),
                    batch_format="pyarrow", concurrency=as_pool(concurrency),
                    num_cpus=0.25,
                )

    pts = join_stage(pts, True)
    fref = ray.put(features)
    pts = pts.map_batches(
        vis.NearestImageFeature,
        fn_constructor_kwargs=dict(features_ref=fref),
        batch_format="pyarrow", batch_size=256,
        concurrency=as_pool(concurrency), num_cpus=0.25,
    )
    scored = pts.map_batches(
        vis.SegmentationGVI,
        fn_constructor_kwargs=dict(crop_by_road_centres=crop_by_road_centres),
        batch_format="pyarrow",
        **heavy_pool(concurrency),
    )
    exploded = join_stage(scored, False)
    return _streetview_rollup(exploded, key_col)


def _streetview_rollup(exploded, key_col):
    """Shared per-PoI null-skipping Mean + non-null Count tail
    (visibility.py:1048-1049 pandas mean/count semantics)."""

    def pre_rollup(batch: pa.Table) -> pa.Table:
        g = batch.column("GVI").to_numpy(zero_copy_only=False)
        ok = np.isfinite(g)
        return pa.table(
            {
                key_col: batch.column(key_col),
                "gvi_sum": pa.array(np.where(ok, g, 0.0)),
                "gvi_n": pa.array(ok.astype(np.int64)),
            }
        )

    agg = exploded.map_batches(pre_rollup, batch_format="pyarrow") \
        .groupby(key_col).aggregate(Sum("gvi_sum"), Sum("gvi_n"))

    def finish(batch: pa.Table) -> pa.Table:
        s = batch.column("sum(gvi_sum)").to_numpy(zero_copy_only=False)
        n = batch.column("sum(gvi_n)").to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = np.where(n > 0, s / np.maximum(n, 1), np.nan)
        # a PoI whose every sample point lacks an image gets a NULL GVI
        # (pandas mean-of-empty semantics AND what SQL avg() yields —
        # a NaN here would hash-mismatch the oracle's NULL)
        gvi = pa.array(np.round(mean, 3), pa.float64(), mask=(n == 0))
        return pa.table(
            {
                key_col: batch.column(key_col),
                "GVI": gvi,
                "nr_of_points": pa.array(n),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow"), exploded


# ---------------------------------------------------------------------------
# Interleaved-document entry points
# ---------------------------------------------------------------------------


def get_viewshed_gvi_documents(
    documents_path: str, world_paths: dict, buffer_dist: float = 100.0,
    viewing_dist: float = 250.0, sample_dist: float = 50.0,
    concurrency: int | None = None,
):
    docs = doc_src.read_documents(documents_path)
    poi = doc_src.decode_geom(docs).select_columns(["doc_id", "x", "y"])
    edges = edge_coords_table(world_paths["network_nodes"], world_paths["network_edges"])
    return viewshed_gvi(
        poi, edges, world_paths["tiles"], buffer_dist=buffer_dist,
        viewing_dist=viewing_dist, sample_dist=sample_dist,
        concurrency=as_pool(concurrency),
    )


def get_streetview_gvi_documents(
    documents_path: str, world_paths: dict, buffer_dist: float = 100.0,
    concurrency: int | None = None,
):
    docs = doc_src.read_documents(documents_path)
    # Dataset PoI side: streetview_gvi broadcasts below its size
    # threshold and switches to the cell-bucketed shuffle join above it
    poi = doc_src.decode_geom(docs).select_columns(["doc_id", "x", "y"])
    edges = edge_coords_table(world_paths["network_nodes"], world_paths["network_edges"])
    features = pq.read_table(world_paths["image_features"])
    return streetview_gvi(poi, edges, features, buffer_dist=buffer_dist,
                          concurrency=as_pool(concurrency))
