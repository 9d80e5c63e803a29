"""Network-distance accessibility + isochrone ("network buffer") AoIs.

Stateful actor-pool stages holding the street graph (SURVEY §2.3
"GraphActor"): the graph tables are broadcast once (``ray.put``), each
actor builds a :class:`~greenex_py_ray.state.graph.CSRGraph` in
``__init__``, and per-batch work is Dijkstra-based.

Replicated semantics (with citations):

* ``NetworkDistance`` — accessibility.py:226-273 network branch:
  nearest node (J3), ego subgraph radius ``1.5*target_dist`` by length,
  pseudo-entrances = subgraph nodes < 20 m from a candidate greenspace
  boundary (J4), distance = network distance + euclidean home snap
  (+ entrance→centroid penalty when ``destination='centroids'``),
  ``round(min, 0)``; miss/beyond → distance := target, flag False
  (:312-320).  Candidate greenspaces are those whose boundary comes
  within ``target_dist`` of the PoI (the reference's
  ``clip(buffer(target_dist))`` pre-filter, :228 — see the deviation
  note in the class docstring).

* ``IsochroneZonal`` — availability.py:263-275 + make_iso_poly
  (:1042-1065): ego subgraph at ``buffer_dist``, isochrone area =
  25 m capsules around subgraph edges with holes filled
  (``Polygon(union.exterior)``), zonal mean/std of the band over pixels
  whose centers fall inside (clamp ≥0, population std, round 3 —
  :289).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..sources import synth
from ..state.graph import CSRGraph, fill_holes, points_to_segments_dist
from ..state.index import GridIndex
from ..state.tiles import TileStore


def _resolve(ref):
    return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref


def _graph_from_tables(nodes: pa.Table, edges: pa.Table) -> CSRGraph:
    return CSRGraph(
        nodes.column("node_id").to_numpy(zero_copy_only=False),
        nodes.column("x").to_numpy(zero_copy_only=False),
        nodes.column("y").to_numpy(zero_copy_only=False),
        edges.column("u").to_numpy(zero_copy_only=False),
        edges.column("v").to_numpy(zero_copy_only=False),
        edges.column("length").to_numpy(zero_copy_only=False),
    )


def _rings_from_table(gs: pa.Table):
    """greenspace table → list of (gs_id, exterior ring ndarray (N,2),
    centroid xy)."""
    out = []
    ids = gs.column("gs_id").to_pylist()
    rings_col = gs.column("rings").to_pylist()
    cx = gs.column("centroid_x").to_pylist()
    cy = gs.column("centroid_y").to_pylist()
    for i, rlist in enumerate(rings_col):
        ring = np.array([[p["x"], p["y"]] for p in rlist[0]], dtype=np.float64)
        out.append((ids[i], ring, cx[i], cy[i]))
    return out


class NetworkDistance:
    """map_batches actor: network shortest distance to greenspace.

    Deviation vs the reference: entrance nodes are tested against the
    ORIGINAL greenspace boundary, not the boundary of the
    ``clip(buffer)`` result — the clip arc of the reference introduces
    artificial boundary segments; candidates are pre-filtered to
    boundaries within ``target_dist`` of the PoI, which preserves the
    reference's candidate set.
    """

    def __init__(self, nodes_ref, edges_ref, greenspace_ref,
                 target_dist: float, destination: str = "centroids",
                 distance_type: str = "network", key_col: str = "doc_id",
                 dist_name: str = "distance_to_greenspace",
                 flag_name: str = "greenspace_within_target"):
        self.graph = _graph_from_tables(_resolve(nodes_ref), _resolve(edges_ref))
        gs = _resolve(greenspace_ref)
        self.greenspaces = _rings_from_table(gs)
        # grid index over ring vertices for candidate prefilter
        vx = np.concatenate([g[1][:, 0] for g in self.greenspaces])
        vy = np.concatenate([g[1][:, 1] for g in self.greenspaces])
        self.vert_owner = np.concatenate(
            [np.full(len(g[1]), i, dtype=np.int64) for i, g in enumerate(self.greenspaces)]
        )
        self.vert_index = GridIndex(vx, vy, cell_size=500.0)
        self.target = float(target_dist)
        self.destination = destination
        # "network": Dijkstra distances (accessibility.py:234-273);
        # "euclidean" (+ destination="entrance"): straight-line distance
        # to the nearest pseudo-entrance node (accessibility.py:286-301)
        self.distance_type = distance_type
        self.key_col = key_col
        self.dist_name = dist_name
        self.flag_name = flag_name

    def _candidates(self, x: float, y: float) -> list[int]:
        """Greenspaces whose ring comes within target_dist of the PoI.

        Vertex-grid prefilter with a margin of the longest ring edge,
        refined by exact segment distance."""
        qi, pj, _ = self.vert_index.within(np.array([x]), np.array([y]),
                                           self.target + 1500.0)
        cands = np.unique(self.vert_owner[pj])
        keep = []
        for ci in cands:
            ring = self.greenspaces[ci][1]
            d = points_to_segments_dist(
                np.array([x]), np.array([y]),
                ring[:, 0], ring[:, 1],
                np.roll(ring[:, 0], -1), np.roll(ring[:, 1], -1),
            )[0]
            if d <= self.target:
                keep.append(ci)
        return keep

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        n = len(x)
        dist_out = np.full(n, self.target)
        flag_out = np.zeros(n, dtype=bool)
        g = self.graph
        for i in range(n):
            cands = self._candidates(x[i], y[i])
            if not cands:
                continue
            pos, snap = g.nearest_node(np.array([x[i]]), np.array([y[i]]))
            src = int(pos[0])
            penalty_home = float(snap[0])
            reach = g.dijkstra(src, cutoff=self.target * 1.5)
            if not reach:
                continue
            ego = np.fromiter(reach.keys(), dtype=np.int64, count=len(reach))
            ego_d = np.fromiter(reach.values(), dtype=np.float64, count=len(reach))
            nx_, ny_ = g.x[ego], g.y[ego]
            best = np.inf
            for ci in cands:
                gs_id, ring, cx, cy = self.greenspaces[ci]
                bd = points_to_segments_dist(
                    nx_, ny_, ring[:, 0], ring[:, 1],
                    np.roll(ring[:, 0], -1), np.roll(ring[:, 1], -1),
                )
                ent = bd < 20.0  # accessibility.py:243-246
                if not ent.any():
                    continue
                if self.distance_type == "euclidean":
                    # euclidean/entrance branch: straight-line PoI →
                    # pseudo-entrance (accessibility.py:295-299)
                    d = np.sqrt((nx_[ent] - x[i]) ** 2 + (ny_[ent] - y[i]) ** 2)
                else:
                    d = ego_d[ent] + penalty_home
                    if self.destination == "centroids":
                        d = d + np.sqrt((nx_[ent] - cx) ** 2 + (ny_[ent] - cy) ** 2)
                m = d.min()
                if m < best:
                    best = m
            if np.isfinite(best):
                m = np.round(best, 0)  # accessibility.py:269-271
                if m <= self.target:
                    dist_out[i] = m
                    flag_out[i] = True
        return pa.table(
            {
                self.key_col: batch.column(self.key_col),
                self.dist_name: pa.array(dist_out),
                self.flag_name: pa.array(flag_out),
            }
        )


class IsochroneZonal:
    """map_batches actor: per-PoI isochrone AoI + zonal band stats.

    One actor = graph + tile cache; per row: Dijkstra ego subgraph →
    capsule mask over the covering pixel window → hole fill → clamped
    mean/std (availability.py:289 semantics).  Emits final metrics
    directly (the AoI never leaves the actor — no polygon shuffle).
    """

    def __init__(self, nodes_ref, edges_ref, tile_root: str,
                 buffer_dist: float, band: str = "ndvi",
                 edge_buff: float = 25.0, key_col: str = "doc_id",
                 mean_name: str = "mean_NDVI", std_name: str = "std_NDVI"):
        self.graph = _graph_from_tables(_resolve(nodes_ref), _resolve(edges_ref))
        self.store = TileStore(tile_root, capacity=256)
        self.buffer_dist = float(buffer_dist)
        self.edge_buff = float(edge_buff)
        self.band = band
        self.key_col = key_col
        self.mean_name = mean_name
        self.std_name = std_name

    def _aoi_stats(self, x: float, y: float):
        g = self.graph
        pos, _ = g.nearest_node(np.array([x]), np.array([y]))
        reach = g.dijkstra(int(pos[0]), cutoff=self.buffer_dist)
        ego = set(reach.keys())
        eu, ev = g.ego_edges(ego)
        if len(eu) == 0:
            return np.nan, np.nan
        ax, ay = g.x[eu], g.y[eu]
        bx, by = g.x[ev], g.y[ev]
        res = synth.RASTER_RES
        c0 = int(np.floor((min(ax.min(), bx.min()) - self.edge_buff) / res))
        c1 = int(np.floor((max(ax.max(), bx.max()) + self.edge_buff) / res))
        r0 = int(np.floor((min(ay.min(), by.min()) - self.edge_buff) / res))
        r1 = int(np.floor((max(ay.max(), by.max()) + self.edge_buff) / res))
        h, w = r1 - r0 + 1, c1 - c0 + 1
        px = (np.arange(c0, c1 + 1, dtype=np.float64) + 0.5) * res
        py = (np.arange(r0, r1 + 1, dtype=np.float64) + 0.5) * res
        gx, gy = np.meshgrid(px, py, indexing="xy")
        d = points_to_segments_dist(gx.ravel(), gy.ravel(), ax, ay, bx, by)
        mask = (d <= self.edge_buff).reshape(h, w)
        mask = fill_holes(mask)
        vals = self.store.window(self.band, r0, c0, h, w)[mask]
        vals = vals[np.isfinite(vals)]
        if vals.size == 0:
            return np.nan, np.nan
        vals = np.maximum(vals, 0.0)
        mean = vals.mean()
        return round(float(mean), 3), round(float(vals.std()), 3)

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        means = np.empty(len(x))
        stds = np.empty(len(x))
        for i in range(len(x)):
            means[i], stds[i] = self._aoi_stats(x[i], y[i])
        # empty AoI (no ego edges / no pixels) → NULL, matching the SQL
        # oracle's empty-group aggregate (a NaN would hash-mismatch)
        miss = ~np.isfinite(means)
        return pa.table(
            {
                self.key_col: batch.column(self.key_col),
                self.mean_name: pa.array(means, pa.float64(), mask=miss),
                self.std_name: pa.array(stds, pa.float64(), mask=miss),
            }
        )
