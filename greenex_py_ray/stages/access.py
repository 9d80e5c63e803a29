"""Accessibility stages: nearest-greenspace distance (euclidean path).

Reimplements ``accessibility.get_shortest_distance_greenspace``'s
euclidean/centroids branch
(`/root/reference/GreenExp/accessibility.py:277-284,312-320`):

* per PoI, distance to the nearest greenspace centroid, ``round(d, 0)``;
* ``outcome = distance <= target_dist``;
* miss (no centroid found / beyond target) → distance set to
  ``target_dist`` and outcome False.

Physical plan: the greenspace side is SMALL relative to the documents —
it is broadcast once (``ray.put`` on the driver), each actor builds a
:class:`~greenex_py_ray.state.index.GridIndex` in ``__init__``, and the
per-batch body is an exact cell-local kNN with ring expansion.  No
shuffle at all on the big side (vs. the reference's per-row cKDTree
rebuild).  The network-distance branch lives in ``stages/netaccess.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..state.index import GridIndex, RectIndex


def _resolve(ref):
    return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref


class NearestGreenspace:
    """map_batches actor: append nearest-centroid distance + within flag."""

    def __init__(self, centroids_ref, target_dist: float, key_col: str = "doc_id",
                 index_cell: float = 500.0,
                 dist_name: str = "distance_to_greenspace",
                 flag_name: str = "greenspace_within_target"):
        t = _resolve(centroids_ref)  # pa.Table {gs_id, cx, cy}
        self.index = GridIndex(
            t.column("cx").to_numpy(zero_copy_only=False),
            t.column("cy").to_numpy(zero_copy_only=False),
            cell_size=index_cell,
        )
        self.gs_ids = t.column("gs_id").to_numpy(zero_copy_only=False)
        self.target = float(target_dist)
        self.key_col = key_col
        self.dist_name = dist_name
        self.flag_name = flag_name

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        d, idx = self.index.nearest(x, y)
        d = np.round(d, 0)  # accessibility.py:282
        outcome = d <= self.target  # accessibility.py:312-316
        # miss or beyond target → distance := target_dist (accessibility.py:318-320)
        dist = np.where(np.isfinite(d) & (d <= self.target), d, self.target)
        nearest_id = np.where(idx >= 0, self.gs_ids[np.maximum(idx, 0)], -1)
        return pa.table(
            {
                self.key_col: batch.column(self.key_col),
                self.dist_name: pa.array(dist),
                self.flag_name: pa.array(outcome),
                "nearest_gs_id": pa.array(nearest_id.astype(np.int64)),
            }
        )


class PointsInRects:
    """map_batches actor: semi-join of points against broadcast rectangles
    (the cell-refined point-in-polygon join of SURVEY J2/J6, restricted
    to axis-aligned AoIs so the DuckDB oracle is a BETWEEN join).

    Emits one row per (point, containing rect): (key, gs_id).
    """

    def __init__(self, rects_ref, key_col: str = "doc_id", index_cell: float = 1000.0):
        t = _resolve(rects_ref)  # pa.Table {gs_id, x0, y0, x1, y1}
        self.index = RectIndex(
            t.column("x0").to_numpy(zero_copy_only=False),
            t.column("y0").to_numpy(zero_copy_only=False),
            t.column("x1").to_numpy(zero_copy_only=False),
            t.column("y1").to_numpy(zero_copy_only=False),
            t.column("gs_id").to_numpy(zero_copy_only=False),
            cell_size=index_cell,
        )
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        qi, rj = self.index.containing(x, y)
        return pa.table(
            {
                self.key_col: batch.column(self.key_col).take(pa.array(qi)),
                "gs_id": pa.array(self.index.ids[rj].astype(np.int64)),
            }
        )
