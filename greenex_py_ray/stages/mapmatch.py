"""Map matching: snap points to the nearest road segment.

The reference snaps streetview sample points to OSM road centrelines
before fetching imagery (GreenExp/visibility.py — sample points are
generated *on* the network and images matched within 100 m); the
general form of that operation is point→nearest-segment projection, the
workhorse of GPS map matching.

Scale shape: the segment table is the small side (a road network is
10^6–10^8 edges vs 10^12 points), broadcast once via ``ray.put``; each
actor builds a uniform-grid segment index in ``__init__`` (cell size =
snap radius, each segment registered in every cell its R-expanded bbox
overlaps) so per-batch work is one vectorized projection per (point,
candidate) pair gathered cell-by-cell — no all-to-all shuffle.  For a
network too big to broadcast, the same kernel drops into
``cell_pip_join``'s groupby-cell shuffle with segments replicated to
covered cells (documented partitioning assumption; not needed at any
tested scale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


class SegmentSnapper:
    """Actor stage: nearest-segment snap within ``radius``.

    Input batch: ``key_col`` + point columns ``x``/``y``.
    Output: input keys + ``edge_key`` (int64), ``snap_t`` (clamped
    projection parameter), ``snap_dist`` — one row per point that has a
    segment within the radius (points with no candidate are dropped,
    like the reference's 100 m image-match cutoff).

    Ties on distance break toward the smallest ``edge_key`` so results
    are deterministic and SQL-reproducible.
    """

    def __init__(self, edges_ref, radius: float, key_col: str = "doc_id"):
        t = ray.get(edges_ref) if isinstance(edges_ref, ray.ObjectRef) else edges_ref
        ek = t.column("edge_key").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ek, kind="stable")  # argmin tie → lowest key
        self.ek = ek[order]
        self.ax = t.column("ax").to_numpy(zero_copy_only=False)[order]
        self.ay = t.column("ay").to_numpy(zero_copy_only=False)[order]
        self.bx = t.column("bx").to_numpy(zero_copy_only=False)[order]
        self.by = t.column("by").to_numpy(zero_copy_only=False)[order]
        self.radius = float(radius)
        self.key_col = key_col

        # uniform grid over segment bboxes expanded by R: any segment
        # within R of a point covers the point's cell.
        cs = self.radius
        x0 = np.minimum(self.ax, self.bx) - cs
        x1 = np.maximum(self.ax, self.bx) + cs
        y0 = np.minimum(self.ay, self.by) - cs
        y1 = np.maximum(self.ay, self.by) + cs
        gx0 = np.floor(x0 / cs).astype(np.int64)
        gx1 = np.floor(x1 / cs).astype(np.int64)
        gy0 = np.floor(y0 / cs).astype(np.int64)
        gy1 = np.floor(y1 / cs).astype(np.int64)
        # CSR cell → segment indices (vectorized expansion)
        spans = (gx1 - gx0 + 1) * (gy1 - gy0 + 1)
        seg_idx = np.repeat(np.arange(len(ek)), spans)
        # per-repeat local offset → (dx, dy) within the bbox cell range
        tot = int(spans.sum())
        local = np.arange(tot) - np.repeat(np.cumsum(spans) - spans, spans)
        w = np.repeat(gy1 - gy0 + 1, spans)
        cx = np.repeat(gx0, spans) + local // w
        cy = np.repeat(gy0, spans) + local % w
        key = cx << np.int64(32) | (cy & np.int64(0xFFFFFFFF))
        srt = np.argsort(key, kind="stable")
        self.cell_keys, starts = np.unique(key[srt], return_index=True)
        self.cell_offsets = np.append(starts, tot)
        self.cell_segs = seg_idx[srt]

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch.column("x").to_numpy(zero_copy_only=False)
        py = batch.column("y").to_numpy(zero_copy_only=False)
        n = len(px)
        cs = self.radius
        pcell = (np.floor(px / cs).astype(np.int64) << np.int64(32)
                 | (np.floor(py / cs).astype(np.int64) & np.int64(0xFFFFFFFF)))

        best_d2 = np.full(n, np.inf)
        best_i = np.full(n, -1, dtype=np.int64)
        best_t = np.zeros(n)
        # group batch points by grid cell; one vectorized
        # (pts-in-cell × candidate-segs) projection per occupied cell
        for ck in np.unique(pcell):
            loc = np.searchsorted(self.cell_keys, ck)
            if loc >= len(self.cell_keys) or self.cell_keys[loc] != ck:
                continue
            cand = self.cell_segs[self.cell_offsets[loc]:self.cell_offsets[loc + 1]]
            m = pcell == ck
            qx = px[m][:, None]
            qy = py[m][:, None]
            ax, ay = self.ax[cand][None, :], self.ay[cand][None, :]
            dx = self.bx[cand][None, :] - ax
            dy = self.by[cand][None, :] - ay
            len2 = dx * dx + dy * dy
            dot = (qx - ax) * dx + (qy - ay) * dy
            t = np.divide(dot, len2, out=np.zeros_like(dot), where=len2 != 0.0)
            # +0.0 canonicalizes -0.0 → +0.0 so snap_t is bit-identical
            # to the SQL oracle (DuckDB greatest(-0.0, 0.0) keeps -0.0,
            # np.maximum returns +0.0; both sides add +0.0).
            tc = np.minimum(np.maximum(t, 0.0), 1.0) + 0.0
            ex = qx - (ax + tc * dx)
            ey = qy - (ay + tc * dy)
            d2 = ex * ex + ey * ey
            j = np.argmin(d2, axis=1)  # first min → lowest edge_key (sorted)
            rows = np.arange(d2.shape[0])
            best_d2[m] = d2[rows, j]
            best_i[m] = cand[j]
            best_t[m] = tc[rows, j]

        keep = best_d2 <= self.radius * self.radius
        ki = best_i[keep]
        return pa.table({
            self.key_col: batch.column(self.key_col).filter(pa.array(keep)),
            "edge_key": pa.array(self.ek[ki]),
            "snap_t": pa.array(best_t[keep]),
            "snap_dist": pa.array(np.sqrt(best_d2[keep])),
        })


def snap_to_segments(points: "ray.data.Dataset", edges: pa.Table,
                     radius: float, key_col: str = "doc_id",
                     concurrency=(1, 8)) -> "ray.data.Dataset":
    """Broadcast-index snap: ``edges`` (edge_key, ax, ay, bx, by) is
    ``ray.put`` once; every actor builds the grid index in its ctor."""
    ref = ray.put(edges)
    return points.map_batches(
        SegmentSnapper,
        fn_constructor_kwargs=dict(edges_ref=ref, radius=radius, key_col=key_col),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency, num_cpus=0.5,
    )
