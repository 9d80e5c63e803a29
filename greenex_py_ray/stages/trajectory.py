"""Trajectory aggregation: per-entity path length and displacement.

The GPS-track rollup the reference's per-PoI network walks imply but
never ship standalone: given a stream of (entity, timestamp, x, y)
pings, compute each entity's total path length (sum of consecutive-ping
great-/plane-distances), net displacement (first→last ping) and ping
count.

Scale shape (same as ``stages/asof.sessionize``): entities are
HASH-BUCKETED (``id % num_buckets``) so the shuffle has ``num_buckets``
groups; inside a bucket the multi-entity kernel is one lexsort +
vectorized diff/reduceat pass — no per-entity pandas calls.

Cross-engine determinism: each step length quantizes to int64
micro-units (``round(sqrt(d2) * 1e6)``) BEFORE the per-entity sum, so
the unordered SQL SUM matches numpy's sequential sum exactly (sqrt is
correctly rounded in both engines; d2 uses the same multiply/add
order).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

#: step-length quantization (micro-units)
TRAJ_Q = 1e6


def trajectory_stats(ds: "ray.data.Dataset",
                     id_col: str = "user_id", ts_col: str = "ts",
                     order_col: str = "event_id",
                     x_col: str = "x", y_col: str = "y",
                     num_buckets: int = 64) -> "ray.data.Dataset":
    """One row per entity: ``n_pings``, ``path_q`` (int64 micro-unit
    total path length), ``disp_q`` (micro-unit first→last
    displacement).  Ordering is (ts, order_col) within entity."""

    def add_bucket(b: pa.Table) -> pa.Table:
        u = b.column(id_col).to_numpy(zero_copy_only=False)
        ts = b.column(ts_col)
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        return pa.table({
            id_col: b.column(id_col),
            "ts_us": ts,
            order_col: b.column(order_col),
            x_col: b.column(x_col),
            y_col: b.column(y_col),
            "bucket": pa.array((u % num_buckets).astype(np.int64)),
        })

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        u = g[id_col].to_numpy(np.int64)
        t = g["ts_us"].to_numpy(np.int64)
        e = g[order_col].to_numpy(np.int64)
        x = g[x_col].to_numpy(np.float64)
        y = g[y_col].to_numpy(np.float64)
        order = np.lexsort((e, t, u))
        u, t, x, y = u[order], t[order], x[order], y[order]
        same = np.zeros(len(u), dtype=bool)
        if len(u) > 1:
            same[1:] = u[1:] == u[:-1]
        dx = np.empty(len(u))
        dy = np.empty(len(u))
        dx[0] = dy[0] = 0.0
        if len(u) > 1:
            dx[1:] = x[1:] - x[:-1]
            dy[1:] = y[1:] - y[:-1]
        step_q = np.where(
            same, np.round(np.sqrt(dx * dx + dy * dy) * TRAJ_Q), 0.0
        ).astype(np.int64)
        starts = np.flatnonzero(~same)
        ends = np.concatenate((starts[1:], [len(u)])) - 1
        n = (ends - starts + 1).astype(np.int64)
        path_q = np.add.reduceat(step_q, starts)
        ddx = x[ends] - x[starts]
        ddy = y[ends] - y[starts]
        disp_q = np.round(np.sqrt(ddx * ddx + ddy * ddy)
                          * TRAJ_Q).astype(np.int64)
        return pd.DataFrame({
            id_col: u[starts],
            "n_pings": n,
            "path_q": path_q,
            "disp_q": disp_q,
        })

    return (ds.map_batches(add_bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bucket").map_groups(kernel, batch_format="pandas"))
