"""Ordered-sequence analytics over event streams: conversion funnels
and sliding row-frame window aggregates.

The reference engine has no event-funnel surface; these belong to the
large-scale-pipeline family (sessionize / trajectory / as-of) that a
training-data or product-analytics workload runs over the same event
table.  Scale shape is identical to ``stages/asof.sessionize``:
entities are HASH-BUCKETED (``user_id % num_buckets``) so the single
shuffle has ``num_buckets`` groups, and the per-bucket kernel is one
lexsort plus vectorized segment passes — never a Python loop over
users or rows.

Funnel semantics (the standard product-analytics definition, exactly
SQL-reproducible): ``t_1(u) = min ts where type = step_1``;
``t_k(u) = min ts where type = step_k and ts > t_{k-1}(u)`` — each
step must be STRICTLY later than the previous step's earliest match.
Timestamps ride as int64 microseconds end-to-end so every comparison
is integer-exact in both engines.

Rolling window semantics: per entity, events ordered by
``(ts, order_col)``; emit the trailing ``window``-row frame count and
sum (``ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW``).  Values are
quantized to int64 micro-units BEFORE the cumulative sum (same
convention as ``stages/trajectory.py``) so the frame sums are
order-independent exact integers in both engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

#: micro-unit quantization for window value sums
WIN_Q = 1e6
_I64_MAX = np.iinfo(np.int64).max


def _bucketed_events(ds: "ray.data.Dataset", user_col: str, ts_col: str,
                     keep: list[str], num_buckets: int) -> "ray.data.Dataset":
    """Project to (user, int64-us ts, *keep, bucket) — one zero-copy
    Arrow pass, the only full-data stage before the bucket shuffle."""

    def add_bucket(b: pa.Table) -> pa.Table:
        u = b.column(user_col).to_numpy(zero_copy_only=False)
        ts = b.column(ts_col)
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        cols = {user_col: b.column(user_col), "ts_us": ts}
        for c in keep:
            cols[c] = b.column(c)
        cols["bucket"] = pa.array((u % num_buckets).astype(np.int64))
        return pa.table(cols)

    return ds.map_batches(add_bucket, batch_format="pyarrow",
                          zero_copy_batch=True)


def funnel(ds: "ray.data.Dataset", steps: list[str],
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type",
           num_buckets: int = 64) -> "ray.data.Dataset":
    """Per-user conversion funnel over ``steps``: one output row per
    user with ``steps_completed`` (0..len(steps)) and ``complete_us``
    (int64 microseconds of the earliest full completion, NULL when the
    user never finishes).

    Kernel: within a bucket, one lexsort by (user, ts); per step a
    masked segmented ``np.minimum.reduceat`` advances every user's
    threshold at once — O(len(steps) × bucket_rows), no per-user loop.
    Event types are factorized to int codes once so the per-step mask
    is an integer compare, not a string compare."""
    steps = list(steps)
    if not steps:
        raise ValueError("funnel needs at least one step")

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({user_col: pd.Series([], dtype="int64"),
                                 "steps_completed": pd.Series([], dtype="int64"),
                                 "complete_us": pd.array([], dtype="Int64")})
        u = g[user_col].to_numpy(np.int64)
        t = g["ts_us"].to_numpy(np.int64)
        codes_raw, uniq = pd.factorize(g[type_col])
        step_code = {s: i for i, s in enumerate(uniq)}
        codes = codes_raw.astype(np.int64)
        order = np.lexsort((t, u))
        u, t, codes = u[order], t[order], codes[order]
        ubrk = np.ones(len(u), dtype=bool)
        if len(u) > 1:
            ubrk[1:] = u[1:] != u[:-1]
        ustarts = np.flatnonzero(ubrk)
        useg = np.cumsum(ubrk) - 1            # per-row user ordinal
        nu = len(ustarts)
        thr = np.full(nu, np.int64(-1))       # last matched step time
        alive = np.ones(nu, dtype=bool)
        done = np.zeros(nu, dtype=np.int64)
        for s in steps:
            sc = step_code.get(s, -2)         # -2: absent from bucket
            cand = (codes == sc) & alive[useg] & (t > thr[useg])
            tt = np.where(cand, t, _I64_MAX)
            best = np.minimum.reduceat(tt, ustarts) if len(tt) else \
                np.empty(0, np.int64)
            hit = alive & (best < _I64_MAX)
            thr = np.where(hit, best, thr)
            done += hit
            alive = hit
            if not alive.any():
                break
        complete = done == len(steps)
        out = pd.DataFrame({
            user_col: u[ustarts],
            "steps_completed": done,
            "complete_us": pd.array(
                np.where(complete, thr, 0), dtype="Int64"),
        })
        out.loc[~complete, "complete_us"] = pd.NA
        return out

    return (_bucketed_events(ds, user_col, ts_col, [type_col], num_buckets)
            .groupby("bucket")
            .map_groups(kernel, batch_format="pandas"))


def rolling_window(ds: "ray.data.Dataset", window: int,
                   user_col: str = "user_id", ts_col: str = "ts",
                   order_col: str = "event_id", value_col: str = "value",
                   num_buckets: int = 64) -> "ray.data.Dataset":
    """Trailing ``window``-row frame aggregate per entity: one output
    row per input event with ``n_frame`` (rows in frame) and
    ``sum_q`` (int64 micro-unit frame sum of ``value_col``).

    Kernel: lexsort by (user, ts, order), quantize values to int64
    micro-units, one cumulative sum; each row's frame sum is two
    cumsum lookups (``cs[i+1] - cs[i+1-win]``) with the frame width
    clipped at the user's segment start — fully vectorized."""
    if window < 1:
        raise ValueError("window must be >= 1")

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({user_col: pd.Series([], dtype="int64"),
                                 order_col: pd.Series([], dtype="int64"),
                                 "n_frame": pd.Series([], dtype="int64"),
                                 "sum_q": pd.Series([], dtype="int64")})
        u = g[user_col].to_numpy(np.int64)
        t = g["ts_us"].to_numpy(np.int64)
        e = g[order_col].to_numpy(np.int64)
        v = g[value_col].to_numpy(np.float64)
        order = np.lexsort((e, t, u))
        u, t, e, v = u[order], t[order], e[order], v[order]
        vq = np.round(v * WIN_Q).astype(np.int64)
        ubrk = np.ones(len(u), dtype=bool)
        if len(u) > 1:
            ubrk[1:] = u[1:] != u[:-1]
        ustarts = np.flatnonzero(ubrk)
        runs = np.diff(np.concatenate((ustarts, [len(u)])))
        seg_start = np.repeat(ustarts, runs)
        i = np.arange(len(u), dtype=np.int64)
        win = np.minimum(i - seg_start + 1, window)
        cs = np.concatenate(([0], np.cumsum(vq)))
        return pd.DataFrame({
            user_col: u,
            order_col: e,
            "n_frame": win.astype(np.int64),
            "sum_q": cs[i + 1] - cs[i + 1 - win],
        })

    return (_bucketed_events(ds, user_col, ts_col, [order_col, value_col],
                             num_buckets)
            .groupby("bucket")
            .map_groups(kernel, batch_format="pandas"))
