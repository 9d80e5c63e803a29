"""stages/windows: conversion funnel + sliding row-frame aggregates
against straight-line brute-force oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from greenex_py_ray.stages.windows import funnel, rolling_window, WIN_Q


def _events(n=400, users=9, seed=7):
    rng = np.random.default_rng(seed)
    ts = rng.integers(0, 10**9, n) * 1000  # microseconds
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(ts, unit="us").astype("datetime64[us]"),
        "user_id": rng.integers(0, users, n).astype(np.int64),
        "event_type": rng.choice(
            ["signup", "click", "purchase", "view"], n),
        "value": np.round(rng.uniform(-5, 5, n), 3),
    })


def _brute_funnel(df, steps):
    out = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values("ts", kind="stable")
        t = g["ts"].astype("int64").to_numpy()
        ty = g["event_type"].to_numpy()
        thr, done = -1, 0
        for s in steps:
            cand = t[(ty == s) & (t > thr)]
            if len(cand) == 0:
                break
            thr = cand.min()
            done += 1
        out.append((uid, done, thr if done == len(steps) else None))
    return {u: (d, c) for u, d, c in out}


def test_funnel_matches_bruteforce(ray_session):
    df = _events()
    steps = ["signup", "click", "purchase"]
    got = funnel(ray.data.from_pandas(df), steps,
                 num_buckets=4).to_pandas()
    want = _brute_funnel(df, steps)
    assert len(got) == len(want)
    for r in got.itertuples():
        d, c = want[r.user_id]
        assert r.steps_completed == d
        if c is None:
            assert pd.isna(r.complete_us)
        else:
            assert r.complete_us == c


def test_funnel_strictness_and_partial(ray_session):
    # same-timestamp step events do NOT chain (strict >); user 2 stalls
    ts = pd.to_datetime([100, 100, 200, 300, 100, 150],
                        unit="us").astype("datetime64[us]")
    df = pd.DataFrame({
        "event_id": np.arange(6, dtype=np.int64),
        "ts": ts,
        "user_id": np.array([1, 1, 1, 1, 2, 2], dtype=np.int64),
        "event_type": ["signup", "click", "click", "purchase",
                       "signup", "signup"],
        "value": np.zeros(6),
    })
    got = funnel(ray.data.from_pandas(df),
                 ["signup", "click", "purchase"],
                 num_buckets=2).to_pandas().set_index("user_id")
    assert got.loc[1, "steps_completed"] == 3
    assert got.loc[1, "complete_us"] == 300
    assert got.loc[2, "steps_completed"] == 1
    assert pd.isna(got.loc[2, "complete_us"])


def test_rolling_window_matches_pandas(ray_session):
    df = _events(300, users=5, seed=11)
    w = 5
    got = rolling_window(ray.data.from_pandas(df), w,
                         num_buckets=4).to_pandas()
    got = got.set_index("event_id").sort_index()
    df2 = df.copy()
    df2["ts_us"] = df2["ts"].astype("int64")
    df2["vq"] = np.round(df2["value"].to_numpy() * WIN_Q).astype(np.int64)
    df2 = df2.sort_values(["user_id", "ts_us", "event_id"],
                          kind="stable")
    exp_n = df2.groupby("user_id")["vq"].rolling(w, min_periods=1)
    exp = df2.assign(
        n_frame=exp_n.count().to_numpy().astype(np.int64),
        sum_q=exp_n.sum().to_numpy().astype(np.int64),
    ).set_index("event_id")
    assert len(got) == len(exp)
    assert (got["n_frame"] == exp["n_frame"].sort_index()).all()
    assert (got["sum_q"] == exp["sum_q"].sort_index()).all()
