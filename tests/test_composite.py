"""Multi-date max-composite stage tests."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from greenex_py_ray.stages.composite import max_composite_stats


def test_max_composite_two_dates():
    # tile (0,0): date0=[0.1, 0.5], date1=[0.3, 0.2] → max=[0.3, 0.5]
    # tile (1,0): date0=[-0.2, 0.0], date1=[-0.1, -0.4] → max=[-0.1, 0.0]
    t = pa.table({
        "tx": pa.array([0, 0, 1, 1], pa.int64()),
        "ty": pa.array([0, 0, 0, 0], pa.int64()),
        "date": pa.array([0, 1, 0, 1], pa.int64()),
        "vals": pa.array([[0.1, 0.5], [0.3, 0.2],
                          [-0.2, 0.0], [-0.1, -0.4]],
                         pa.list_(pa.float64())),
    })
    out = {(r["tx"], r["ty"]): r for r in
           max_composite_stats(rd.from_arrow(t), 2).take_all()}
    a = out[(0, 0)]
    assert a["n_px"] == 2 and a["sum_q"] == 800_000
    assert a["mean_v"] == pytest.approx(0.4)
    b = out[(1, 0)]
    assert b["sum_q"] == -100_000
    assert b["mean_v"] == pytest.approx(-0.05)


def test_max_composite_order_independent():
    rng = np.random.default_rng(5)
    rows = []
    for tx in range(4):
        for d in range(3):
            rows.append((tx, 0, d, rng.uniform(-1, 1, 16)))
    t = pa.table({
        "tx": pa.array([r[0] for r in rows], pa.int64()),
        "ty": pa.array([r[1] for r in rows], pa.int64()),
        "date": pa.array([r[2] for r in rows], pa.int64()),
        "vals": pa.array([list(r[3]) for r in rows],
                         pa.list_(pa.float64())),
    })
    perm = rng.permutation(len(rows))
    a = max_composite_stats(
        rd.from_arrow(t), 3).take_all()
    b = max_composite_stats(
        rd.from_arrow(t.take(pa.array(perm))), 3).take_all()
    ka = {(r["tx"], r["ty"]): r["sum_q"] for r in a}
    kb = {(r["tx"], r["ty"]): r["sum_q"] for r in b}
    assert ka == kb
