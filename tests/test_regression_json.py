"""group_ols vs numpy lstsq; token entropy vs brute force; JSON prop
extraction edge cases."""

import math

import numpy as np
import pyarrow as pa

import ray
import ray.data


def test_group_ols_matches_polyfit(ray_session):
    from greenex_py_ray.stages.regression import group_ols

    rng = np.random.default_rng(41)
    n = 4000
    g = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    x = rng.integers(0, 100_000, n).astype(np.int64)
    y = np.round(0.25 * x / 1000 + rng.normal(0, 5, n), 2)
    tbl = pa.table({"g": pa.array(g), "x": pa.array(x), "y": pa.array(y)})

    out = (group_ols(ray.data.from_arrow(tbl).repartition(7), "g", "x", "y")
           .to_pandas().set_index("g").sort_index())
    for grp in "abc":
        m = g == grp
        yq = np.round(y[m] * 100.0, 0) / 100.0  # the op fits quantized y
        slope, intercept = np.polyfit(x[m].astype(float), yq, 1)
        assert out.loc[grp, "n"] == m.sum()
        assert abs(out.loc[grp, "slope"] - slope) < 1e-9
        assert abs(out.loc[grp, "intercept"] - intercept) < 1e-6


def test_group_ols_degenerate_group(ray_session):
    from greenex_py_ray.stages.regression import group_ols

    tbl = pa.table({"g": pa.array(["z", "z", "w"]),
                    "x": pa.array([5, 5, 1], pa.int64()),
                    "y": pa.array([1.0, 2.0, 3.0])})
    out = (group_ols(ray.data.from_arrow(tbl), "g", "x", "y")
           .to_pandas().set_index("g"))
    assert np.isnan(out.loc["z", "slope"])  # zero x-variance
    assert np.isnan(out.loc["w", "slope"])  # n == 1


def test_token_entropy_matches_bruteforce(ray_session):
    from greenex_py_ray.stages.text import token_entropy_batch

    texts = ["a a a a", "a b c d", "a a b b c", "", "   ", "solo"]
    tbl = pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                    "text": pa.array(texts)})
    out = token_entropy_batch(tbl).to_pandas().set_index("doc_id")

    for i, t in enumerate(texts):
        toks = t.split()
        n = len(toks)
        assert out.loc[i, "n_tokens"] == n
        exp = 0
        for w in set(toks):
            c = toks.count(w)
            exp -= round(c * math.log(c / n) * 1e6)
        if n == 0:
            exp = 0
        assert out.loc[i, "ent_q"] == exp
    # uniform distribution maximizes entropy for fixed n
    assert out.loc[1, "ent_q"] > out.loc[2, "ent_q"] > out.loc[0, "ent_q"]


def test_extract_json_int_edges(ray_session):
    from greenex_py_ray.stages.text import extract_json_int

    tbl = pa.table({"props": pa.array(
        ['{"k": 69}', '{"k": -4, "j": 1}', '{"j": 2}', None, "{}"])})
    out = extract_json_int(tbl, "k").to_pandas()
    assert out["k"][0] == 69
    assert out["k"][1] == -4
    assert out["k"][2:].isna().all()
