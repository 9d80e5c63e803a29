"""Sequence packing (distributed prefix sum), unigram LM scoring,
KDE heatmap grid and NFC normalization — brute-force oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def test_sequence_pack_matches_window_cumsum(ray_session):
    from greenex_py_ray.stages.packing import sequence_pack

    rng = np.random.default_rng(3)
    n = 1000
    tok = rng.integers(0, 40, n).astype(np.int64)
    tok[17] = 0  # empty doc: NULL sequence range
    tbl = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                    "n_tokens": pa.array(tok)})
    L = 64
    # small bucket_span + many blocks so both passes genuinely shuffle
    ds = ray.data.from_arrow(tbl).repartition(16)
    out = (sequence_pack(ds, L, bucket_span=32).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    off = np.concatenate(([0], np.cumsum(tok)[:-1]))
    assert (out["offset"].to_numpy() == off).all()
    nz = tok > 0
    assert (out.loc[nz, "start_seq"].to_numpy(dtype=np.int64)
            == off[nz] // L).all()
    assert (out.loc[nz, "end_seq"].to_numpy(dtype=np.int64)
            == (off[nz] + tok[nz] - 1) // L).all()
    assert out.loc[~nz, "start_seq"].isna().all()
    assert out.loc[~nz, "end_seq"].isna().all()


def test_sequence_pack_sparse_keys(ray_session):
    from greenex_py_ray.stages.packing import sequence_pack

    # non-dense keys: holes in the id space must not shift offsets
    keys = np.array([3, 10, 11, 500, 501, 777], dtype=np.int64)
    tok = np.array([5, 7, 1, 100, 3, 2], dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(keys), "n_tokens": pa.array(tok)})).repartition(3)
    out = (sequence_pack(ds, 16, bucket_span=8).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    off = np.concatenate(([0], np.cumsum(tok)[:-1]))
    assert (out["offset"].to_numpy() == off).all()


def test_unigram_logprob_matches_bruteforce(ray_session):
    from greenex_py_ray.stages.lm import LOGP_Q, unigram_logprob

    docs = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": ["the cat sat", "the the the", "dog", "", "cat dog the"],
    })
    out = (unigram_logprob(ray.data.from_pandas(docs).repartition(2))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # corpus counts: the=5, cat=2, sat=1, dog=2 -> T=10
    T = 10.0
    q = {w: round(np.log(c / T) * LOGP_Q)
         for w, c in {"the": 5, "cat": 2, "sat": 1, "dog": 2}.items()}
    exp = [q["the"] + q["cat"] + q["sat"], 3 * q["the"], q["dog"], 0,
           q["cat"] + q["dog"] + q["the"]]
    assert list(out["n_words"]) == [3, 3, 1, 0, 3]
    assert list(out["sum_logp_q"]) == exp


def test_unigram_max_vocab_oov(ray_session):
    from greenex_py_ray.stages.lm import fit_unigram

    docs = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["a a a a", "b b", "c"],
    })
    vocab, w_q, oov_q = fit_unigram(
        ray.data.from_pandas(docs), max_vocab=2)
    assert list(vocab) == ["a", "b"]  # top-2 by count
    assert oov_q == round(np.log(0.5 / 7.0) * 1e6)


def test_kde_grid_matches_bruteforce(ray_session):
    from greenex_py_ray.stages.geostats import KDE_Q, kde_grid

    rng = np.random.default_rng(9)
    n = 400
    x = rng.uniform(0, 2000, n)
    y = rng.uniform(0, 2000, n)
    cs, sigma, r, g = 250.0, 200.0, 500.0, 8
    ds = ray.data.from_arrow(pa.table({
        "x": pa.array(x), "y": pa.array(y)})).repartition(4)
    out = kde_grid(ds, cs, sigma, r, g, g).to_pandas()
    got = {(int(a), int(b)): (int(c), int(d)) for a, b, c, d in
           zip(out["ix"], out["iy"], out["n_contrib"], out["density_q"])}

    exp = {}
    for i in range(g):
        for j in range(g):
            cx, cy = i * cs + cs / 2.0, j * cs + cs / 2.0
            d2 = (cx - x) ** 2 + (cy - y) ** 2
            m = d2 <= r * r
            if m.any():
                q = np.round(np.exp(-d2[m] / (2.0 * sigma * sigma))
                             * KDE_Q).astype(np.int64)
                exp[(i, j)] = (int(m.sum()), int(q.sum()))
    assert got == exp


def test_normalize_batch_nfc_and_whitespace():
    from greenex_py_ray.stages.scrub import normalize_batch

    # explicit decomposed forms so NFC composition is exercised
    t = pa.table({"text": pa.array(
        ["cafe\u0301  latte", "  a\u0300b ", "plain", None])})
    out = normalize_batch(t).to_pydict()
    assert out["norm_text"] == ["caf\u00e9 latte", "\u00e0b", "plain", ""]
    assert out["changed"] == [True, True, False, False]
