"""TF-IDF query scoring (training-data op: lexical relevance ranking
for corpus curation and retrieval-style filtering).

Scale design: document frequencies are computed ONLY for the query's
terms — each batch collapses to at most ``len(query)`` partial (term,
df) rows before anything shuffles, so the DF aggregation moves
O(#query terms × #batches) rows no matter the corpus size; the
resulting {term: weight} map is tiny and rides into the scoring actors
as a constructor argument; scoring + global top-k run as a per-batch
partial-top-k scan (``stages/topk``), never a full sort.

Weights are smoothed sklearn-style idf, **quantized to 1e-6 and held
as integers** (``w = round((ln((N+1)/(df+1)) + 1) · 1e6)``): scores
are then exact BIGINT sums (``Σ tf·w``), so the ranking is
bit-deterministic across engines — a float Σ tf·idf could flip the
order of mathematically-tied documents on summation order alone.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

_WORD = re.compile(r"[a-zA-Z']+")


def _explode(batch: pd.DataFrame):
    """(parent_row, token_code, vocab) explode shared by DF and TF."""
    n = len(batch)
    toks = batch["text"].fillna("").str.lower().str.findall(_WORD)
    counts = toks.str.len().to_numpy(dtype=np.int64)
    parent = np.repeat(np.arange(n), counts)
    flat = (np.concatenate([np.asarray(t, dtype=object) for t in toks])
            if counts.sum() else np.empty(0, dtype=object))
    codes, uniq = pd.factorize(flat)
    return n, parent, codes, np.asarray(uniq, dtype=object)


def term_frequencies(batch: pd.DataFrame, terms) -> np.ndarray:
    """(n_rows, len(terms)) per-doc term counts, vectorized."""
    n, parent, codes, uniq = _explode(batch)
    tf = np.zeros((n, len(terms)), dtype=np.int64)
    for j, t in enumerate(terms):
        member = uniq == t
        if len(codes):
            np.add.at(tf[:, j], parent, member[codes].astype(np.int64))
    return tf


def query_term_weights(ds: "ray.data.Dataset", terms: "tuple[str, ...]",
                       n_docs: int) -> "dict[str, int]":
    """{term: quantized idf weight} for the query terms only."""
    terms = tuple(terms)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        tf = term_frequencies(batch, terms)
        return pd.DataFrame({"term": list(terms),
                             "df": (tf > 0).sum(axis=0).astype(np.int64)})

    rows = (ds.map_batches(partial, batch_format="pandas")
            .groupby("term").aggregate(Sum("df", alias_name="df"))
            .take_all())
    df = {r["term"]: int(r["df"]) for r in rows}
    return {t: int(round(round(
        np.log((n_docs + 1.0) / (df.get(t, 0) + 1.0)) + 1.0, 6) * 1e6))
        for t in terms}


class QueryScorer:
    """Actor stage: append the integer TF-IDF score for ONE query."""

    def __init__(self, weights: "dict[str, int]"):
        self.weights = dict(weights)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        terms = list(self.weights)
        tf = term_frequencies(batch, terms)
        w = np.array([self.weights[t] for t in terms], dtype=np.int64)
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "score_q6": tf @ w})


def tfidf_topk(ds: "ray.data.Dataset", terms: "tuple[str, ...]", k: int,
               key_col: str = "doc_id",
               concurrency=(1, 4)) -> "ray.data.Dataset":
    """Global top-k documents by quantized TF-IDF score against a fixed
    term query; ties broken by ``key_col``.  ``ds`` needs (key, text)."""
    from .topk import topk_per_group

    n_docs = ds.count()
    weights = query_term_weights(ds, terms, n_docs)
    scored = ds.map_batches(
        QueryScorer, fn_constructor_kwargs=dict(weights=weights),
        batch_format="pandas", concurrency=concurrency, num_cpus=0.25)

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("g", pa.array(np.zeros(len(b), np.int64)))

    tagged = scored.map_batches(tag, batch_format="pyarrow",
                                zero_copy_batch=True)
    out = topk_per_group(tagged, "g", "score_q6", k, key_col)
    return out.select_columns([key_col, "score_q6", "rank"])
