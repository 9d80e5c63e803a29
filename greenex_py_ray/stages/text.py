"""Text-analysis stages for the training-data pipeline.

Beyond the reference's geospatial operators, a 100 TB document pipeline
needs text hygiene operators; these run over the driver ``documents``
table (``doc_id, text, lang, source, n_chars``) and over ``kind="text"``
spans of the interleaved table.  All are stateless-vectorized or
actor-pool ``map_batches`` stages.

SQL-oracle notes: ``token_count`` uses whitespace splitting with the
exact semantics of DuckDB ``string_split_regex(trim(text), '\\s+')`` so
the gate oracle reproduces it; ``fingerprint`` uses a polynomial rolling
hash over bytes that the oracle cannot express — it gets a rows-only
check plus a pytest oracle.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_WS = re.compile(r"\s+")
_PUNCT = set(".,;:!?\"'()[]{}-")

#: tiny per-language stopword lists for the n-gram/stopword language
#: heuristic (public common words; the driver table langs are en-ish toy
#: text so this is a demonstration operator with a pytest oracle).
STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it", "that"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "es", "los"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "den", "von"},
    "fr": {"le", "la", "de", "et", "un", "est", "les", "des", "en"},
}


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append ``n_tokens``: whitespace-token count, DuckDB-compatible
    (``array_length(string_split_regex(trim(text), '\\s+'))``; empty
    string → 1, matching DuckDB's split of '' → ['']).

    Arrow-native: trim → regex split → list length, no Python loop."""
    col = batch.column(text_col)
    trimmed = pc.utf8_trim_whitespace(col)
    n = pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+"))
    n = pc.fill_null(pc.cast(n, pa.int64()), 0)  # null text → 0
    return batch.append_column("n_tokens", n)


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append quality heuristics: char length, mean word length,
    punctuation ratio, stopword ratio (en), uppercase ratio.

    Mirrors common LLM-corpus quality filters (length/punct/stopword
    ratios); vectorized via pandas str ops.
    """
    s = pd.Series(batch.column(text_col).to_pylist(), dtype="object").fillna("")
    n_chars = s.str.len().to_numpy(dtype=np.int64)
    tokens = s.str.split()
    n_tokens = tokens.map(len).to_numpy(dtype=np.int64)
    mean_word_len = np.where(
        n_tokens > 0,
        (n_chars - np.maximum(n_tokens - 1, 0)) / np.maximum(n_tokens, 1),
        0.0,
    )
    punct = s.map(lambda t: sum(c in _PUNCT for c in t)).to_numpy(dtype=np.int64)
    stop_en = tokens.map(
        lambda ws: sum(w.lower() in STOPWORDS["en"] for w in ws)
    ).to_numpy(dtype=np.int64)
    upper = s.map(lambda t: sum(c.isupper() for c in t)).to_numpy(dtype=np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        punct_ratio = np.where(n_chars > 0, punct / n_chars, 0.0)
        stop_ratio = np.where(n_tokens > 0, stop_en / np.maximum(n_tokens, 1), 0.0)
        upper_ratio = np.where(n_chars > 0, upper / n_chars, 0.0)
    return (
        batch.append_column("q_n_chars", pa.array(n_chars))
        .append_column("q_n_tokens", pa.array(n_tokens))
        .append_column("q_mean_word_len", pa.array(mean_word_len))
        .append_column("q_punct_ratio", pa.array(punct_ratio))
        .append_column("q_stopword_ratio", pa.array(stop_ratio))
        .append_column("q_upper_ratio", pa.array(upper_ratio))
    )


class LangId:
    """Actor stage: stopword/character n-gram language scorer.

    State (stopword sets, compiled pattern) built once per actor.
    Appends ``lang_pred`` and ``lang_score``.
    """

    def __init__(self, langs=("en", "es", "de", "fr")):
        self.langs = langs
        self.stop = {l: STOPWORDS[l] for l in langs}
        self.word = re.compile(r"[a-zA-Z']+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].fillna("").str.lower().str.findall(self.word)
        scores = np.zeros((len(batch), len(self.langs)))
        for j, lang in enumerate(self.langs):
            sw = self.stop[lang]
            scores[:, j] = toks.map(
                lambda ws: sum(w in sw for w in ws) / max(1, len(ws))
            ).to_numpy()
        best = scores.argmax(axis=1)
        batch["lang_pred"] = [self.langs[b] for b in best]
        batch["lang_score"] = scores[np.arange(len(batch)), best]
        return batch


# --- document fingerprint (rolling polynomial hash) -----------------------

FP_BASE = np.uint64(1000003)
FP_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def fingerprint64(texts: list[str]) -> np.ndarray:
    """Order-sensitive 64-bit polynomial rolling hash of each text's
    bytes: h = h*B + byte (mod 2^64).  Vectorized per batch via numpy
    cumulative products on byte arrays would need variable lengths, so we
    loop rows but hash each row's bytes vectorized (Horner in chunks)."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        b = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        h = np.uint64(1469598103934665603)  # FNV offset as seed
        # Horner evaluation in vector chunks: precompute B^k table
        with np.errstate(over="ignore"):  # mod-2^64 wraparound is the hash
            for chunk in np.array_split(b, max(1, len(b) // 4096)) if len(b) else []:
                k = len(chunk)
                powers = np.empty(k, dtype=np.uint64)
                powers[0] = np.uint64(1)
                if k > 1:
                    np.multiply.accumulate(
                        np.full(k - 1, FP_BASE, dtype=np.uint64), out=powers[1:])
                h = h * (FP_BASE ** np.uint64(k)) + np.sum(
                    chunk * powers[::-1], dtype=np.uint64)
        out[i] = h
    return out


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    fp = fingerprint64(batch.column(text_col).to_pylist())
    return batch.append_column("fingerprint", pa.array(fp.astype(np.int64)))
