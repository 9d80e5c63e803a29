"""Corpus-hygiene stages: PII redaction and repetition scoring.

Training-data operators a 100 TB document pipeline runs before anything
else touches the text:

* **PII redaction** — find/replace emails and phone-ish numbers with
  typed placeholder tokens and count what was removed.  Both Arrow and
  DuckDB compile the same RE2 patterns, so the DuckDB gate reproduces
  the redacted text exactly.  Fully Arrow-native
  (``replace_substring_regex`` / ``count_substring_regex``), zero-copy
  batches, no Python loop.

* **Repetition scoring** — Gopher-style duplicate-token fractions
  (``1 - distinct/total`` and most-common-token share) used to drop
  boilerplate / keyboard-mash documents.  One explode+factorize per
  batch (shared :func:`~greenex_py_ray.stages.text.explode_words`
  machinery), per-doc stats via bincount — no per-row Python.

Determinism: ratios are single IEEE divisions rounded to 6 decimals —
no accumulation-order ambiguity at all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .text import explode_words

#: RE2 patterns shared verbatim with the DuckDB oracle (both engines
#: compile RE2, so match semantics are identical).
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?\d[\d\-]{7,}\d"
EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"


def pii_redact_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append ``n_emails``, ``n_phones``, ``red_text``.

    Emails are redacted FIRST, then phones are counted/redacted on the
    email-redacted text (so digit runs inside an address can't be
    double-counted) — the oracle mirrors the same two-pass order.
    """
    col = pc.fill_null(batch.column(text_col), "")
    n_emails = pc.count_substring_regex(col, EMAIL_RE)
    step1 = pc.replace_substring_regex(col, EMAIL_RE, EMAIL_TOKEN)
    n_phones = pc.count_substring_regex(step1, PHONE_RE)
    red = pc.replace_substring_regex(step1, PHONE_RE, PHONE_TOKEN)
    return (batch.append_column("n_emails", pc.cast(n_emails, pa.int64()))
            .append_column("n_phones", pc.cast(n_phones, pa.int64()))
            .append_column("red_text", red))


def normalize_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append ``norm_text`` (NFC unicode normalization + whitespace
    collapse + trim) and ``changed`` — the canonicalization pass every
    web-crawl corpus runs before hashing/dedup (decomposed accents and
    ragged whitespace otherwise defeat exact dedup).

    NFC goes through ``unicodedata`` (this Arrow build's
    ``utf8_normalize(form='NFC')`` reorders but does NOT compose —
    'e'+U+0301 stays decomposed); collapse/trim stay Arrow-RE2 so the
    DuckDB twin ``trim(regexp_replace(nfc_normalize(t), '\\s+', ' ',
    'g'))`` matches byte-for-byte (RE2 ``\\s`` is ASCII in both)."""
    import unicodedata

    col = pc.fill_null(batch.column(text_col), "")
    nfc = pa.array([unicodedata.normalize("NFC", s)
                    for s in col.to_pylist()], pa.string())
    norm = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(nfc, r"\s+", " "))
    changed = pc.invert(pc.equal(norm, col))
    return (batch.append_column("norm_text", norm)
            .append_column("changed", changed))


def repetition_batch(batch: pd.DataFrame,
                     text_col: str = "text") -> pd.DataFrame:
    """Append ``n_tokens``, ``n_distinct``, ``dup_frac``, ``top_frac``.

    ``dup_frac = round(1 - n_distinct/n_tokens, 6)`` and
    ``top_frac = round(max_token_count/n_tokens, 6)`` (both 0 for empty
    docs) over lowercased ``[a-zA-Z']+`` word tokens — the Gopher
    repetition-filter signals.
    """
    n, counts, parent, codes, uniq = explode_words(batch[text_col])
    n_tokens = counts
    n_distinct = np.zeros(n, dtype=np.int64)
    top = np.zeros(n, dtype=np.int64)
    if len(codes):
        v = len(uniq)
        pair = parent.astype(np.int64) * v + codes
        upair, pair_counts = np.unique(pair, return_counts=True)
        udoc = upair // v
        np.add.at(n_distinct, udoc, 1)
        np.maximum.at(top, udoc, pair_counts)
    denom = np.maximum(1, n_tokens).astype(np.float64)
    batch = batch.copy()
    batch["n_tokens"] = n_tokens
    batch["n_distinct"] = n_distinct
    batch["dup_frac"] = np.where(
        n_tokens > 0, np.round(1.0 - n_distinct / denom, 6), 0.0)
    batch["top_frac"] = np.where(
        n_tokens > 0, np.round(top / denom, 6), 0.0)
    return batch
