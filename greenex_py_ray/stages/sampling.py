"""Deterministic hash-based sampling / split assignment (training-data
op: stable train/val/test sharding and subsampling at corpus scale).

The bucket function is a Lehmer-style modular hash chosen so that ANSI
SQL reproduces it without 64-bit overflow for any realistic
NON-NEGATIVE key range (``k * 48271 < 2^63`` for ``0 <= k < 1.9e14``;
negative keys are rejected — see :func:`hash_bucket`):

    bucket(k) = ((k * 48271 + salt) % 2147483647) % 100

Embarrassingly parallel — a pure ``map_batches`` (no shuffle, no state),
so it composes with any upstream read at zero cost; a 100 TB corpus is
split by streaming each block through once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

_MULT = 48271
_MOD = 2147483647


def hash_bucket(key: np.ndarray, salt: int = 0) -> np.ndarray:
    """Deterministic bucket 0..99 per NON-NEGATIVE integer key.

    Negative keys are rejected: numpy's ``%`` returns non-negative
    remainders while SQL's follows the dividend's sign, so a negative
    key would silently desynchronize an externally-reproduced split."""
    k = np.asarray(key, dtype=np.int64)
    if k.size and k.min() < 0:
        raise ValueError("hash_bucket requires non-negative keys "
                         "(SQL %% sign semantics differ for negatives)")
    return ((k * _MULT + salt) % _MOD) % 100


def assign_split(ds: "ray.data.Dataset", key_col: str,
                 train_pct: int = 80, val_pct: int = 10,
                 salt: int = 0) -> "ray.data.Dataset":
    """Append ``bucket`` (0..99) and ``split`` ('train'/'val'/'test')
    columns derived only from ``key_col`` — membership is stable across
    runs, partitionings and cluster sizes."""

    def assign(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        b = hash_bucket(k, salt)
        split = np.where(b < train_pct, "train",
                         np.where(b < train_pct + val_pct, "val", "test"))
        return (batch.append_column("bucket", pa.array(b, pa.int64()))
                .append_column("split", pa.array(split, pa.string())))

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)


def hash_sample(ds: "ray.data.Dataset", key_col: str, rate_pct: int,
                salt: int = 0) -> "ray.data.Dataset":
    """Keep a deterministic ``rate_pct``% sample by key hash."""

    def keep(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(hash_bucket(k, salt) < rate_pct))

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)
