"""Distributed set-membership joins: semi / anti over Ray's hash join.

``exists_join`` wraps ``Dataset.join(join_type='left_semi'/'left_anti')``
— Ray Data's native distributed hash join (hash-partition both sides
into ``num_partitions``, build/probe inside each partition) — with the
one preparation that matters at 100 TB: the right side collapses to
DISTINCT KEYS FIRST via per-batch unique partials, so the shuffle moves
O(#distinct keys) instead of O(right rows) (a fact table with 10 rows
per key ships 10× less).  Per-batch uniques alone bound the payload;
the join's own hash partitioning dedups the rest.

``num_partitions`` sizes the hash exchange: at gate scale a handful,
at cluster scale ~2–4× total cores so each partition's build side fits
in a worker heap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def distinct_keys(ds: "ray.data.Dataset", key_col: str) -> "ray.data.Dataset":
    """Per-batch unique partial — rows collapse to distinct keys before
    anything shuffles (final global dedup happens inside the join's own
    hash partitions)."""

    def partial(batch: pa.Table) -> pa.Table:
        k = np.unique(batch.column(key_col).to_numpy(zero_copy_only=False))
        return pa.table({key_col: pa.array(k)})

    return ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)


def exists_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
                on: str, right_on: str | None = None,
                anti: bool = False,
                num_partitions: int = 8) -> "ray.data.Dataset":
    """Left rows that have (semi) / lack (anti) a key match in right."""
    right_on = right_on or on
    keys = distinct_keys(right, right_on)
    return left.join(
        keys,
        join_type="left_anti" if anti else "left_semi",
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on,),
    )


def distinct_count(ds: "ray.data.Dataset", key_col: str,
                   val_col: str) -> "ray.data.Dataset":
    """Exact per-key distinct-value count (``COUNT(DISTINCT val)``):
    per-batch pair dedup (rows collapse before the shuffle), one
    groupby over distinct (key, val) pairs, then a per-batch key-count
    partial into a tiny second groupby — shuffle payload is O(#distinct
    pairs) then O(#keys), never O(rows)."""
    import pandas as pd

    from ray.data.aggregate import Count, Sum

    def pair_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[[key_col, val_col]].drop_duplicates()

    pairs = ds.map_batches(pair_partial, batch_format="pandas")
    dedup = pairs.groupby([key_col, val_col]).aggregate(
        Count(alias_name="_c"))

    def key_partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(key_col, sort=False).size()
        return pd.DataFrame({key_col: g.index.to_numpy(),
                             "pn": g.to_numpy().astype(np.int64)})

    return dedup.map_batches(key_partial, batch_format="pandas").groupby(
        key_col).aggregate(Sum("pn", alias_name="n_distinct"))
