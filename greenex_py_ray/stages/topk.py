"""Grouped top-k selection (training-data op: "best k documents per
language / domain / cluster").

Scale design: a vectorized per-batch PARTIAL top-k first (at most k
rows per group survive each batch), so only ``k × num_batches`` rows
enter the ``groupby`` shuffle instead of the full table; the final
per-group reduce applies the identical kernel and emits a 1-based
``rank``.  Ties are broken by an explicit tie column so the result is
deterministic and SQL-reproducible (``row_number() OVER (PARTITION BY
group ORDER BY score DESC, tie ASC)``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def _topk_indices(group: np.ndarray, score: np.ndarray, tie: np.ndarray,
                  k: int) -> tuple[np.ndarray, np.ndarray]:
    """Row indices of the top-k rows per group (score desc, tie asc)
    plus their 0-based within-group ranks.  Fully vectorized:
    factorize → lexsort → per-group rank via run starts."""
    gi = np.unique(group, return_inverse=True)[1]
    if score.dtype.kind == "u":
        # negation wraps for unsigned dtypes (score==0 would sort as
        # the BEST row); reinterpret in a signed/float domain first
        score = (score.astype(np.int64)
                 if score.size == 0 or score.max() <= np.iinfo(np.int64).max
                 else score.astype(np.float64))
    # lexsort: last key is primary → group asc, then score desc, tie asc
    order = np.lexsort((tie, -score, gi))
    gs = gi[order]
    first = np.concatenate(([0], np.flatnonzero(np.diff(gs)) + 1))
    runs = np.diff(np.concatenate((first, [len(gs)])))
    rank = np.arange(len(gs)) - np.repeat(first, runs)
    keep = rank < k
    return order[keep], rank[keep]


def topk_per_group(ds: "ray.data.Dataset", group_col: str, score_col: str,
                   k: int, tie_col: str,
                   emit_rank: bool = True) -> "ray.data.Dataset":
    """Top ``k`` rows per ``group_col`` by ``score_col`` (desc), ties by
    ``tie_col`` (asc).  Numeric scores only (int or float); the partial
    pass keeps ≤k rows per group per batch, so the shuffle moves a
    bounded sliver of the input regardless of table size."""

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        idx, _ = _topk_indices(
            batch.column(group_col).to_numpy(zero_copy_only=False),
            batch.column(score_col).to_numpy(zero_copy_only=False),
            batch.column(tie_col).to_numpy(zero_copy_only=False), k)
        return batch.take(pa.array(idx))

    def final(batch: pa.Table) -> pa.Table:
        idx, rank = _topk_indices(
            batch.column(group_col).to_numpy(zero_copy_only=False),
            batch.column(score_col).to_numpy(zero_copy_only=False),
            batch.column(tie_col).to_numpy(zero_copy_only=False), k)
        out = batch.take(pa.array(idx))
        if emit_rank:
            out = out.append_column(
                "rank", pa.array(rank + 1, pa.int64()))
        return out

    reduced = ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
    return reduced.groupby(group_col).map_groups(
        final, batch_format="pyarrow")
