"""Broadcast dimension-table enrich (hash-free lookup join).

The canonical small-side join at 100 TB: the dimension table (customer
→ nation, tile → CRS, class code → label) is orders of magnitude
smaller than the fact stream, so it broadcasts ONCE via ``ray.put`` and
every batch resolves its keys with one ``np.searchsorted`` over the
sorted dim keys — no shuffle, no per-batch reshipping, no hash build
per task.  Contrast with a shuffle join, which would move every fact
row; see the same pattern at ``stages/access.NearestGreenspace`` and
``stages/spatial_join.py`` (broadcast side) for the spatial variants.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _resolve(ref):
    return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref


class BroadcastLookup:
    """map_batches actor: append dim columns resolved by sorted-key
    binary search.  ``dim_ref``: (ObjectRef of) a pyarrow Table; it is
    sorted by ``dim_key`` once per actor in ``__init__``.

    ``how='inner'`` drops fact rows with no dim match; ``'left'``
    appends nulls for them.
    """

    def __init__(self, dim_ref, key_col: str, dim_key: str,
                 add_cols: "tuple[str, ...]", how: str = "inner"):
        t = _resolve(dim_ref)
        keys = t.column(dim_key).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(keys, kind="stable")
        self.keys = keys[order]
        self.cols = {c: t.column(c).take(pa.array(order)) for c in add_cols}
        self.key_col = key_col
        self.add_cols = add_cols
        if how not in ("inner", "left"):
            raise ValueError(f"how={how!r}: expected 'inner' or 'left'")
        self.how = how

    def __call__(self, batch: pa.Table) -> pa.Table:
        k = batch.column(self.key_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        if not len(self.keys):
            # empty dim: inner drops everything, left appends all-null
            if self.how == "inner":
                batch = batch.take(pa.array(np.empty(0, np.int64)))
                for c in self.add_cols:
                    batch = batch.append_column(
                        c, self.cols[c].take(pa.array([], pa.int64())))
                return batch
            for c in self.add_cols:
                batch = batch.append_column(
                    c, pa.nulls(len(k), self.cols[c].type))
            return batch
        idx = np.searchsorted(self.keys, k)
        idx_c = np.minimum(idx, len(self.keys) - 1)
        hit = self.keys[idx_c] == k
        if self.how == "inner":
            sel = np.flatnonzero(hit)
            batch = batch.take(pa.array(sel))
            idx_c = idx_c[sel]
            for c in self.add_cols:
                batch = batch.append_column(
                    c, self.cols[c].take(pa.array(idx_c)))
            return batch
        for c in self.add_cols:
            vals = self.cols[c].take(pa.array(idx_c))
            if not hit.all():
                vals = pa.array(
                    np.where(hit, vals.to_numpy(zero_copy_only=False),
                             None).tolist(),
                    type=vals.type)
            batch = batch.append_column(c, vals)
        return batch


def broadcast_join(ds: "ray.data.Dataset", dim: pa.Table, key_col: str,
                   dim_key: str, add_cols: "tuple[str, ...]",
                   how: str = "inner",
                   concurrency=(1, 8)) -> "ray.data.Dataset":
    """Enrich the fact stream with dim columns (see module docstring)."""
    ref = ray.put(dim)
    return ds.map_batches(
        BroadcastLookup,
        fn_constructor_kwargs=dict(dim_ref=ref, key_col=key_col,
                                   dim_key=dim_key, add_cols=add_cols,
                                   how=how),
        batch_format="pyarrow", concurrency=concurrency, num_cpus=0.25,
    )
