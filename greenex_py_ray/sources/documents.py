"""Interleaved-document source: Lance-style parquet fragments → Dataset.

The primary input is the spans table fixed by ``BASELINE.json
input_hint``::

    documents(doc_id: string,
              spans: list<struct<kind, text, media_ref, offset>>)

``read_documents`` reads the fragments; ``decode_geom`` is the first
``map_batches`` stage of every pipeline: it extracts each row's first
``kind="geom"`` span, parses the ``POINT(x y)`` WKT, and appends
``x, y, cell`` columns — *without touching* the ``spans`` column (the
per-row invariant is span-sequence equality, so ``spans`` streams
zero-copy through every stage and is emitted unchanged).

Replaces the reference's ``gpd.read_file`` + geometry/CRS normalization
(`/root/reference/GreenExp/availability.py:45-143`) with a vectorized
Arrow batch transform.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .. import cells, geom


def read_documents(path: str, **kwargs) -> "ray.data.Dataset":
    """Read the spans documents table (a parquet file/dir of fragments)."""
    return ray.data.read_parquet(path, **kwargs)


def _first_geom_texts(spans: pa.ListArray) -> tuple[np.ndarray, np.ndarray]:
    """For each row, (x, y) parsed from its first kind='geom' span.

    Fully vectorized: flatten the list column once, locate geom spans,
    pick the first per parent row via a stable unique pass.
    Rows with no geom span get NaN coordinates.
    """
    n = len(spans)
    flat = spans.flatten()
    offsets = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    import pyarrow.compute as pc

    kinds = flat.field("kind")
    is_geom = pc.equal(kinds, "geom").to_numpy(zero_copy_only=False)
    is_geom = np.asarray(is_geom, dtype=bool)
    pos = np.flatnonzero(is_geom)
    x = np.full(n, np.nan)
    y = np.full(n, np.nan)
    if len(pos):
        parents = np.searchsorted(offsets, pos, side="right") - 1
        # first geom span per parent (pos is ascending → first occurrence wins)
        uniq_parents, first_idx = np.unique(parents, return_index=True)
        texts = flat.field("text").take(pa.array(pos[first_idx])).to_pylist()
        px, py = geom.parse_wkt_points(texts)
        x[uniq_parents] = px
        y[uniq_parents] = py
    return x, y


class DecodeGeom:
    """map_batches stage: documents → documents + (x, y, cell).

    Stateless but kept as a class for a compiled fast path and to carry
    config (cell size).  Use as
    ``ds.map_batches(DecodeGeom(cell_size), batch_format="pyarrow")``.
    """

    def __init__(self, cell_size: float = cells.DEFAULT_CELL_SIZE):
        self.cell_size = cell_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        x, y = _first_geom_texts(spans)
        cell = cells.cell_of(x, y, self.cell_size)
        return (
            batch.append_column("x", pa.array(x, pa.float64()))
            .append_column("y", pa.array(y, pa.float64()))
            .append_column("cell", pa.array(cell, pa.int64()))
        )


def decode_geom(ds: "ray.data.Dataset", cell_size: float = cells.DEFAULT_CELL_SIZE):
    return ds.map_batches(DecodeGeom(cell_size), batch_format="pyarrow", zero_copy_batch=True)
