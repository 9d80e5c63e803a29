"""Distributed graph analytics over edge tables.

The reference repo has no graph operators; these support the
LLM-data-pipeline family (web-graph domain ranking for crawl curation,
link-graph dedup clusters).  PageRank here is *exact fixed-point
integer* arithmetic — rank is carried as an int64 in ``scale`` units
and every iteration is

    contrib(u)  = rank(u) // outdeg(u)                 (floor division)
    rank'(v)    = (15·scale + 85·Σ_{u→v} contrib(u)) // 100

so partial sums commute under any partitioning/reduction order and a
SQL oracle can replay the identical integers — no float drift across
engines or cluster sizes.

Scale shape (per iteration): ONE bucket hash-join (rank table keyed by
node attached to the edge stream) + ONE groupby-sum whose input is
pre-combined per batch to O(#distinct dst per batch) rows.  The rank
table is O(nodes) and is re-materialized each round so the lineage does
not compound across iterations (same discipline as
:func:`~greenex_py_ray.stages.dedup.connected_components`).  Dangling
nodes (no out-edges) simply keep their mass un-redistributed; nodes
with no in-edges settle at the base ``15·scale // 100``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Min, Sum

from ..functions.joins import bucket_join_attach


def _distinct_nodes(edges: "ray.data.Dataset", src_col: str,
                    dst_col: str) -> "ray.data.Dataset":
    """(node) dataset = distinct(src) ∪ distinct(dst), via per-batch
    partial dedup + one groupby (ships O(distinct per batch) rows)."""

    def both(batch: pa.Table) -> pa.Table:
        s = batch.column(src_col).to_numpy(zero_copy_only=False)
        d = batch.column(dst_col).to_numpy(zero_copy_only=False)
        return pa.table({"node": np.unique(np.concatenate([s, d]))})

    part = edges.map_batches(both, batch_format="pyarrow",
                             zero_copy_batch=True)
    return (part.groupby("node")
            .aggregate(Min("node", alias_name="__m"))
            .select_columns(["node"]))


def pagerank(edges: "ray.data.Dataset", iters: int = 3,
             scale: int = 1_000_000, src_col: str = "src",
             dst_col: str = "dst") -> "ray.data.Dataset":
    """Integer-exact PageRank (damping 0.85 as the 85/100 rational).

    ``edges`` is a (src, dst) int64 multigraph — parallel edges carry
    proportional weight, matching ``GROUP BY`` semantics in the oracle.
    Returns (node, rank) with rank in ``scale`` fixed-point units.
    """
    nodes = _distinct_nodes(edges, src_col, dst_col).materialize()

    deg = edges.groupby(src_col).count().map_batches(
        lambda b: pa.table({
            src_col: b.column(src_col),
            "deg": b.column("count()").cast(pa.int64()),
        }), batch_format="pyarrow", zero_copy_batch=True)
    # (src, dst, deg) — joined once, reused by every iteration
    edges_deg = bucket_join_attach(edges, deg, key=src_col).materialize()

    def seed(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({"node": batch.column("node"),
                         "r": np.full(n, scale, dtype=np.int64)})

    ranks = nodes.map_batches(seed, batch_format="pyarrow",
                              zero_copy_batch=True)

    def contrib(batch: pa.Table) -> pa.Table:
        """Per-batch partial: Σ rank//deg grouped by dst."""
        r = batch.column("r").to_numpy(zero_copy_only=False)
        dg = batch.column("deg").to_numpy(zero_copy_only=False)
        dst = batch.column(dst_col).to_numpy(zero_copy_only=False)
        c = r // dg
        uniq, inv = np.unique(dst, return_inverse=True)
        # int64-exact per-batch reduce (bincount would go through
        # float64; partial sums here can approach 2^53 on dense graphs)
        s = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, inv, c)
        return pa.table({"node": uniq, "c": s})

    def zeros(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("node"),
                         "c": np.zeros(batch.num_rows, dtype=np.int64)})

    def damp(batch: pa.Table) -> pa.Table:
        c = batch.column("c").to_numpy(zero_copy_only=False)
        return pa.table({"node": batch.column("node"),
                         "r": (15 * scale + 85 * c) // 100})

    for _ in range(iters):
        ranks_src = ranks.map_batches(
            lambda b: pa.table({src_col: b.column("node"),
                                "r": b.column("r")}),
            batch_format="pyarrow", zero_copy_batch=True)
        ed = bucket_join_attach(edges_deg, ranks_src, key=src_col)
        parts = ed.map_batches(contrib, batch_format="pyarrow",
                               zero_copy_batch=True)
        seeded = parts.union(nodes.map_batches(
            zeros, batch_format="pyarrow", zero_copy_batch=True))
        summed = seeded.groupby("node").aggregate(
            Sum("c", alias_name="c"))
        ranks = summed.map_batches(
            damp, batch_format="pyarrow", zero_copy_batch=True).materialize()

    return ranks.map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "rank": b.column("r")}),
        batch_format="pyarrow", zero_copy_batch=True)
