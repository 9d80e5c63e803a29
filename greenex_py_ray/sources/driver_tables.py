"""Driver-testdata adapters: TPC-H-ish parquet tables → spatial inputs.

The correctness gate (``__ray_entry__.queries`` vs ``oracle_sql`` in
DuckDB) runs over ``/root/testdata/sf*/``.  Those tables carry no
geometry, so spatial queries derive coordinates *arithmetically* from
integer keys with expressions that numpy and ANSI SQL evaluate to
bit-identical float64 — the DuckDB oracle recomputes the exact same
points, cells and distances.

The shared derivation (keep in sync with :data:`SQL_X` / :data:`SQL_Y`):

    x(k) = ((k * 2654435761) % 1000003) / 1000003.0 * 20000.0
    y(k) = ((k * 40503 + 12345) % 1000003) / 1000003.0 * 20000.0

Multiplications stay far below 2**63 for all test key ranges, and both
engines perform the same IEEE-754 double ops in the same order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .. import cells

MOD = 1_000_003
WORLD = 20_000.0

#: SQL templates — {k} is the integer key column expression.
SQL_X = f"((({{k}} * 2654435761) % {MOD}) / {MOD}.0 * {WORLD})"
SQL_Y = f"((({{k}} * 40503 + 12345) % {MOD}) / {MOD}.0 * {WORLD})"
#: SQL for the linear cell id at cell size {cs} (matches cells.cell_id).
SQL_CELL = (
    f"(CAST(floor({SQL_X} / {{cs}}) AS BIGINT) * {cells.CELL_STRIDE} "
    f"+ CAST(floor({SQL_Y} / {{cs}}) AS BIGINT))"
)


def derive_xy(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    k = np.asarray(key, dtype=np.int64)
    x = ((k * 2654435761) % MOD) / float(MOD) * WORLD
    y = ((k * 40503 + 12345) % MOD) / float(MOD) * WORLD
    return x, y


class DeriveXY:
    """map_batches stage: append x, y, cell derived from an int key column."""

    def __init__(self, key_col: str, cell_size: float = cells.DEFAULT_CELL_SIZE):
        self.key_col = key_col
        self.cell_size = cell_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        k = batch.column(self.key_col).to_numpy(zero_copy_only=False)
        x, y = derive_xy(k)
        cell = cells.cell_of(x, y, self.cell_size)
        return (
            batch.append_column("x", pa.array(x, pa.float64()))
            .append_column("y", pa.array(y, pa.float64()))
            .append_column("cell", pa.array(cell, pa.int64()))
        )


def read_table(sf_dir: str, name: str, columns=None) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def read_docs_with_xy(sf_dir: str, cell_size: float = cells.DEFAULT_CELL_SIZE,
                      columns=("doc_id",)) -> "ray.data.Dataset":
    """documents table + derived (x, y, cell) — the PoI side of every
    driver-table spatial query."""
    ds = read_table(sf_dir, "documents", columns=list(columns))
    return ds.map_batches(DeriveXY("doc_id", cell_size), batch_format="pyarrow",
                          zero_copy_batch=True)


def greenspace_centroids_from_part(sf_dir: str) -> "pa.Table":
    """Greenspace centroid side table derived from ``part`` (small side —
    broadcast, never shuffled).  gx/gy use p_partkey with the same
    arithmetic scheme."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    k = t.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    x, y = derive_xy(k)
    return pa.table({"gs_id": pa.array(k), "cx": pa.array(x), "cy": pa.array(y)})
