"""Per-partition lineage manifests + checkpoint-resumable writes.

The reference has no checkpointing at all (SURVEY §4: interactive
``input()`` filenames, no resume).  The north rule requires partitioned,
resumable output with per-partition lineage.

Layout::

    out_dir/
      part-{partition:05d}.parquet      # one file per key-range bucket
      _manifest/partition-{i}.json      # written AFTER the part file

A partition's manifest row records input fragments, row count, value
checksum and wall time.  ``resumable_write`` skips partitions whose
manifest row already exists, so a killed run re-does only missing
partitions; output is deterministic because partitions are key-hash
buckets (not execution order).
"""

from __future__ import annotations

import json
import os
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from .functions.joins import stable_bucket


def _checksum(tbl: pa.Table) -> int:
    """Order-insensitive value checksum: xor of crc32 per serialized row
    batch sorted by first column."""
    if tbl.num_rows == 0:
        return 0
    order = pa.compute.sort_indices(tbl.column(0))
    tbl = tbl.take(order)
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    return zlib.crc32(sink.getvalue().to_pybytes())


def write_partition(tbl: pa.Table, out_dir: str, partition: int,
                    inputs: list[str] | None = None) -> dict:
    """Atomic partition write: temp file → rename, then manifest row."""
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    t0 = time.time()
    final = os.path.join(out_dir, f"part-{partition:05d}.parquet")
    tmp = final + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, final)
    row = {
        "partition_id": partition,
        "input_fragments": inputs or [],
        "row_count": tbl.num_rows,
        "checksum": _checksum(tbl),
        "wall_ms": int((time.time() - t0) * 1000),
        "bytes": os.path.getsize(final),
    }
    mpath = os.path.join(out_dir, "_manifest", f"partition-{partition}.json")
    with open(mpath + ".tmp", "w") as f:
        json.dump(row, f)
    os.replace(mpath + ".tmp", mpath)
    return row


def completed_partitions(out_dir: str) -> set[int]:
    mdir = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for name in os.listdir(mdir):
        if name.startswith("partition-") and name.endswith(".json"):
            done.add(int(name[len("partition-"):-len(".json")]))
    return done


def read_manifest(out_dir: str) -> list[dict]:
    mdir = os.path.join(out_dir, "_manifest")
    rows = []
    for p in sorted(completed_partitions(out_dir)):
        with open(os.path.join(mdir, f"partition-{p}.json")) as f:
            rows.append(json.load(f))
    return rows


def resumable_write(ds: "ray.data.Dataset", out_dir: str, key: str,
                    num_partitions: int = 32) -> list[dict]:
    """Write ``ds`` as ``num_partitions`` key-hash bucket files with
    manifests, skipping buckets already completed by a previous run.

    The bucket assignment is a pure function of the key → a restarted
    run reproduces identical partition contents regardless of block
    order (rows are sorted by key within each partition file)."""
    os.makedirs(out_dir, exist_ok=True)
    done = completed_partitions(out_dir)
    todo = [p for p in range(num_partitions) if p not in done]
    if not todo:
        return read_manifest(out_dir)

    def bucketize(batch: pa.Table) -> pa.Table:
        b = stable_bucket(batch.column(key).to_pylist(), num_partitions)
        return batch.append_column("__part", pa.array(b))

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow",
                              zero_copy_batch=True)
    todo_set = set(todo)

    def write_group(tbl: pa.Table) -> pa.Table:
        part = int(tbl.column("__part")[0].as_py())
        if part in todo_set:
            body = tbl.drop_columns(["__part"])
            body = body.take(pa.compute.sort_indices(body.column(key)))
            write_partition(body, out_dir, part)
        return pa.table({"partition": pa.array([part], pa.int64())})

    bucketed.groupby("__part").map_groups(
        write_group, batch_format="pyarrow"
    ).materialize()
    return read_manifest(out_dir)


def partition_checksum(ds: "ray.data.Dataset", cell_col: str = "cell",
                       key_col: str = "doc_id",
                       text_col: str = "text") -> "ray.data.Dataset":
    """Per-partition content checksum — the audit/reconciliation table
    a resumable run compares across attempts (and across engines): one
    row per spatial cell with the doc count, the id range, and an
    ORDER-FREE 64-bit checksum (XOR of every doc's content
    fingerprint).  XOR is commutative/associative, so the checksum is
    identical no matter how blocks were partitioned, retried or
    reordered — any lost, duplicated or mutated row flips it.

    Scale shape: each batch collapses to O(touched cells) partial rows
    (xor/count/min/max combine in-kernel), one small groupby finishes."""
    from .stages.text import hash_string_array

    def partial(batch: pa.Table) -> pa.Table:
        cell = batch.column(cell_col).to_numpy(zero_copy_only=False)
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h = hash_string_array(pc.fill_null(col, "")).view(np.int64)
        order = np.argsort(cell, kind="stable")
        cs, hs, ks = cell[order], h[order], k[order]
        bnd = np.ones(len(cs), dtype=bool)
        bnd[1:] = cs[1:] != cs[:-1]
        starts = np.flatnonzero(bnd)
        ends = np.append(starts[1:], len(cs))
        xor = np.bitwise_xor.reduceat(hs, starts) if len(cs) else \
            np.empty(0, np.int64)
        return pa.table({
            cell_col: pa.array(cs[starts]),
            "n_docs": pa.array((ends - starts).astype(np.int64)),
            "checksum": pa.array(xor),
            "min_doc": pa.array(np.minimum.reduceat(ks, starts)),
            "max_doc": pa.array(np.maximum.reduceat(ks, starts)),
        })

    def combine(tbl: pa.Table) -> pa.Table:
        return pa.table({
            cell_col: tbl.column(cell_col).slice(0, 1),
            "n_docs": pa.array([int(
                np.sum(tbl.column("n_docs").to_numpy(zero_copy_only=False)))],
                pa.int64()),
            "checksum": pa.array([int(np.bitwise_xor.reduce(
                tbl.column("checksum").to_numpy(zero_copy_only=False)))],
                pa.int64()),
            "min_doc": pa.array([int(np.min(
                tbl.column("min_doc").to_numpy(zero_copy_only=False)))],
                pa.int64()),
            "max_doc": pa.array([int(np.max(
                tbl.column("max_doc").to_numpy(zero_copy_only=False)))],
                pa.int64()),
        })

    part = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
    return part.groupby(cell_col).map_groups(combine, batch_format="pyarrow")
