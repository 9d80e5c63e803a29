"""Join strategies.

Two implementations, chosen by payload type:

* ``Dataset.join`` (Ray 2.49 hash-shuffle join) — used for flat
  columns.  One aggregator actor per partition, so the partition count
  must respect the cluster CPU budget (``default_join_partitions``).
* ``bucket_join_attach`` — explicit partitioned hash join for tables
  carrying nested columns (the ``spans`` list<struct> payload), which
  Arrow's join kernel rejects ("not supported in join non-key field").
  Pattern: add ``__bucket = stable_hash(key) % B`` to both sides, align
  schemas with typed null columns, ``union`` → ``groupby(__bucket)`` →
  per-bucket Arrow-native index merge (``take`` on each side, column
  hstack).  Nested values never round-trip through pandas/python, so
  span bytes stay identical — the per-row invariant the north rule
  demands.  Exactly one all-to-all exchange of the document payload,
  which any column-append onto the doc table requires.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def cluster_cpus(default: int = 8) -> int:
    """Logical CPUs of the current Ray cluster (``default`` when Ray is
    not initialised / unreachable) — the one shared detection point for
    every pool-sizing heuristic."""
    try:
        return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        return default


def default_join_partitions(requested: int | None = None) -> int:
    """~half the cluster CPUs (min 2): scales up on real clusters, stays
    small on the 4-CPU test fixture so join aggregator actors don't
    starve the map stages."""
    if requested is not None:
        return requested
    return max(2, cluster_cpus() // 2)


def stable_bucket(keys, num_buckets: int) -> np.ndarray:
    """Process-stable hash bucket of a key array (siphash via pandas,
    fixed key — identical on every worker)."""
    h = pd.util.hash_pandas_object(pd.Series(keys), index=False).to_numpy()
    return (h % np.uint64(num_buckets)).astype(np.int64)


def _with_bucket_and_nulls(ds, key: str, num_buckets: int, side: int,
                           null_fields: list[pa.Field]):
    def add(batch: pa.Table) -> pa.Table:
        b = stable_bucket(batch.column(key).to_pandas(), num_buckets)
        out = batch.append_column("__bucket", pa.array(b))
        out = out.append_column("__side", pa.array(np.full(len(b), side, dtype=np.int8)))
        for f in null_fields:
            out = out.append_column(f.name, pa.nulls(len(b), f.type))
        return out

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def bucket_join_attach(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str = "doc_id",
    num_buckets: int | None = None,
    left_fields: "list[pa.Field] | None" = None,
    right_fields: "list[pa.Field] | None" = None,
) -> "ray.data.Dataset":
    """Inner join attaching ``right``'s non-key columns to ``left``,
    supporting nested left payloads.  Requires unique keys on the right
    (metric tables are keyed by doc)."""
    if num_buckets is None:
        # scale bucket count with the left payload (each bucket becomes
        # ONE in-memory pa.Table inside map_groups, so a fixed cap would
        # bound parallelism and grow per-bucket memory with data size);
        # floor at 2×cluster-width so small inputs still parallelize.
        # size_bytes() EXECUTES a lazy lineage (measured ~1 s extra per
        # join at bench scale), so the estimate is read only from inputs
        # that already know their size: materialized datasets and
        # metadata-backed reads.
        est = 0
        try:
            from ray.data.dataset import MaterializedDataset

            if isinstance(left, MaterializedDataset):
                est = left.size_bytes() or 0
        except Exception:
            est = 0
        by_bytes = est // (128 << 20)  # ~128 MB of payload per bucket
        num_buckets = int(min(4096, max(default_join_partitions(None) * 2,
                                        by_bytes)))
    # .schema() on a LAZY side executes part of its pipeline just for
    # the probe (measured ~2 s on the flagship); callers that know their
    # schemas pass them explicitly to skip it
    if left_fields is None:
        lschema = left.schema()
        left_fields = [pa.field(n, t)
                       for n, t in zip(lschema.names, lschema.types)]
    if right_fields is None:
        rschema = right.schema()
        right_fields = [pa.field(n, t)
                        for n, t in zip(rschema.names, rschema.types)]
    lfields = list(left_fields)
    rfields = [f for f in right_fields if f.name != key]
    lnames = [f.name for f in lfields if f.name != key]
    rnames = [f.name for f in rfields]
    dup = set(lnames) & set(rnames)
    if dup:
        raise ValueError(f"overlapping non-key columns: {dup}")

    l2 = _with_bucket_and_nulls(left, key, num_buckets, 0, rfields)
    r2 = _with_bucket_and_nulls(right.select_columns([key] + rnames), key,
                                num_buckets, 1, [f for f in lfields if f.name != key])
    # align column order for union
    order = [key] + lnames + rnames + ["__bucket", "__side"]
    l2 = l2.select_columns(order)
    r2 = r2.select_columns(order)
    u = l2.union(r2)

    def merge(tbl: pa.Table) -> pa.Table:
        side = tbl.column("__side").to_numpy(zero_copy_only=False)
        li = np.flatnonzero(side == 0)
        ri = np.flatnonzero(side == 1)
        lt = tbl.take(pa.array(li))
        rt = tbl.take(pa.array(ri))
        lk = pd.Index(lt.column(key).to_pandas())
        rk = pd.Index(rt.column(key).to_pandas())
        pos = rk.get_indexer(lk)
        hit = pos >= 0
        lt = lt.take(pa.array(np.flatnonzero(hit)))
        rt = rt.take(pa.array(pos[hit]))
        cols = {key: lt.column(key)}
        for n in lnames:
            cols[n] = lt.column(n)
        for n in rnames:
            cols[n] = rt.column(n)
        return pa.table(cols)

    return u.groupby("__bucket").map_groups(merge, batch_format="pyarrow")


def as_pool(concurrency) -> tuple[int, int]:
    """Normalize a concurrency spec to an autoscaling (min, max) pool.

    Fixed-size pools reserve all their CPUs up front; on small clusters
    two fixed pools can starve the shuffle tasks and deadlock the
    streaming executor — (1, N) lets Ray scale each pool to available
    resources."""
    if isinstance(concurrency, tuple):
        return concurrency
    if concurrency is None:
        cpus = cluster_cpus()
        # a nonzero minimum matters: Ray's autoscaling pools ramp far
        # too slowly to use a 32-CPU box within a short pipeline (we
        # measured effective parallelism stuck at the pool minimum)
        return (max(1, cpus // 8), max(2, cpus // 2))
    return (1, max(1, int(concurrency)))


def heavy_pool(concurrency=None) -> dict:
    """map_batches kwargs for THE dominant compute stage of a pipeline.

    Fixed-size pool at ~full cluster width with a whole CPU per actor:
    Ray's autoscaling pools stay at their minimum in practice (measured
    parallelism == pool min), so the one stage that owns the wall-clock
    gets all-but-two CPUs reserved up front.  Rule: at most ONE heavy
    pool per pipeline — the two spare CPUs keep reads/shuffles moving.
    """
    if isinstance(concurrency, tuple):
        # a tuple spec pins the pool at its MAX (heavy stages need a
        # fixed pool; silently ignoring the caller's width made a
        # (1, 4) gate spec into a 16-actor pool whose ramp dominated
        # small inputs)
        n = max(1, int(concurrency[-1]))
        return dict(concurrency=(n, n), num_cpus=1)
    if concurrency is not None:
        n = max(1, int(concurrency))
        return dict(concurrency=(n, n), num_cpus=1)
    # half the cluster: the dominant kernel still needs its FEED stages
    # (read/decode tasks at 1 CPU each) to run wide, or the pool starves
    import os

    env = os.environ.get("GREENEX_HEAVY_WIDTH")
    if env:  # A/B knob for pool-width experiments (see BASELINE.md)
        n = max(1, int(env))
    else:
        n = max(1, cluster_cpus() // 2)
    return dict(concurrency=(n, n), num_cpus=1)
