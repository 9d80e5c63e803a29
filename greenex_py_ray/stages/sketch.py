"""Mergeable cardinality sketch: HyperLogLog registers.

The approximate-distinct primitive a 100 TB profiler runs where an
exact ``distinct_count`` shuffle is unaffordable: every batch collapses
to ≤ ``m`` (register, rho) rows, partial maxima merge associatively
under ANY partitioning/retry order, and the final register table is
KB-sized however large the input.  Flajolet et al. 2007 (public
algorithm).

Exactness contract: the register table is INTEGER-exact — value hash =
the corpus 64-bit polynomial hash (`stages/text.hash_string_array`,
the same hash the simhash oracle replays in HUGEINT SQL), register =
``h mod m``, rho = leading-zero count of the remaining 64−p bits + 1 —
so a SQL oracle reproduces every row bit-for-bit.  Only the final
scalar estimate (``hll_estimate``) involves floats; it is computed
driver-side from the tiny register table and verified by accuracy
bounds in pytest rather than a hash gate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Max

from .text import hash_string_array


def _bit_length_u64(v: np.ndarray) -> np.ndarray:
    """Integer bit length per element (no float round trip — a float64
    conversion rounds 2^56−1 up to 2^56 and lies about the exponent)."""
    v = v.copy()
    bl = np.zeros(v.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(s))
        bl[m] += s
        v[m] >>= np.uint64(s)
    bl += (v == 1)
    return bl


#: Fibonacci-hash finalizer (2^64/φ, odd): one modular multiply spreads
#: low-entropy polynomial hashes across the TOP bits — the corpus
#: poly-hash alone leaves near-identical strings clustered there
#: (measured: HLL read 41% low on sequential tokens without it), and a
#: plain multiply is HUGEINT-replayable in SQL where xor-avalanche
#: finalizers are not.
_PHI64 = np.uint64(11400714819323198485)


def hll_partial(values_hash: np.ndarray, p: int = 8) -> pa.Table:
    """(register, rho) partial maxima for one batch of 64-bit hashes."""
    m = 1 << p
    with np.errstate(over="ignore"):  # mod-2^64 wrap is the mix
        mixed = values_hash * _PHI64
    reg = (mixed >> np.uint64(64 - p)).astype(np.int64)
    width = 64 - p
    rest = mixed & ((np.uint64(1) << np.uint64(width)) - np.uint64(1))
    rho = (width + 1) - _bit_length_u64(rest)
    slots = np.zeros(m, dtype=np.int64)
    np.maximum.at(slots, reg, rho)
    touched = np.flatnonzero(slots)
    return pa.table({"register": touched,
                     "rho": slots[touched]})


def hll_registers(ds: "ray.data.Dataset", col: str,
                  p: int = 8) -> "ray.data.Dataset":
    """HLL register table of a string column: one row per touched
    register, ``rho`` = max leading-zero rank seen.  One O(m·batches)
    groupby — the input never shuffles."""

    def partial(batch: pa.Table) -> pa.Table:
        c = batch.column(col)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        return hll_partial(hash_string_array(c), p)

    part = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
    return part.groupby("register").aggregate(
        Max("rho", alias_name="rho"))


def hll_estimate(registers: pa.Table, p: int = 8) -> float:
    """Standard bias-corrected HLL estimate (with the small-range
    linear-counting correction) from a (register, rho) table."""
    m = 1 << p
    rho = np.zeros(m, dtype=np.int64)
    rho[registers.column("register").to_numpy(zero_copy_only=False)] = \
        registers.column("rho").to_numpy(zero_copy_only=False)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -rho.astype(np.float64)))
    zeros = int(np.sum(rho == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)
