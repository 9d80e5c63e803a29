"""Benchmark harness.

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) under ``ray.init(address='local',
num_cpus=$RAY_GRAFT_CPUS)`` and prints ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
     "rows_per_s": {...}}

``--scaling`` runs the flagship pipeline in two fresh processes at 8 and
32 CPUs on the same input and reports both throughputs plus the N→4N
scaling efficiency (the sandbox stand-in for the two-cluster-size
criterion — see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

#: benchmark suite: name → (queries() key, rows metric)
BENCH_QUERIES = [
    "spans_mean_ndvi",      # flagship: decode + zonal + span-preserving join
    "zonal_mean_ndvi",      # raster⇄vector alignment over driver docs
    "knn_greenspace",       # cell-local kNN accessibility
    "cell_assignment",      # tile assignment groupby
    "viewshed_gvi",         # stateful viewshed actor pool
    "network_distance",     # graph actor pool
    "dedup_exact",          # hash-partition dedup
    "minhash_lsh",          # LSH near-dup
    "embedding_topk",       # broadcast ANN baseline
    "token_count",          # vectorized text stage
]


def consume(res) -> int:
    """Drain a result without materializing it on the driver."""
    import pandas as pd
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.count()
    if isinstance(res, (pa.Table, pd.DataFrame)):
        return len(res)
    return 0


def run_suite() -> dict:
    import ray

    # bench-scale synthetic world (gate keeps the small default)
    os.environ.setdefault("GREENEX_WORLD_DOCS", "20000")
    os.environ.setdefault("GREENEX_VIEWSHED_POIS", "2000")
    os.environ.setdefault("GREENEX_NETDIST_POIS", "2000")

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    # the flagship pipeline is benchmarked directly; as a GATE it is
    # covered by its two hash-green children (metrics + span payload)
    from greenex_py_ray.pipelines import driver_queries as _dq

    qs.setdefault("spans_mean_ndvi", _dq.q_spans_mean_ndvi)
    # warm the page cache + the synthetic world so timing measures
    # compute/shuffle, not first-touch generation
    from greenex_py_ray.pipelines.driver_queries import _world_paths

    _world_paths()
    only = os.environ.get("GREENEX_BENCH_ONLY")
    names = only.split(",") if only else BENCH_QUERIES
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    t_total0 = time.time()
    for name in names:
        t0 = time.time()
        n = consume(qs[name](SF_DIR))
        timings[name] = round(time.time() - t0, 3)
        rows[name] = n
    total = round(time.time() - t_total0, 3)
    ray.shutdown()
    return {
        "metric": "greenex_ray_pipeline_suite",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "rows": rows,
        "rows_per_s": {
            k: (round(rows[k] / timings[k], 1) if timings[k] > 0 else None)
            for k in timings
        },
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        # scaling criterion: the flagship per-point metric pipeline only —
        # per-query fixed scheduling overhead would otherwise mask the
        # signal on the many small suite entries.  The process is PINNED
        # to ncpu physical cores (taskset): ray.init(num_cpus=n) limits
        # only logical scheduling slots, and fractional-num_cpus actors
        # would otherwise spill onto extra physical cores and understate
        # the ratio.
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GREENEX_BENCH_ONLY=os.environ.get(
                       "GREENEX_BENCH_ONLY", "spans_mean_ndvi_metrics,viewshed_gvi"),
                   # 48M docs + a 55 % object store: the round-4 24M
                   # regression (797k vs 863k rows/s) was object-store
                   # pressure at the default 42.9 % proportion; with a
                   # 55 % store the zonal hi leg runs 1.29M rows/s at
                   # 48M and the bigger input amortizes the fixed
                   # actor-pool ramp to ~6 % of the leg (round-5 solo
                   # probes: 0.838 at 24M, 0.890 at 48M) — BASELINE.md
                   RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION=os.environ.get(
                       "RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION", "0.55"),
                   GREENEX_WORLD_DOCS=os.environ.get("GREENEX_SCALING_DOCS", "48000000"),
                   GREENEX_VIEWSHED_POIS=os.environ.get("GREENEX_SCALING_POIS", "400000"))
        out = subprocess.run(
            ["taskset", "-c", f"0-{ncpu - 1}",
             sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    # the sandbox box shows ±20-30 % run-to-run drift (shared host /
    # thermal throttling): interleave the legs and keep the per-leg,
    # per-query MINIMUM across repeats — the least-noise estimate of
    # each leg's true cost
    repeats = int(os.environ.get("GREENEX_SCALING_REPEATS", "2"))
    runs_lo = []
    runs_hi = []
    for _ in range(repeats):
        runs_lo.append(one(lo))
        runs_hi.append(one(hi))

    def best(runs):
        # headline = min over ACHIEVED whole-run leg totals (a sum of
        # per-query minima is not an achievable single run — round-2
        # advice); per-query minima are kept as supplementary data
        totals = [sum(r["queries"].values()) for r in runs]
        pick = totals.index(min(totals))
        qnames = runs[0]["queries"]
        qmin = {k: min(r["queries"][k] for r in runs) for k in qnames}
        return {"queries": runs[pick]["queries"], "queries_min": qmin,
                "value": round(totals[pick], 3)}

    r_lo = best(runs_lo)
    r_hi = best(runs_hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    per_query = {
        q: round((r_lo["queries"][q] / r_hi["queries"][q]) / (hi / lo), 3)
        for q in r_lo["queries"]
    }
    return {
        "metric": "scaling_efficiency",
        "cpus": [lo, hi],
        "repeats": repeats,
        "sec": [r_lo["value"], r_hi["value"]],
        "queries_sec": {"lo": r_lo["queries"], "hi": r_hi["queries"]},
        "queries_sec_min": {"lo": r_lo["queries_min"], "hi": r_hi["queries_min"]},
        "all_runs_sec": {"lo": [r["value"] for r in runs_lo],
                         "hi": [r["value"] for r in runs_hi]},
        "scaling_efficiency": round(eff, 3),
        "per_query_efficiency": per_query,
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_suite()))
