"""A/B the flagship zonal heavy-pool width (GREENEX_HEAVY_WIDTH).

Runs q_spans_mean_ndvi_metrics in a FRESH Ray session per trial and
prints one JSON line per trial.  Usage:

    python tools/ab_zonal_width.py <width> [cpus] [sf_dir]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

width = sys.argv[1]
cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
if width != "default":
    os.environ["GREENEX_HEAVY_WIDTH"] = width

import ray  # noqa: E402

ray.init(address="local", num_cpus=cpus, include_dashboard=False,
         logging_level="ERROR")
from greenex_py_ray.pipelines.driver_queries import (  # noqa: E402
    q_spans_mean_ndvi_metrics,
)

t0 = time.perf_counter()
out = q_spans_mean_ndvi_metrics(sf)
n = out.count()
dt = time.perf_counter() - t0
print(json.dumps({"width": width, "cpus": cpus, "sec": round(dt, 3),
                  "rows": n}))
ray.shutdown()
