#!/usr/bin/env python
"""Measure one query's warm wall-time distribution (VERDICT r3 item 1:
pin whether the regr_price_by_qty 1.375->2.593 s swing was host noise).

Usage: python BENCH/measure_regr.py [query ...] [--n N]
Runs each query N times (default 12) in ONE Ray session over
$GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints per-query
min/p25/p50/p75/max JSON.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    argv = sys.argv[1:]
    n = 12
    if "--n" in argv:
        i = argv.index("--n")
        n = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    queries = argv or ["regr_price_by_qty"]
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ocr_ray.pipelines.queries import QUERY_FNS

    out = {}
    for name in queries:
        fn = QUERY_FNS[name]
        times = []
        for _ in range(n + 1):  # first iteration is the warmup, dropped
            t0 = time.perf_counter()
            res = fn(sf_dir)
            if hasattr(res, "to_pandas"):
                res = res.to_pandas()
            times.append(time.perf_counter() - t0)
        warm = np.array(times[1:])
        out[name] = {
            "n": len(warm),
            "min": round(float(warm.min()), 3),
            "p25": round(float(np.percentile(warm, 25)), 3),
            "p50": round(float(np.percentile(warm, 50)), 3),
            "p75": round(float(np.percentile(warm, 75)), 3),
            "max": round(float(warm.max()), 3),
        }
    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
