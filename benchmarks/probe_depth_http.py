"""Probe: closed-loop HTTP config-5 throughput vs pipeline depth.

The round-3 close-out (BENCHMARKS.md "HTTP-level config 5") attributes the
closed-loop occupancy gap (0.74 vs 0.99 open-loop) to dispatch run-ahead:
an admission only takes effect in segments dispatched after its insert, so
with pipeline depth D a freed slot sits masked for ~D segments of every
decode cycle. The engine-level sweep only measured depths 4 and 8 — this
probe runs the exact BASELINE config-5 harness (benchmarks/run_all.py::
bench_continuous: 64 closed-loop HTTP clients, 63 slots, worst-case
150-step decodes) at depths 1/2/3/4 to test whether a shallower pipeline
trades unneeded run-ahead for admission freshness. Reference workload
being beaten: sequential /predict/batch (reference app/src/main.py:546).

Writes one JSON line per depth; does NOT touch benchmarks/results.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--depths", default="1,2,3,4")
    ap.add_argument("--requests", type=int, default=256)
    ap.add_argument("--out", default=None,
                    help="optional JSON file for the full sweep")
    args = ap.parse_args()

    from run_all import bench_continuous

    rows = []
    for d in [int(x) for x in args.depths.split(",")]:
        os.environ["SERVING_PIPELINE_DEPTH"] = str(d)
        res = bench_continuous(iters=0, requests=args.requests)
        res["pipeline_depth"] = d
        rows.append(res)
        print(json.dumps(res), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
