"""Probe the tunnel's device->host copy semantics: does
``copy_to_host_async`` + ``is_ready`` actually overlap the RTT, or does
every ``np.asarray`` pay a full round trip regardless?

The pipelined continuous scheduler's whole design rides on reports
streaming back while later segments run; this measures that assumption
directly (and the raw dispatch/fetch RTT for reference).

Usage: python benchmarks/probe_async_fetch.py
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    @jax.jit
    def tiny(x):
        return x * 2 + 1

    x = jnp.ones((64, 151), jnp.int32)  # report-sized
    y = tiny(x)
    np.asarray(y)  # warm

    res = {}
    # 1) blocking fetch right after dispatch (no async copy)
    ts = []
    for _ in range(10):
        y = tiny(x)
        t0 = time.perf_counter()
        np.asarray(y)
        ts.append(time.perf_counter() - t0)
    res["fetch_after_dispatch_ms"] = round(1e3 * float(np.median(ts)), 2)

    # 2) async copy + wait, then fetch
    ts = []
    ready_after_wait = []
    for _ in range(10):
        y = tiny(x)
        try:
            y.copy_to_host_async()
        except Exception as e:
            res["copy_to_host_async_error"] = str(e)
            break
        time.sleep(0.3)  # far beyond any RTT
        try:
            ready_after_wait.append(bool(y.is_ready()))
        except Exception as e:
            res["is_ready_error"] = str(e)
            ready_after_wait.append(None)
        t0 = time.perf_counter()
        np.asarray(y)
        ts.append(time.perf_counter() - t0)
    if ts:
        res["fetch_after_async_and_wait_ms"] = round(
            1e3 * float(np.median(ts)), 2)
        res["is_ready_after_wait"] = ready_after_wait[:3]

    # 3) dispatch depth-4 chain, then fetch oldest (pipeline overlap test)
    ts = []
    for _ in range(5):
        ys = []
        v = x
        for _ in range(4):
            v = tiny(v)
            ys.append(v)
            try:
                v.copy_to_host_async()
            except Exception:
                pass
        t0 = time.perf_counter()
        np.asarray(ys[0])
        dt0 = time.perf_counter() - t0
        t1 = time.perf_counter()
        for v in ys[1:]:
            np.asarray(v)
        dt_rest = time.perf_counter() - t1
        ts.append((dt0, dt_rest))
    res["fetch_oldest_of_4_ms"] = round(
        1e3 * float(np.median([a for a, _ in ts])), 2)
    res["fetch_remaining_3_ms"] = round(
        1e3 * float(np.median([b for _, b in ts])), 2)

    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
