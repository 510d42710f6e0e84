"""HTTP-level NaN-confidence repro (config-5 stack, fault-tolerant).

bench_continuous asserts 200 and dies on the first NaN; this variant
collects every response, counts NaN/500s, and on failure dumps the live
engine's device-side slot state (lp_sum/count/pos per slot) plus the
request→slot bookkeeping, to tell device-born NaN from host/report
corruption.

Usage: python benchmarks/repro_nan_http.py [--requests 256] [--clients 64]
         [--slots 63] [--xla]
"""

from __future__ import annotations

import argparse
import asyncio
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from run_all import _make_worstcase_artifact  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=256)
    ap.add_argument("--clients", type=int, default=64)
    ap.add_argument("--slots", type=int, default=63)
    ap.add_argument("--segment", type=int, default=16)
    ap.add_argument("--xla", action="store_true")
    args = ap.parse_args()

    async def _run() -> None:
        import base64
        import dataclasses
        import io

        import jax
        from aiohttp.test_utils import TestClient, TestServer
        from PIL import Image

        from handwritten_math_ocr_api_tpu.core.config import ServeConfig
        from handwritten_math_ocr_api_tpu.serve.app import create_app

        with tempfile.TemporaryDirectory() as td:
            _make_worstcase_artifact(td)
            cfg = dataclasses.replace(
                ServeConfig.from_env(), model_dir=td,
                batching_mode="continuous", num_slots=args.slots,
                segment_steps=args.segment, use_fused_decode=not args.xla,
                rate_limit_per_minute=10 ** 9,
                rate_limit_per_hour=10 ** 9, rate_limit_per_day=10 ** 9,
                rate_limit_anonymous_daily=10 ** 9,
                max_concurrent_requests=10 ** 6)
            app = create_app(cfg)
            client = TestClient(TestServer(app))
            await client.start_server()
            bad: list = []
            try:
                rng = np.random.default_rng(0)
                img = Image.fromarray(
                    rng.integers(0, 255, (96, 320), np.uint8), "L")
                buf = io.BytesIO()
                img.save(buf, "PNG")
                payload = {
                    "image_data": base64.b64encode(buf.getvalue()).decode()}

                results: list = []

                async def worker(n, wid=0):
                    hdrs = {"User-Agent": f"loadtest-client-{wid}"}
                    for _ in range(n):
                        resp = await client.post("/predict", json=payload,
                                                 headers=hdrs)
                        body = await resp.text()
                        results.append((resp.status, body[:160]))

                await asyncio.gather(*[worker(1, w)
                                       for w in range(args.clients)])
                warm_bad = [r for r in results if r[0] != 200]
                results.clear()
                per = max(args.requests // args.clients, 1)
                t0 = time.perf_counter()
                await asyncio.gather(
                    *[worker(per, w) for w in range(args.clients)])
                dt = time.perf_counter() - t0
                bad = [r for r in results if r[0] != 200]
                n = len(results)
                print(f"warm_bad={len(warm_bad)} measured: {n} requests, "
                      f"{len(bad)} non-200, {n / dt:.1f} req/s")
                for s, b in (warm_bad + bad)[:10]:
                    print(f"  {s}: {b}")
                state = client.app["state"]
                dec = state.batcher.decoder
                small = jax.tree.map(np.asarray, dec._small)
                lp = small.lp_sum
                nonfin = np.where(~np.isfinite(lp))[0]
                print(f"device slots with non-finite lp_sum: {nonfin}")
                for r in nonfin[:8]:
                    print(f"  slot {r}: pos={small.pos[r]} "
                          f"count={small.count[r]} act={small.active[r]} "
                          f"fin={small.finished[r]} lp={lp[r]!r}")
                print(f"slot_req={dict(dec._slot_req)} "
                      f"free={sorted(dec._free)[:8]}... "
                      f"stats={dec.stats}")
            finally:
                await client.close()
        print("FAIL" if bad else "OK")

    asyncio.run(_run())


if __name__ == "__main__":
    main()
