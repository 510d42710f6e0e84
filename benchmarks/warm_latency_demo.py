"""Warm single-request HTTP latency demo + per-stage budget.

Round-2 verdict item 2: the live demo showed warm processing_time of
125-133 ms while the decode kernel underneath runs in 5.8-6.7 ms
(pipelined) / ~41 ms (isolated incl. tunnel dispatch). This script
produces the refreshed evidence artifact: it serves the trained model
in-process (same aiohttp app as production, TestClient transport = no
network socket noise), fires sequential warm single requests, and then
budgets the latency per stage:

- client wall time per request (transport + middleware + handler)
- server processing_time (the reference's wire metric,
  /root/reference/app/src/main.py:452)
- /metrics request_stages: "input" (body read + PIL decode + stretch-
  resize preprocess) vs "decode" (batcher submit -> result future)
- batcher-level timers distinguish queue wait from device dispatch

Whatever the decode stage shows beyond the known pure-device time is
host->device dispatch + device->host fetch through the tunnel (~26 ms
RTT measured in benchmarks/profile_decode.py) — co-located serving
does not pay it.

Usage:
  python benchmarks/warm_latency_demo.py --model-dir serving_model_r2 \
      --use-fused [--quantize] [--requests 20]

Prints a human-readable report (redirect to docs/evidence/...) with one
JSON summary line at the end.
"""

from __future__ import annotations

import argparse
import asyncio
import base64
import io
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

import numpy as np  # noqa: E402


def _png_b64(seed: int = 0) -> str:
    from PIL import Image

    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 255, (96, 320), np.uint8), "L")
    buf = io.BytesIO()
    img.save(buf, "PNG")
    return base64.b64encode(buf.getvalue()).decode()


async def run(args) -> dict:
    import dataclasses

    from aiohttp.test_utils import TestClient, TestServer

    from handwritten_math_ocr_api_tpu.core.config import ServeConfig
    from handwritten_math_ocr_api_tpu.serve.app import create_app

    cfg = dataclasses.replace(
        ServeConfig.from_env(),
        model_dir=args.model_dir,
        batching_mode="dynamic",
        use_fused_decode=args.use_fused,
        quantize_decode=args.quantize,
        warmup_batch_sizes=(1,),
        rate_limit_per_minute=10 ** 9, rate_limit_per_hour=10 ** 9,
        rate_limit_per_day=10 ** 9, rate_limit_anonymous_daily=10 ** 9,
        max_concurrent_requests=10 ** 6)
    app = create_app(cfg)
    client = TestClient(TestServer(app))
    await client.start_server()
    try:
        # distinct images so results differ; first request pays any
        # residual compile, then a few extra to reach steady state
        payloads = [{"image_data": _png_b64(i)} for i in range(8)]
        r = await client.post("/predict", json=payloads[0])
        assert r.status == 200, await r.text()
        first = (await r.json())["processing_time"]
        for p in payloads[1:4]:
            await client.post("/predict", json=p)

        # reset stage timers so the budget reflects warm requests only
        st = app["state"]
        st.request_timer.reset()

        wall, proc = [], []
        for i in range(args.requests):
            p = payloads[i % len(payloads)]
            t0 = time.perf_counter()
            resp = await client.post("/predict", json=p)
            body = await resp.json()
            wall.append(time.perf_counter() - t0)
            proc.append(body["processing_time"])

        m = await (await client.get("/metrics")).json()
        stages = m.get("request_stages", {})
        wall_ms = sorted(1e3 * w for w in wall)
        proc_ms = sorted(1e3 * p for p in proc)
        return {
            "first_request_ms": round(1e3 * first, 1),
            "warm_wall_p50_ms": round(wall_ms[len(wall_ms) // 2], 1),
            "warm_wall_min_ms": round(wall_ms[0], 1),
            "warm_proc_p50_ms": round(proc_ms[len(proc_ms) // 2], 1),
            "warm_proc_min_ms": round(proc_ms[0], 1),
            "warm_proc_mean_ms": round(statistics.mean(proc_ms), 1),
            "request_stages": stages,
            "use_fused": args.use_fused,
            "quantize": args.quantize,
            "requests": args.requests,
        }
    finally:
        await client.close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default="serving_model_r2")
    ap.add_argument("--use-fused", action="store_true")
    ap.add_argument("--quantize", action="store_true")
    ap.add_argument("--requests", type=int, default=20)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke-testing only; "
                         "latencies are not evidence)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    res = asyncio.run(run(args))

    print("Warm single-request latency budget (in-process HTTP)")
    print("====================================================")
    print(f"model_dir={args.model_dir} fused={args.use_fused} "
          f"int8={args.quantize} n={args.requests}")
    print(f"first request (compile/warm): {res['first_request_ms']} ms")
    print(f"warm client wall:  p50 {res['warm_wall_p50_ms']} ms, "
          f"min {res['warm_wall_min_ms']} ms")
    print(f"warm processing_time (server): p50 {res['warm_proc_p50_ms']} ms,"
          f" min {res['warm_proc_min_ms']} ms, "
          f"mean {res['warm_proc_mean_ms']} ms")
    for name, s in (res.get("request_stages") or {}).items():
        print(f"  stage {name:8s}: mean {1e3 * s.get('mean_sec', 0):.1f} ms"
              f"  ewma {1e3 * s.get('ewma_sec', 0):.1f} ms"
              f"  n={s.get('count')}")
    print()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
