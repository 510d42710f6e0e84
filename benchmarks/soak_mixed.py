"""Mixed-workload soak of the live serving app on one chip.

Fires concurrent greedy /predict, beam-5 /predict, and /predict/batch
traffic at an in-process server (full middleware, batcher, rate-limiter
disabled via env-sized limits) for --seconds, then asserts every response
was well-formed and reports per-type latency percentiles, throughput,
process RSS drift, and the engine's /metrics. Production-robustness
evidence beyond the reference (its server decoded sequentially and was
never soak-tested; /root/reference/app/src/main.py:546-570).
"""
from __future__ import annotations

import argparse
import asyncio
import base64
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

import numpy as np


def _imgs_b64(model_dir: str, n: int = 8) -> list[str]:
    """Real stroke renders (the trained model's regime) as base64 PNGs."""
    from PIL import Image

    import random

    from handwritten_math_ocr_api_tpu.data.strokes import render_stroke_image
    from handwritten_math_ocr_api_tpu.data.synthetic import random_formula

    rng = np.random.default_rng(99)
    prng = random.Random(99)
    out = []
    for i in range(n):
        latex = random_formula(prng)
        arr = render_stroke_image(latex, rng)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        out.append(base64.b64encode(buf.getvalue()).decode())
    return out


async def run(args) -> dict:
    import dataclasses

    from aiohttp.test_utils import TestClient, TestServer

    from handwritten_math_ocr_api_tpu.core.config import ServeConfig
    from handwritten_math_ocr_api_tpu.serve.app import create_app

    cfg = dataclasses.replace(
        ServeConfig.from_env(), model_dir=args.model_dir,
        batching_mode="dynamic", use_fused_decode=True,
        rate_limit_per_minute=10 ** 9, rate_limit_per_hour=10 ** 9,
        rate_limit_per_day=10 ** 9, rate_limit_anonymous_daily=10 ** 9,
        max_concurrent_requests=10 ** 6)
    import aiohttp

    app = create_app(cfg)
    # first-touch requests compile (minutes through the remote-compile
    # tunnel); the default 5-min client timeout is too tight
    client = TestClient(TestServer(app),
                        timeout=aiohttp.ClientTimeout(total=1500))
    await client.start_server()
    imgs = _imgs_b64(args.model_dir)
    lat: dict[str, list[float]] = {"greedy": [], "beam": [], "batch": []}
    errors: list[str] = []
    stop_at = [0.0]

    async def check_predict(payload, query=""):
        s = time.perf_counter()
        r = await client.post("/predict" + query, json=payload)
        dt = time.perf_counter() - s
        body = await r.json()
        if r.status != 200 or not body.get("formula"):
            errors.append(f"predict{query}: {r.status} {body}")
        c = body.get("confidence")
        if c is not None and not np.isfinite(c):
            errors.append(f"non-finite confidence: {body}")
        return dt

    async def greedy_worker(i):
        while time.perf_counter() < stop_at[0]:
            lat["greedy"].append(
                await check_predict({"image_data": imgs[i % len(imgs)]}))

    async def beam_worker(i):
        while time.perf_counter() < stop_at[0]:
            lat["beam"].append(await check_predict(
                {"image_data": imgs[(i + 3) % len(imgs)]}, "?beam_size=5"))

    async def batch_worker():
        while time.perf_counter() < stop_at[0]:
            s = time.perf_counter()
            r = await client.post("/predict/batch",
                                  json={"images": imgs[:5]})
            dt = time.perf_counter() - s
            body = await r.json()
            preds = body.get("results") or body.get("predictions") or []
            if r.status != 200 or len(preds) != 5:
                errors.append(f"batch: {r.status} {str(body)[:200]}")
            lat["batch"].append(dt)

    async def probe_worker():
        while time.perf_counter() < stop_at[0]:
            for ep in ("/health", "/metrics", "/status"):
                r = await client.get(ep)
                if r.status != 200:
                    errors.append(f"{ep}: {r.status}")
                await r.json()
            await asyncio.sleep(1.0)

    # warm every path (compiles on first touch)
    await check_predict({"image_data": imgs[0]})
    await check_predict({"image_data": imgs[0]}, "?beam_size=5")
    await (await client.post("/predict/batch",
                             json={"images": imgs[:5]})).json()
    for v in lat.values():
        v.clear()
    def rss_mb() -> float:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024
        return 0.0

    rss_samples = [rss_mb()]

    async def rss_worker():
        while time.perf_counter() < stop_at[0]:
            await asyncio.sleep(10)
            rss_samples.append(rss_mb())

    stop_at[0] = time.perf_counter() + args.seconds
    t0 = time.perf_counter()
    await asyncio.gather(
        *[greedy_worker(i) for i in range(args.greedy_clients)],
        *[beam_worker(i) for i in range(args.beam_clients)],
        batch_worker(), probe_worker(), rss_worker())
    wall = time.perf_counter() - t0
    rss_samples.append(rss_mb())

    def pct(v, q):
        v = sorted(v)
        return round(v[min(int(len(v) * q), len(v) - 1)] * 1e3, 1) if v else None

    n_img = (len(lat["greedy"]) + len(lat["beam"])
             + 5 * len(lat["batch"]))
    out = {
        "metric": "soak_mixed_workload",
        "seconds": round(wall, 1),
        "errors": len(errors),
        "images_decoded": n_img,
        "images_per_sec": round(n_img / wall, 2),
        "greedy": {"n": len(lat["greedy"]), "p50_ms": pct(lat["greedy"], .5),
                   "p95_ms": pct(lat["greedy"], .95)},
        "beam5": {"n": len(lat["beam"]), "p50_ms": pct(lat["beam"], .5),
                  "p95_ms": pct(lat["beam"], .95)},
        "batch5": {"n": len(lat["batch"]), "p50_ms": pct(lat["batch"], .5),
                   "p95_ms": pct(lat["batch"], .95)},
        "rss_mb_samples": [round(r, 1) for r in rss_samples],
        "first_errors": errors[:5],
    }
    m = await (await client.get("/metrics")).json()
    out["served_total"] = (m.get("predictions") or {}).get("total")
    await client.close()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default="serving_model_r3c")
    ap.add_argument("--seconds", type=float, default=180)
    ap.add_argument("--greedy-clients", type=int, default=6)
    ap.add_argument("--beam-clients", type=int, default=2)
    args = ap.parse_args()
    print(json.dumps(asyncio.run(run(args))))


if __name__ == "__main__":
    main()
