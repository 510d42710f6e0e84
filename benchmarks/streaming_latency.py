"""Streaming decode latency: time-to-first-token vs full-decode wall time.

The SSE endpoint (`/predict/stream`, decode/streaming.py) exists to cut
perceived latency: the client sees the first tokens after encode + one
segment instead of after the whole decode. This benchmark measures, on the
trained serving artifact:

1. engine-level: time-to-first-event (TTFT) and total stream wall time of
   ``DecodeEngine.predict_stream`` across segment lengths, vs the one-shot
   ``predict_single`` wall time on the same images;
2. HTTP-level: TTFT measured at the SSE wire (first ``data:`` line) vs the
   plain /predict wall time, via the in-process aiohttp app (TestClient
   transport — no socket noise; the tunnel RTT still applies on a remote
   chip and is reported as-is).

Usage:
  python benchmarks/streaming_latency.py --model-dir serving_model_r3c \
      [--requests 12] [--cpu]

Prints a report with one JSON summary line at the end.
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


def _img(seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (96, 320, 1), np.uint8).astype(
        np.float32) / 127.5 - 1.0


def _png_b64(seed: int = 0) -> str:
    from PIL import Image

    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 255, (96, 320), np.uint8), "L")
    buf = io.BytesIO()
    img.save(buf, "PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _p50(xs):
    return sorted(xs)[len(xs) // 2]


def bench_engine(model_dir: str, requests: int, segments=(4, 8, 16)) -> dict:
    from handwritten_math_ocr_api_tpu.core.config import DecodeConfig
    from handwritten_math_ocr_api_tpu.core.tokenizer import Tokenizer
    from handwritten_math_ocr_api_tpu.decode.api import DecodeEngine
    from handwritten_math_ocr_api_tpu.train.checkpoint import (
        load_params_for_serving,
    )

    params, state, vocab, idx2char, cfg = load_params_for_serving(model_dir)
    tok = Tokenizer(vocab, idx2char)
    engine = DecodeEngine(params, state, cfg, DecodeConfig(), tok)
    imgs = [_img(i) for i in range(requests)]

    # warm the one-shot path
    engine.predict_single(imgs[0])
    single = []
    for im in imgs:
        t0 = time.perf_counter()
        engine.predict_single(im)
        single.append(time.perf_counter() - t0)

    out = {"single_p50_ms": round(1e3 * _p50(single), 2)}
    for seg in segments:
        # warm this segment length's compiled pair
        list(engine.predict_stream(imgs[0], segment_steps=seg))
        ttft, total, n_events = [], [], []
        for im in imgs:
            t0 = time.perf_counter()
            first = None
            count = 0
            for _ in engine.predict_stream(im, segment_steps=seg):
                if first is None:
                    first = time.perf_counter() - t0
                count += 1
            total.append(time.perf_counter() - t0)
            ttft.append(first if first is not None else total[-1])
            n_events.append(count)
        out[f"seg{seg}"] = {
            "ttft_p50_ms": round(1e3 * _p50(ttft), 2),
            "total_p50_ms": round(1e3 * _p50(total), 2),
            "events_mean": round(statistics.mean(n_events), 1),
        }
    return out


async def bench_http(model_dir: str, requests: int,
                     segment_steps: int = 8) -> dict:
    import dataclasses

    from aiohttp.test_utils import TestClient, TestServer

    from handwritten_math_ocr_api_tpu.core.config import ServeConfig
    from handwritten_math_ocr_api_tpu.serve.app import create_app

    cfg = dataclasses.replace(
        ServeConfig.from_env(), model_dir=model_dir,
        batching_mode="dynamic", warmup_batch_sizes=(1,),
        rate_limit_per_minute=10 ** 9, rate_limit_per_hour=10 ** 9,
        rate_limit_per_day=10 ** 9, rate_limit_anonymous_daily=10 ** 9,
        max_concurrent_requests=10 ** 6)
    app = create_app(cfg)
    client = TestClient(TestServer(app))
    await client.start_server()
    try:
        payloads = [{"image_data": _png_b64(i)} for i in range(requests)]
        # warm both paths
        await client.post("/predict", json=payloads[0])
        r = await client.post(
            f"/predict/stream?segment_steps={segment_steps}",
            json=payloads[0])
        await r.read()

        plain = []
        for p in payloads:
            t0 = time.perf_counter()
            r = await client.post("/predict", json=p)
            await r.json()
            plain.append(time.perf_counter() - t0)

        ttft, total = [], []
        for p in payloads:
            t0 = time.perf_counter()
            r = await client.post(
                f"/predict/stream?segment_steps={segment_steps}", json=p)
            first = None
            async for chunk in r.content.iter_any():
                if first is None and b"data: " in chunk:
                    first = time.perf_counter() - t0
            total.append(time.perf_counter() - t0)
            ttft.append(first if first is not None else total[-1])
        return {
            "plain_wall_p50_ms": round(1e3 * _p50(plain), 2),
            "sse_ttft_p50_ms": round(1e3 * _p50(ttft), 2),
            "sse_total_p50_ms": round(1e3 * _p50(total), 2),
            "segment_steps": segment_steps,
        }
    finally:
        await client.close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default="serving_model_r3c")
    ap.add_argument("--requests", type=int, default=12)
    ap.add_argument("--segment-steps", type=int, default=8)
    ap.add_argument("--cpu", action="store_true",
                    help="CPU backend (smoke only; latencies not evidence)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    eng = bench_engine(args.model_dir, args.requests)
    http = asyncio.run(bench_http(args.model_dir, args.requests,
                                  args.segment_steps))
    print("Streaming decode latency (time-to-first-token)")
    print(f"  engine one-shot predict_single p50: "
          f"{eng['single_p50_ms']} ms")
    for k, v in eng.items():
        if k.startswith("seg"):
            print(f"  engine stream {k}: TTFT {v['ttft_p50_ms']} ms, "
                  f"total {v['total_p50_ms']} ms, "
                  f"{v['events_mean']} events")
    print(f"  HTTP plain /predict p50: {http['plain_wall_p50_ms']} ms")
    print(f"  HTTP SSE TTFT p50: {http['sse_ttft_p50_ms']} ms "
          f"(total {http['sse_total_p50_ms']} ms, "
          f"segment_steps={http['segment_steps']})")
    print(json.dumps({"engine": eng, "http": http}))


if __name__ == "__main__":
    main()
