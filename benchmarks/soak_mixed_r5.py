"""Combined-feature soak (round 5): every serving feature AT ONCE.

Round 4 proved the features individually (recycle soak, constrained
loadtest, streaming demo, cancellation tests). This soak runs ONE
sustained mixed workload against the real server with everything
enabled simultaneously:

  - continuous batching (fused megakernel) + CONSTRAINED decode
    (SERVING_CONSTRAINED=1, pushdown masks in the segment kernel),
  - confidence CALIBRATION (auto: <model_dir>/calibration.json),
  - worker self-RECYCLING (SERVING_MAX_REQUESTS) under a
    systemd-stand-in supervisor, with closed-loop clients retrying
    through the drain windows,
  - request DEADLINE (SERVING_REQUEST_TIMEOUT) armed,
  - a client mix of greedy /predict, SAMPLED /predict
    (?temperature&top_k), STREAMING /predict/stream (SSE), and a
    CANCELLER that aborts its requests mid-flight (client disconnect ->
    slot reclaim).

Asserts: zero dropped requests across recycles, every recycle exits 0,
per-generation peak RSS bounded, every returned confidence finite in
[0, 1], every streamed decode ends with a final event.

Usage:
  python benchmarks/soak_mixed_r5.py --model-dir serving_model_r4 \
      [--max-requests 60] [--total 180]
Writes benchmarks/soak_mixed_r5_results.json.
"""

from __future__ import annotations

import argparse
import asyncio
import base64
import io
import json
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

PORT = 8741
SERVER_SRC = r"""
import sys
sys.path.insert(0, {repo!r})
from handwritten_math_ocr_api_tpu.serve.app import run_server
run_server(model_dir=sys.argv[1], host='127.0.0.1', port=int(sys.argv[2]))
""".format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _png_b64(seed: int = 0) -> str:
    from PIL import Image, ImageDraw

    img = Image.new("L", (320, 96), 250)
    d = ImageDraw.Draw(img)
    d.text((90, 30), ["x+2", "a-b", "3y", "z^2"][seed % 4], fill=10)
    arr = np.asarray(img, np.float32)
    arr += np.random.default_rng(seed).normal(0, 4, arr.shape)
    img = Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8), "L")
    buf = io.BytesIO()
    img.save(buf, "PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _rss_mb(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


async def main_async(args) -> dict:
    import aiohttp

    env = dict(os.environ,
               SERVING_MAX_REQUESTS=str(args.max_requests),
               SERVING_BATCH_MODE="continuous",
               SERVING_USE_FUSED="1",
               SERVING_CONSTRAINED="1",
               SERVING_REQUEST_TIMEOUT="25",
               SERVING_WARMUP="0",
               SERVING_NUM_SLOTS="16",
               RATE_LIMIT_PER_MINUTE="1000000000",
               RATE_LIMIT_PER_HOUR="1000000000",
               RATE_LIMIT_PER_DAY="1000000000",
               RATE_LIMIT_ANON_DAILY="1000000000",
               MAX_CONCURRENT_REQUESTS="1000000")
    script = os.path.join("/tmp", "soak_mixed_server.py")
    with open(script, "w") as f:
        f.write(SERVER_SRC)

    generations = []
    proc = None

    def spawn():
        nonlocal proc
        proc = subprocess.Popen(
            [sys.executable, script, args.model_dir, str(PORT)], env=env,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        generations.append({"pid": proc.pid, "exit": None,
                            "peak_rss_mb": 0.0})

    spawn()
    payloads = [{"image_data": _png_b64(i)} for i in range(4)]
    counters = {"greedy": 0, "sampled": 0, "stream": 0, "cancelled": 0,
                "retries": 0, "bad_conf": 0, "invalid_stream": 0}
    confs = []
    t0 = time.time()
    lock = asyncio.Lock()

    def total_ok():
        return counters["greedy"] + counters["sampled"] + counters["stream"]

    async def supervisor():
        while total_ok() < args.total:
            rc = proc.poll()
            gen = generations[-1]
            if rc is None:
                gen["peak_rss_mb"] = max(gen["peak_rss_mb"],
                                         _rss_mb(proc.pid))
            else:
                gen["exit"] = rc
                spawn()
            await asyncio.sleep(0.2)

    def check_conf(body):
        c = body.get("confidence")
        if (c is None or not isinstance(c, (int, float))
                or math.isnan(c) or not 0.0 <= c <= 1.0):
            counters["bad_conf"] += 1
        else:
            confs.append(float(c))

    async def predict_worker(session, kind, i):
        url = f"http://127.0.0.1:{PORT}/predict"
        if kind == "sampled":
            url += "?temperature=0.8&top_k=10&seed=7"
        while True:
            async with lock:
                if total_ok() >= args.total:
                    return
            try:
                async with session.post(
                        url, json=payloads[i % 4],
                        timeout=aiohttp.ClientTimeout(total=30)) as r:
                    if r.status == 200:
                        body = await r.json()
                        check_conf(body)
                        async with lock:
                            counters[kind] += 1
                        continue
                    counters["retries"] += 1
            except (aiohttp.ClientError, asyncio.TimeoutError, OSError):
                counters["retries"] += 1
            await asyncio.sleep(0.3)

    async def stream_worker(session, i):
        url = f"http://127.0.0.1:{PORT}/predict/stream?segment_steps=8"
        while True:
            async with lock:
                if total_ok() >= args.total:
                    return
            try:
                saw_final = False
                cut_midstream = False
                async with session.post(
                        url, json=payloads[i % 4],
                        timeout=aiohttp.ClientTimeout(total=60)) as r:
                    if r.status != 200:
                        counters["retries"] += 1
                        await asyncio.sleep(0.3)
                        continue
                    # SSE lines can split across transport chunks:
                    # buffer and parse line-by-line
                    buf = b""
                    try:
                        async for raw in r.content:
                            buf += raw
                            while b"\n" in buf:
                                line_b, buf = buf.split(b"\n", 1)
                                line = line_b.decode(
                                    errors="replace").strip()
                                if not line.startswith("data:"):
                                    continue
                                try:
                                    evt = json.loads(line[5:])
                                except ValueError:
                                    continue
                                if (evt.get("event") == "final"
                                        or "formula" in evt):
                                    saw_final = True
                                    if "confidence" in evt:
                                        check_conf(evt)
                    except (aiohttp.ClientError, OSError):
                        # connection cut mid-stream (worker recycling):
                        # a retryable condition, not a protocol violation
                        cut_midstream = True
                if saw_final:
                    async with lock:
                        counters["stream"] += 1
                elif cut_midstream:
                    counters["retries"] += 1
                else:
                    counters["invalid_stream"] += 1
            except (aiohttp.ClientError, asyncio.TimeoutError, OSError):
                counters["retries"] += 1
            await asyncio.sleep(0.2)

    async def cancel_worker(session, i):
        """Client disconnects mid-flight: post, then abort after ~80 ms.
        Exercises deadline/cancellation slot reclaim under load."""
        url = f"http://127.0.0.1:{PORT}/predict"
        while True:
            async with lock:
                if total_ok() >= args.total:
                    return
            try:
                async with asyncio.timeout(0.08):
                    async with session.post(
                            url, json=payloads[i % 4]) as r:
                        await r.json()
            except (asyncio.TimeoutError, aiohttp.ClientError, OSError):
                counters["cancelled"] += 1
            await asyncio.sleep(0.5)

    async with aiohttp.ClientSession() as session:
        for _ in range(180):
            try:
                async with session.get(
                        f"http://127.0.0.1:{PORT}/health",
                        timeout=aiohttp.ClientTimeout(total=2)) as r:
                    body = await r.json()
                    if body.get("checks", {}).get("model_loaded"):
                        break
            except Exception:
                pass
            await asyncio.sleep(1)
        sup = asyncio.create_task(supervisor())
        workers = ([predict_worker(session, "greedy", i)
                    for i in range(5)]
                   + [predict_worker(session, "sampled", i)
                      for i in range(2)]
                   + [stream_worker(session, i) for i in range(2)]
                   + [cancel_worker(session, 0)])
        await asyncio.gather(*workers)
        sup.cancel()
    if proc.poll() is None:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
        generations[-1]["exit"] = proc.returncode

    finished = [g for g in generations if g["exit"] is not None]
    recycled = finished[:-1]
    out = {
        "metric": "soak_mixed_r5",
        "requested": args.total,
        "ok_by_kind": {k: counters[k]
                       for k in ("greedy", "sampled", "stream")},
        "cancelled_aborts": counters["cancelled"],
        "client_retries": counters["retries"],
        "generations": len(generations),
        "recycle_exit_codes": [g["exit"] for g in recycled],
        "peak_rss_mb_per_generation": [round(g["peak_rss_mb"], 1)
                                       for g in generations],
        "confidences_checked": len(confs),
        "bad_confidences": counters["bad_conf"],
        "invalid_streams": counters["invalid_stream"],
        "mean_confidence": (round(float(np.mean(confs)), 4)
                            if confs else None),
        "elapsed_s": round(time.time() - t0, 1),
        "zero_dropped": total_ok() >= args.total,
        "all_recycles_exit_0": all(g["exit"] == 0 for g in recycled),
        "features": ["continuous+fused", "constrained", "calibration",
                     "sampling", "streaming", "cancellation", "deadline",
                     "recycle"],
    }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default="serving_model_r4")
    ap.add_argument("--max-requests", type=int, default=60)
    ap.add_argument("--total", type=int, default=180)
    args = ap.parse_args()
    out = asyncio.run(main_async(args))
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "soak_mixed_r5_results.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    assert out["zero_dropped"], out
    assert out["all_recycles_exit_0"], out
    assert out["bad_confidences"] == 0, out
    assert out["invalid_streams"] == 0, out


if __name__ == "__main__":
    main()
