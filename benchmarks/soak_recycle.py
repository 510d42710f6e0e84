"""Recycle soak: SERVING_MAX_REQUESTS under a supervisor loop.

The round-4 "Done" proof for the worker self-recycling guard
(serve/app.py::recycle_middleware): run the REAL server as a subprocess
with a small SERVING_MAX_REQUESTS, supervise it the way systemd
Restart=always / docker restart: unless-stopped would (restart on exit,
require exit code 0), and fire more requests than one worker's budget
from closed-loop clients that retry on 503/connection-reset (exactly what
a load balancer + retrying client does during a rolling recycle).

Asserts:
  - every request eventually succeeds (zero dropped across N recycles);
  - each worker generation exits 0 (graceful drain, not a crash);
  - per-generation peak RSS stays bounded (each fresh worker starts from
    baseline — the recycle actually resets the remote-runtime drift).

Usage:
  python benchmarks/soak_recycle.py --model-dir serving_model_r4 \
      [--max-requests 40] [--total 140] [--clients 8]
Writes benchmarks/soak_recycle_results.json.
"""

from __future__ import annotations

import argparse
import asyncio
import base64
import io
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

PORT = 8733
SERVER_SRC = r"""
import sys
sys.path.insert(0, {repo!r})
from handwritten_math_ocr_api_tpu.serve.app import run_server
run_server(model_dir=sys.argv[1], host='127.0.0.1', port=int(sys.argv[2]))
""".format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _png_b64() -> str:
    from PIL import Image

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (96, 320), np.uint8), "L")
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
               SERVING_WARMUP="0",
               RATE_LIMIT_PER_MINUTE="1000000000",
               RATE_LIMIT_PER_HOUR="1000000000",
               RATE_LIMIT_PER_DAY="1000000000",
               RATE_LIMIT_ANON_DAILY="1000000000",
               MAX_CONCURRENT_REQUESTS="1000000")
    script = os.path.join("/tmp", "soak_recycle_server.py")
    with open(script, "w") as f:
        f.write(SERVER_SRC)

    generations = []       # (pid, exit_code, peak_rss_mb, served)
    proc = None

    def spawn():
        nonlocal proc
        proc = subprocess.Popen(
            [sys.executable, script, args.model_dir, str(PORT)], env=env,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        generations.append({"pid": proc.pid, "exit": None,
                            "peak_rss_mb": 0.0})
        return proc

    spawn()
    payload = {"image_data": _png_b64()}
    ok = 0
    retries = 0
    t0 = time.time()
    lock = asyncio.Lock()

    async def supervisor():
        """systemd stand-in: restart on exit, record exit codes + RSS."""
        while ok < args.total:
            rc = proc.poll()
            gen = generations[-1]
            if rc is None:
                gen["peak_rss_mb"] = max(gen["peak_rss_mb"],
                                         _rss_mb(proc.pid))
            else:
                gen["exit"] = rc
                if ok < args.total:
                    spawn()
            await asyncio.sleep(0.2)

    async def worker(session):
        nonlocal ok, retries
        while True:
            async with lock:
                if ok >= args.total:
                    return
            try:
                async with session.post(
                        f"http://127.0.0.1:{PORT}/predict", json=payload,
                        timeout=aiohttp.ClientTimeout(total=30)) as r:
                    if r.status == 200:
                        await r.json()
                        async with lock:
                            ok += 1
                        continue
                    retries += 1          # 503 drain window
            except (aiohttp.ClientError, asyncio.TimeoutError, OSError):
                retries += 1              # restart window
            await asyncio.sleep(0.3)

    # wait for first /health
    async with aiohttp.ClientSession() as session:
        for _ in range(120):
            try:
                async with session.get(
                        f"http://127.0.0.1:{PORT}/health",
                        timeout=aiohttp.ClientTimeout(total=2)):
                    break
            except Exception:
                await asyncio.sleep(1)
        sup = asyncio.create_task(supervisor())
        await asyncio.gather(*[worker(session)
                               for _ in range(args.clients)])
        sup.cancel()
    if proc.poll() is None:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
        generations[-1]["exit"] = proc.returncode

    elapsed = time.time() - t0
    finished = [g for g in generations if g["exit"] is not None]
    recycled = [g for g in finished[:-1]]  # all but the terminated last
    out = {
        "metric": "soak_recycle",
        "total_requests_ok": ok,
        "requested": args.total,
        "max_requests_per_worker": args.max_requests,
        "generations": len(generations),
        "recycle_exit_codes": [g["exit"] for g in recycled],
        "peak_rss_mb_per_generation": [round(g["peak_rss_mb"], 1)
                                       for g in generations],
        "client_retries_during_recycles": retries,
        "elapsed_s": round(elapsed, 1),
        "zero_dropped": ok >= args.total,
        "all_recycles_exit_0": all(g["exit"] == 0 for g in recycled),
    }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default="serving_model_r4")
    ap.add_argument("--max-requests", type=int, default=40)
    ap.add_argument("--total", type=int, default=140)
    ap.add_argument("--clients", type=int, default=8)
    args = ap.parse_args()
    out = asyncio.run(main_async(args))
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "soak_recycle_results.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    assert out["zero_dropped"] and out["all_recycles_exit_0"], out


if __name__ == "__main__":
    main()
