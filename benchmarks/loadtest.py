"""HTTP-level serving load test: concurrent clients against the live API.

Measures what the reference never could (its /predict was one decode per
request, sequential): end-to-end request latency percentiles and sustained
throughput under concurrency, exercising the full middleware + batching
stack. Runs the server in-process against a serving artifact (or a tiny
random-weight model with --tiny), fires N concurrent clients for the given
number of requests, and prints one JSON line.

Usage:
  python benchmarks/loadtest.py --model-dir trained-model --clients 64
  python benchmarks/loadtest.py --tiny --clients 16 --requests 64
  python benchmarks/loadtest.py --tiny --mode continuous ...
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

import numpy as np  # noqa: E402


def _png_b64(seed: int = 0) -> str:
    from PIL import Image

    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 255, (96, 320), np.uint8), "L")
    buf = io.BytesIO()
    img.save(buf, "PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _make_tiny_artifact(path: str):
    import jax

    from handwritten_math_ocr_api_tpu.core.config import (
        ModelConfig, SwinConfig,
    )
    from handwritten_math_ocr_api_tpu.models.model import init_model
    from handwritten_math_ocr_api_tpu.train.checkpoint import (
        save_params_for_serving,
    )

    cfg = ModelConfig(
        d_model=32, nhead=4, dim_feedforward=64, dropout=0.0,
        num_decoder_layers=2, max_seq_len=16, vocab_size=24,
        dtype="float32",
        swin=SwinConfig(embed_dim=8, depths=(1, 1), num_heads=(2, 2),
                        window_size=4, stochastic_depth=0.0))
    params, _ = init_model(jax.random.PRNGKey(0), cfg)
    vocab = {"<pad>": 0, "<sos>": 1, "<eos>": 2, "<unk>": 3}
    for i in range(4, cfg.vocab_size):
        vocab[f"t{i}"] = i
    save_params_for_serving(path, params, vocab, cfg)
    return path


def _make_worstcase_artifact(path: str):
    """Flagship-architecture random weights with <eos> suppressed: every
    request decodes the full 150-step cap — the scheduler-stress workload
    the engine-level sweeps use (sweep_continuous.py), at the HTTP surface."""
    import jax
    import jax.numpy as jnp

    from handwritten_math_ocr_api_tpu.core.config import EOS_ID, ModelConfig
    from handwritten_math_ocr_api_tpu.models.model import init_model
    from handwritten_math_ocr_api_tpu.train.checkpoint import (
        save_params_for_serving,
    )

    cfg = ModelConfig()
    params, _ = init_model(jax.random.PRNGKey(0), cfg)
    params["decoder"]["fc_out"]["b"] = (
        params["decoder"]["fc_out"]["b"].at[EOS_ID].set(jnp.float32(-1e9)))
    vocab = {"<pad>": 0, "<sos>": 1, "<eos>": 2, "<unk>": 3}
    for i in range(4, cfg.vocab_size):
        vocab[f"t{i}"] = i
    save_params_for_serving(path, params, vocab, cfg)
    return path


async def run(args) -> dict:
    import dataclasses

    from aiohttp.test_utils import TestClient, TestServer

    from handwritten_math_ocr_api_tpu.core.config import ServeConfig
    from handwritten_math_ocr_api_tpu.serve.app import create_app

    overrides = dict(
        model_dir=args.model_dir, batching_mode=args.mode,
        rate_limit_per_minute=10 ** 9, rate_limit_per_hour=10 ** 9,
        rate_limit_per_day=10 ** 9, rate_limit_anonymous_daily=10 ** 9,
        max_concurrent_requests=10 ** 6)
    if args.use_fused:
        overrides["use_fused_decode"] = True
    if args.slots:
        overrides["num_slots"] = args.slots
    if args.pipeline_depth:
        overrides["pipeline_depth"] = args.pipeline_depth
    if args.harvest_threads:
        overrides["harvest_threads"] = args.harvest_threads
    if args.cpu_mesh:
        overrides["mesh_data_axis"] = args.cpu_mesh
    cfg = dataclasses.replace(ServeConfig.from_env(), **overrides)
    app = create_app(cfg)
    client = TestClient(TestServer(app))
    await client.start_server()
    try:
        payload = {"image_data": _png_b64()}
        r = await client.post("/predict", json=payload)  # warm + compile
        assert r.status == 200, await r.text()
        # steady-state stats only: zero counters/timers after the warm
        # request so /metrics attribution excludes startup admits
        st = app["state"]
        if st.batcher is not None and hasattr(st.batcher, "decoder"):
            st.batcher.decoder.reset_stats()
            st.batcher.t_step = st.batcher.t_other = 0.0
            st.batcher.worker_iters = 0

        latencies = []
        t0 = time.perf_counter()

        async def worker(n):
            for _ in range(n):
                s = time.perf_counter()
                resp = await client.post("/predict", json=payload)
                assert resp.status == 200
                await resp.json()
                latencies.append(time.perf_counter() - s)

        per_client = max(args.requests // args.clients, 1)
        await asyncio.gather(*[worker(per_client)
                               for _ in range(args.clients)])
        wall = time.perf_counter() - t0
        lat = np.asarray(sorted(latencies))
        out = {
            "metric": f"http_loadtest_{args.mode}",
            "clients": args.clients,
            "requests": len(latencies),
            "throughput_rps": round(len(latencies) / wall, 2),
            "p50_ms": round(float(lat[len(lat) // 2]) * 1e3, 2),
            "p95_ms": round(float(lat[int(len(lat) * 0.95)]) * 1e3, 2),
            "unit": "requests/sec",
            "use_fused": cfg.use_fused_decode,
            "num_slots": cfg.num_slots,
            "pipeline_depth": cfg.pipeline_depth,
        }
        m = await (await client.get("/metrics")).json()
        bat = m.get("batching") or {}
        for k, v in bat.items():
            if isinstance(v, (int, float, str)) or v is None:
                out[f"batching_{k}"] = v
        return out
    finally:
        await client.close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default="trained-model")
    ap.add_argument("--tiny", action="store_true",
                    help="serve a tiny random-weight model (no artifact "
                         "needed; CPU-friendly)")
    ap.add_argument("--worst", action="store_true",
                    help="serve a flagship-architecture random model with "
                         "<eos> suppressed: worst-case 150-step decodes")
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--mode", default="dynamic",
                    choices=["dynamic", "continuous"])
    ap.add_argument("--use-fused", action="store_true",
                    help="whole-step ragged Pallas megakernel segments")
    ap.add_argument("--slots", type=int, default=0,
                    help="continuous-mode slot pool size (0 = config)")
    ap.add_argument("--pipeline-depth", type=int, default=0,
                    help="continuous-mode in-flight segments (0 = config)")
    ap.add_argument("--harvest-threads", type=int, default=0,
                    help="continuous-mode report-fetch threads (0 = "
                         "config default: one per pipeline slot)")
    ap.add_argument("--cpu-mesh", type=int, default=0, metavar="N",
                    help="run on an N-device virtual CPU mesh "
                         "(SERVING_MESH_DATA=N): validates the multi-chip "
                         "continuous serving path over HTTP without N real "
                         "chips; throughput is CPU-bound, not indicative")
    args = ap.parse_args()
    if args.cpu_mesh:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_mesh}"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.tiny:
        import tempfile

        args.model_dir = _make_tiny_artifact(
            os.path.join(tempfile.mkdtemp(), "trained-model"))
    elif args.worst:
        import tempfile

        args.model_dir = _make_worstcase_artifact(
            os.path.join(tempfile.mkdtemp(), "trained-model"))
    print(json.dumps(asyncio.run(run(args))))


if __name__ == "__main__":
    main()
