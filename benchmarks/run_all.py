"""Benchmark suite: the five BASELINE.json configs.

Run: ``python benchmarks/run_all.py [--quick]`` — prints one JSON line per
config and writes ``benchmarks/results.json``. The headline driver bench
(bench.py) is config 3; this suite adds the rest:

1. single-image greedy decode latency (reference: ~350 ms CPU / predict.py)
2. res18trans-variant single-image decode (conv encoder path)
3. batch-10 padded greedy decode with KV cache (same as bench.py)
4. beam-5 eval-harness throughput over a synthetic test split
5. continuous batching, 64 concurrent requests on the slot engine

Methodology matches bench.py: compile+warm first, then N pipelined
dispatches with one terminal block_until_ready; random weights with an
unreachable <eos> so every decode pays the worst-case 150 steps (configs
1-3; configs 4-5 use the real decode surfaces end-to-end).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

CPU_BASELINE_SINGLE_MS = 350.0           # README.md:87
CPU_BASELINE_BATCH10_IMGS = 1000.0 / 350.0


def _model(encoder="swin_t"):
    import jax

    from handwritten_math_ocr_api_tpu.core.config import ModelConfig
    from handwritten_math_ocr_api_tpu.models.model import init_model

    cfg = ModelConfig(encoder=encoder)
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    return cfg, params, state


def _decode_fn(cfg, params, state, use_real_eos=False):
    """Greedy decode on the production fast path (fused megakernel v2,
    the SERVING_USE_FUSED=1 path). Set MATHOCR_BENCH_XLA=1 for the plain
    XLA schedule instead."""
    import jax

    from handwritten_math_ocr_api_tpu.decode.greedy import greedy_decode
    from handwritten_math_ocr_api_tpu.models import model as model_mod

    eos = 2 if use_real_eos else cfg.vocab_size + 1
    use_xla = os.environ.get("MATHOCR_BENCH_XLA", "0") == "1"
    if not use_xla:
        from handwritten_math_ocr_api_tpu.decode.fused import (
            greedy_decode_fused,
        )
        from handwritten_math_ocr_api_tpu.ops.fused_step import build_stacked

        stacked = build_stacked(params["decoder"], cfg)

    @jax.jit
    def decode(params, images):
        memory, _ = model_mod.encode(params, state, cfg, images)
        if use_xla:
            return greedy_decode(params["decoder"], cfg, memory,
                                 cfg.max_seq_len, eos_id=eos)
        return greedy_decode_fused(params["decoder"], stacked, cfg, memory,
                                   cfg.max_seq_len, eos_id=eos,
                                   interpret=False)

    return decode


def _time_pipelined(fn, *args, iters=20):
    """Elision-proof: every iteration's result feeds an accumulator that is
    fetched once — async runtimes must execute every decode; the host
    round-trip is amortized over all iterations."""
    import jax
    import jax.numpy as jnp

    r = fn(*args)
    # host fetch, not just block_until_ready: through the axon tunnel the
    # latter can return before real execution, which would push cold-start
    # cost into the timed region
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    # untimed pre-roll (bench.py methodology): the first post-compile
    # stretch through the tunnel runs 4-5x slower than steady state
    # (program upload / QoS ramp) and would contaminate the window
    total = jnp.float32(0.0)
    for _ in range(8):
        total = total + fn(*args).logprob_sum.sum()
    assert np.isfinite(float(total))
    total = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
        total = total + r.logprob_sum.sum()
    assert np.isfinite(float(total))
    return (time.perf_counter() - t0) / iters


def bench_single_image(encoder: str, iters: int):
    cfg, params, state = _model(encoder)
    decode = _decode_fn(cfg, params, state)
    rng = np.random.default_rng(0)
    # pre-staged on device (bench.py methodology): the tunnel's host->device
    # bandwidth would otherwise dominate the measurement; production serving
    # overlaps upload with decode via the batcher
    import jax.numpy as jnp

    img = jnp.asarray(rng.standard_normal((1, cfg.img_h, cfg.img_w, 1)),
                      jnp.float32)
    dt = _time_pipelined(decode, params, img, iters=iters)
    return {
        "metric": f"single_image_greedy_latency_{encoder}",
        "value": round(dt * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(CPU_BASELINE_SINGLE_MS / (dt * 1e3), 2),
    }


def bench_batch10(iters: int):
    cfg, params, state = _model()
    decode = _decode_fn(cfg, params, state)
    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    imgs = jnp.asarray(rng.standard_normal((10, cfg.img_h, cfg.img_w, 1)),
                       jnp.float32)
    dt = _time_pipelined(decode, params, imgs, iters=iters)
    ips = 10 / dt
    return {
        "metric": "batch10_greedy_decode_throughput",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / CPU_BASELINE_BATCH10_IMGS, 2),
    }


def bench_beam_eval(iters: int):
    """Beam-5 through the full eval surface (DecodeEngine.predict_batch)."""
    import jax

    from handwritten_math_ocr_api_tpu.core.config import DecodeConfig
    from handwritten_math_ocr_api_tpu.core.tokenizer import Tokenizer
    from handwritten_math_ocr_api_tpu.decode.api import DecodeEngine

    cfg, params, state = _model()
    vocab = {"<pad>": 0, "<sos>": 1, "<eos>": 2, "<unk>": 3}
    for i in range(4, cfg.vocab_size):
        vocab[f"t{i}"] = i
    # use_fused: beam rides the ragged megakernel (decode/fused.py::
    # beam_decode_fused) — the production fast path since round 3
    eng = DecodeEngine(params, state, cfg, DecodeConfig(batch_buckets=(64,)),
                       Tokenizer(vocab), use_fused=True)
    rng = np.random.default_rng(0)
    imgs = np.asarray(rng.standard_normal((64, cfg.img_h, cfg.img_w, 1)),
                      np.float32)
    eng.predict_batch(imgs, beam_size=5)  # compile
    t0 = time.perf_counter()
    n = max(iters // 4, 2)
    for _ in range(n):
        eng.predict_batch(imgs, beam_size=5)
    dt = (time.perf_counter() - t0) / n
    ips = 64 / dt
    return {
        "metric": "beam5_batch64_eval_throughput",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / CPU_BASELINE_BATCH10_IMGS, 2),
        "use_fused": True,
    }


def _make_worstcase_artifact(path: str):
    """Full-size flagship model, random weights, with the <eos> logit
    forced unreachable so EVERY decode pays the worst-case 150 steps
    (same honesty rule as configs 1-3, but through the real serving
    stack where eos can't be overridden per-call)."""
    import jax
    import jax.numpy as jnp

    from handwritten_math_ocr_api_tpu.core.config import EOS_ID, ModelConfig
    from handwritten_math_ocr_api_tpu.models.model import init_model
    from handwritten_math_ocr_api_tpu.train.checkpoint import (
        save_params_for_serving,
    )

    cfg = ModelConfig()
    params, _ = init_model(jax.random.PRNGKey(0), cfg)
    b = params["decoder"]["fc_out"]["b"]
    params["decoder"]["fc_out"]["b"] = b.at[EOS_ID].set(
        jnp.float32(-1e9))
    vocab = {"<pad>": 0, "<sos>": 1, "<eos>": 2, "<unk>": 3}
    for i in range(4, cfg.vocab_size):
        vocab[f"t{i}"] = i
    save_params_for_serving(path, params, vocab, cfg)
    return path


def bench_continuous(iters: int, clients: int = 64, num_slots: int = 63,
                     requests: int = 256, mesh_data: int = 1,
                     use_fused: bool = True):
    """BASELINE config 5: 64 concurrent HTTP clients against the live
    serving app in continuous-batching mode — the full middleware +
    batcher + pipelined slot-engine stack, worst-case 150-step decodes.

    ``num_slots`` < ``clients`` keeps the admission queue non-empty so
    freed slots refill immediately (occupancy target >= 0.9); with the
    round-3 pipelined scheduler the tunnel RTT is overlapped with device
    compute instead of serializing every 16-step segment."""
    import asyncio
    import tempfile

    async def _run() -> dict:
        import base64
        import dataclasses
        import io

        from aiohttp.test_utils import TestClient, TestServer
        from PIL import Image

        from handwritten_math_ocr_api_tpu.core.config import ServeConfig
        from handwritten_math_ocr_api_tpu.serve.app import create_app

        with tempfile.TemporaryDirectory() as td:
            _make_worstcase_artifact(td)
            cfg = dataclasses.replace(
                ServeConfig.from_env(), model_dir=td,
                batching_mode="continuous", num_slots=num_slots,
                segment_steps=16, use_fused_decode=use_fused,
                rate_limit_per_minute=10 ** 9,
                rate_limit_per_hour=10 ** 9, rate_limit_per_day=10 ** 9,
                rate_limit_anonymous_daily=10 ** 9,
                max_concurrent_requests=10 ** 6,
                mesh_data_axis=mesh_data)
            app = create_app(cfg)
            client = TestClient(TestServer(app))
            await client.start_server()
            try:
                rng = np.random.default_rng(0)
                img = Image.fromarray(
                    rng.integers(0, 255, (96, 320), np.uint8), "L")
                buf = io.BytesIO()
                img.save(buf, "PNG")
                payload = {
                    "image_data": base64.b64encode(buf.getvalue()).decode()}

                async def worker(n, wid=0):
                    # distinct User-Agent per client: 64 *different*
                    # clients (the reference keys rate limits on
                    # md5(ip:user-agent); one shared identity would trip
                    # the anonymous daily cap, not measure throughput)
                    hdrs = {"User-Agent": f"loadtest-client-{wid}"}
                    for _ in range(n):
                        resp = await client.post("/predict", json=payload,
                                                 headers=hdrs)
                        assert resp.status == 200, await resp.text()
                        await resp.json()

                # warm: compile encode buckets + segment program
                await asyncio.gather(*[worker(1, w)
                                       for w in range(clients)])
                state = client.app["state"]
                dec = state.batcher.decoder
                dec.reset_stats()  # timed window only
                per_client = max(requests // clients, 1)
                t0 = time.perf_counter()
                await asyncio.gather(
                    *[worker(per_client, w) for w in range(clients)])
                dt = time.perf_counter() - t0
                stats = dict(dec.stats)
            finally:
                await client.close()
        total = per_client * clients
        return {"dt": dt, "total": total, "stats": stats}

    r = asyncio.run(_run())
    ips = r["total"] / r["dt"]
    return {
        "metric": "continuous_64concurrent_throughput",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / CPU_BASELINE_BATCH10_IMGS, 2),
        "avg_occupancy": round(r["stats"]["avg_occupancy"], 3),
        "work_occupancy": round(r["stats"]["work_occupancy"], 3),
        "transport": "http",
        "clients": clients,
        "num_slots": num_slots,
        "use_fused": use_fused,
        "requests": r["total"],
        "mesh_data": mesh_data,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="fewer iterations")
    ap.add_argument("--configs", default="1,2,3,4,5")
    args = ap.parse_args()
    iters = 5 if args.quick else 20
    wanted = set(args.configs.split(","))

    runners = {
        "1": lambda: bench_single_image("swin_t", iters),
        "2": lambda: bench_single_image("res18trans", iters),
        "3": lambda: bench_batch10(iters),
        "4": lambda: bench_beam_eval(iters),
        "5": lambda: bench_continuous(iters),
    }
    results = []
    for key in sorted(wanted):
        if key not in runners:
            continue
        try:
            res = runners[key]()
        except Exception as e:  # keep going; record the failure
            res = {"metric": f"config_{key}", "error": str(e)}
        results.append(res)
        print(json.dumps(res), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results.json")
    # partial runs (--configs subset) merge into the existing artifact by
    # metric name instead of dropping the configs that didn't run
    merged = {}
    if os.path.exists(out):
        try:
            with open(out) as f:
                merged = {r["metric"]: r for r in json.load(f)}
        except Exception:
            merged = {}
    for r in results:
        merged[r["metric"]] = r
    with open(out, "w") as f:
        json.dump(list(merged.values()), f, indent=2)


if __name__ == "__main__":
    main()
