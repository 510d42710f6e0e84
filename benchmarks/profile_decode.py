"""Split decode latency into device time vs dispatch overhead (VERDICT r1
item 5): the single-request story must be evidenced, not asserted.

Three measurements on the flagship model (full worst-case 150-step decode):

1. *isolated* — one decode dispatch, host-blocked each call: what a single
   HTTP request pays end-to-end through this environment's tunnel.
2. *pipelined* — N async dispatches, one terminal fetch: amortizes host/
   tunnel round-trips (the serving batcher's regime).
3. *on-device chain* — M decodes chained inside ONE jit (lax.fori_loop),
   so host dispatch is paid once for all M: elapsed/M is a pure
   device-time bound for a full decode, independent of tunnel RTT.

If a jax.profiler trace can be parsed (tensorflow's xplane proto), the
device-plane busy time per decode is also reported as a cross-check.

Writes benchmarks/profile_results.json and prints one JSON line per batch
size. Run serialized (no concurrent TPU work).
"""

from __future__ import annotations

import glob
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(HERE))


def _decode_fn(cfg, state):
    import jax

    from handwritten_math_ocr_api_tpu.decode.greedy import greedy_decode
    from handwritten_math_ocr_api_tpu.models import model as model_mod

    def decode_raw(params, images):
        memory, _ = model_mod.encode(params, state, cfg, images)
        return greedy_decode(params["decoder"], cfg, memory,
                             cfg.max_seq_len, eos_id=cfg.vocab_size + 1)

    return jax.jit(decode_raw), decode_raw


def measure(batch: int, iso_iters: int = 10, pipe_iters: int = 20,
            chain_m: int = 10):
    import jax
    import jax.numpy as jnp

    from handwritten_math_ocr_api_tpu.core.config import ModelConfig
    from handwritten_math_ocr_api_tpu.models.model import init_model

    cfg = ModelConfig()
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal(
        (batch, cfg.img_h, cfg.img_w, 1)).astype(np.float32))
    decode, decode_raw = _decode_fn(cfg, state)

    # -- on-device chain: M full decodes per dispatch --------------------
    @jax.jit
    def chained(params, images):
        def body(i, acc):
            # acc feeds the input so iterations can't be elided/reordered
            res = decode_raw(params, images + 0.0 * acc)
            return acc + res.logprob_sum.sum()

        return jax.lax.fori_loop(0, chain_m, body, jnp.float32(0.0))

    # warmup all three programs
    r = decode(params, images)
    float(np.asarray(r.logprob_sum.sum()))
    float(np.asarray(chained(params, images)))

    # isolated: block on every call (per-request latency incl. RTT)
    t0 = time.perf_counter()
    for _ in range(iso_iters):
        r = decode(params, images)
        float(np.asarray(r.logprob_sum.sum()))  # host fetch = real block
    iso_ms = (time.perf_counter() - t0) / iso_iters * 1e3

    # pipelined: async dispatches, one terminal fetch
    total = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(pipe_iters):
        r = decode(params, images)
        total = total + r.logprob_sum.sum()
    assert np.isfinite(float(total))
    pipe_ms = (time.perf_counter() - t0) / pipe_iters * 1e3

    # on-device chain: one dispatch, M decodes
    t0 = time.perf_counter()
    assert np.isfinite(float(np.asarray(chained(params, images))))
    chain_ms = (time.perf_counter() - t0) / chain_m * 1e3

    return {
        "batch": batch,
        "isolated_ms": round(iso_ms, 2),
        "pipelined_ms": round(pipe_ms, 2),
        "device_chain_ms": round(chain_ms, 2),
        "dispatch_overhead_ms": round(iso_ms - chain_ms, 2),
        "per_step_device_us": round(chain_ms * 1e3 / 150, 1),
    }


def try_trace(batch: int, out_dir: str):
    """Capture a profiler trace of a few decodes; return device busy ms per
    decode if the xplane can be parsed, else None."""
    import jax
    import jax.numpy as jnp

    from handwritten_math_ocr_api_tpu.core.config import ModelConfig
    from handwritten_math_ocr_api_tpu.models.model import init_model

    cfg = ModelConfig()
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal(
        (batch, cfg.img_h, cfg.img_w, 1)).astype(np.float32))
    decode, _ = _decode_fn(cfg, state)
    r = decode(params, images)
    float(np.asarray(r.logprob_sum.sum()))

    n = 5
    with jax.profiler.trace(out_dir):
        total = jnp.float32(0.0)
        for _ in range(n):
            r = decode(params, images)
            total = total + r.logprob_sum.sum()
        float(np.asarray(total))

    try:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    except Exception:
        return None
    paths = glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        return None
    space = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        space.ParseFromString(f.read())
    best = 0.0
    top_ops = None
    for plane in space.planes:
        name = plane.name.lower()
        if "tpu" not in name and "device" not in name:
            continue
        busy_ps = 0
        by_op = {}
        n_events = 0
        for line in plane.lines:
            for ev in line.events:
                busy_ps += ev.duration_ps
                n_events += 1
                meta = plane.event_metadata.get(ev.metadata_id)
                key = meta.name if meta is not None else "?"
                by_op[key] = by_op.get(key, 0) + ev.duration_ps
        ms = busy_ps / 1e9 / n
        if ms > best:
            best = ms
            top_ops = {
                "events_per_decode": n_events // max(n, 1),
                "top": [
                    {"op": k, "ms_per_decode": round(v / 1e9 / n, 3)}
                    for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])
                    [:15]
                ],
            }
    if not best:
        return None
    return {"device_busy_ms": round(best, 2), **(top_ops or {})}


def main():
    results = []
    for batch in (1, 10):
        res = measure(batch)
        res["trace"] = try_trace(batch, f"/tmp/mathocr_trace_b{batch}")
        results.append(res)
        print(json.dumps(res), flush=True)
    with open(os.path.join(HERE, "profile_results.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
