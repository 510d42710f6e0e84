"""Reproduce + bisect NaN confidences on the fused continuous path.

Round-3 on-chip runs of BASELINE config 5 and the HTTP loadtest both hit
~5% of requests with confidence = NaN (PredictionResponse rejects them).
The tiny-config interpret-mode parity tests pass, so this drives the
ENGINE at flagship scale (63 slots, 16-step segments, pipeline depth 4,
worst-case 150-step decodes) and reports, per failing request: lp_sum,
count, first bad token — with flags to bisect the responsible feature
(bucketed chunks, pipeline depth, adaptive lengthening, quantize).

Usage: python benchmarks/repro_nan_confidence.py [--slots 63]
         [--depth 4] [--segment 16] [--requests 128] [--xla]
         [--no-buckets] [--no-adaptive] [--trained-dir DIR]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=63)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--segment", type=int, default=16)
    ap.add_argument("--requests", type=int, default=128)
    ap.add_argument("--xla", action="store_true", help="use_fused=False")
    ap.add_argument("--no-buckets", action="store_true",
                    help="disable bucketed chunk dispatch")
    ap.add_argument("--no-adaptive", action="store_true",
                    help="max_segment_steps == segment_steps")
    ap.add_argument("--quantize", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config on CPU (interpret-mode kernel): "
                         "same slot/bucket dynamics, minutes not hours")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny-dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--trace", action="store_true",
                    help="pull device state after every tick; report the "
                         "first non-finite lp_sum at birth (slow)")
    ap.add_argument("--serving-engine", action="store_true",
                    help="drive through ContinuousServingEngine (dedicated "
                         "scheduler thread, concurrent clients) without HTTP")
    ap.add_argument("--clients", type=int, default=64)
    ap.add_argument("--trained-dir", default=None,
                    help="serving artifact dir; default = random weights "
                         "with unreachable <eos> (worst-case 150 steps)")
    args = ap.parse_args()

    import jax

    if args.cpu or args.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from handwritten_math_ocr_api_tpu.core.config import EOS_ID, ModelConfig
    from handwritten_math_ocr_api_tpu.core.tokenizer import Tokenizer
    from handwritten_math_ocr_api_tpu.decode.continuous import (
        ContinuousDecoder,
    )

    if args.trained_dir:
        from handwritten_math_ocr_api_tpu.train.checkpoint import (
            load_params_for_serving,
        )
        params, mstate, vocab, idx2char, cfg = load_params_for_serving(
            args.trained_dir)
        tok = Tokenizer(vocab, idx2char)
    else:
        from handwritten_math_ocr_api_tpu.models.model import init_model

        if args.tiny:
            from handwritten_math_ocr_api_tpu.core.config import SwinConfig

            cfg = ModelConfig(
                d_model=32, nhead=4, dim_feedforward=64, dropout=0.0,
                num_decoder_layers=2, max_seq_len=12, vocab_size=20,
                dtype=args.tiny_dtype,
                swin=SwinConfig(embed_dim=8, depths=(1, 1),
                                num_heads=(2, 2), window_size=4,
                                stochastic_depth=0.0))
        else:
            cfg = ModelConfig()
        params, mstate = init_model(jax.random.PRNGKey(0), cfg)
        b = params["decoder"]["fc_out"]["b"]
        params["decoder"]["fc_out"]["b"] = b.at[EOS_ID].set(
            jnp.float32(-1e9))
        vocab = {"<pad>": 0, "<sos>": 1, "<eos>": 2, "<unk>": 3}
        for i in range(4, cfg.vocab_size):
            vocab[f"t{i}"] = i
        tok = Tokenizer(vocab)

    kw = {}
    if args.no_adaptive:
        kw["max_segment_steps"] = args.segment
    cont = ContinuousDecoder(
        params, mstate, cfg, tok, num_slots=args.slots,
        segment_steps=args.segment, pipeline_depth=args.depth,
        use_fused=not args.xla, quantize=args.quantize, **kw)
    if args.no_buckets:
        cont._seg_buckets = None

    rng = np.random.default_rng(0)
    images = [rng.standard_normal((96, 320, 1)).astype(np.float32)
              for _ in range(args.requests)]

    if args.serving_engine:
        # serving-faithful drive: ContinuousServingEngine's dedicated
        # scheduler thread + N concurrent sequential clients (staggered
        # arrivals -> bucket-1 refills + adaptive long segments), minus
        # the HTTP layer — bisects engine threading/timing from aiohttp
        import asyncio

        from handwritten_math_ocr_api_tpu.serve.batcher import (
            ContinuousServingEngine,
        )

        eng = ContinuousServingEngine(cont)

        async def _run():
            await eng.start()
            cont.warmup(image_shape=(96, 320))
            clients = args.clients
            per = max(args.requests // clients, 1)
            out = [None] * (per * clients)

            async def worker(wid):
                for j in range(per):
                    out[wid * per + j] = await eng.predict(
                        images[(wid * per + j) % len(images)])

            await asyncio.gather(*[worker(w) for w in range(clients)])
            await eng.stop()
            return out

        got = asyncio.run(_run())
    elif args.trace:
        # step-wise: drive the engine manually, after each tick pull the
        # full small-state and report the first non-finite lp_sum among
        # LIVE-or-finished real slots (catches NaN at birth)
        ids = [cont.submit(img) for img in images]
        results = {}
        tick = 0
        while not cont.idle:
            results.update(cont.step_once())
            tick += 1
            s = jax.tree.map(np.asarray, cont._small)
            lp = s.lp_sum[:args.slots]
            bad_rows = np.where(~np.isfinite(lp) & s.active[:args.slots])[0]
            if bad_rows.size:
                print(f"tick {tick}: non-finite lp_sum rows {bad_rows}")
                for r in bad_rows[:4]:
                    print(f"  row {r}: pos={s.pos[r]} count={s.count[r]} "
                          f"fin={s.finished[r]} lp={lp[r]!r} "
                          f"prev={s.prev[r]} "
                          f"tokens[:12]={s.tokens[r][:12]}")
                break
        got = [results.get(i, ("<missing>", -1.0)) for i in ids]
    else:
        got = cont.run_all(images)

    bad = [(i, lx[:40], c) for i, (lx, c) in enumerate(got)
           if not math.isfinite(c) or not (0.0 <= c <= 1.0)]
    print(f"requests={len(got)} bad_confidence={len(bad)} "
          f"slots={args.slots} depth={args.depth} seg={args.segment} "
          f"fused={not args.xla} buckets={not args.no_buckets} "
          f"adaptive={not args.no_adaptive} quantize={args.quantize}")
    for i, lx, c in bad[:20]:
        print(f"  req {i}: conf={c!r} latex[:40]={lx!r}")
    finite = [c for _, c in got if math.isfinite(c)]
    if finite:
        print(f"finite conf: min={min(finite):.4g} max={max(finite):.4g}")
    print("FAIL" if bad else "OK")


if __name__ == "__main__":
    main()
