"""Attribute continuous-scheduler time per phase: where do the ~320 ms
per segment go? Times (a) raw chained decode_segment dispatches with one
terminal fetch, (b) insert cost, (c) a full run_all with per-phase
wall-clock instrumentation monkeypatched into the scheduler tick.

Usage: python benchmarks/probe_continuous_phases.py [--slots 64]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=64)
    ap.add_argument("--segments", type=int, default=20)
    ap.add_argument("--requests", type=int, default=192)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from handwritten_math_ocr_api_tpu.core.config import EOS_ID, ModelConfig
    from handwritten_math_ocr_api_tpu.core.tokenizer import Tokenizer
    from handwritten_math_ocr_api_tpu.decode import continuous as cont_mod
    from handwritten_math_ocr_api_tpu.decode.continuous import (
        ContinuousDecoder,
    )
    from handwritten_math_ocr_api_tpu.models.model import init_model

    cfg = ModelConfig()
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    params["decoder"]["fc_out"]["b"] = (
        params["decoder"]["fc_out"]["b"].at[EOS_ID].set(jnp.float32(-1e9)))
    vocab = {"<pad>": 0, "<sos>": 1, "<eos>": 2, "<unk>": 3}
    for i in range(4, cfg.vocab_size):
        vocab[f"t{i}"] = i
    tok = Tokenizer(vocab)
    rng = np.random.default_rng(0)
    images = [rng.standard_normal((cfg.img_h, cfg.img_w, 1)).astype(
        np.float32) for _ in range(args.requests)]

    res = {}

    # -- (a) raw chained segments, no harvest, one terminal fetch --------
    cont = ContinuousDecoder(params, state, cfg, tok,
                             num_slots=args.slots, segment_steps=16,
                             pipeline_depth=4)
    # fill the pool
    for img in images[:args.slots]:
        cont.submit(img)
    cont._admit()
    small, cache = cont._small, cont._cache
    fn = cont._segment_fn
    # warm/compile
    small, cache, rep = fn(cont.params, small, cache, jnp.int32(16))
    np.asarray(small.pos)
    t0 = time.perf_counter()
    for _ in range(args.segments):
        small, cache, rep = fn(cont.params, small, cache, jnp.int32(16))
    np.asarray(small.pos)  # one terminal fetch
    dt = time.perf_counter() - t0
    res["chained_segment_ms"] = round(1e3 * dt / args.segments, 2)

    # per-segment with a report fetch each time (still no copy_to_host)
    t0 = time.perf_counter()
    for _ in range(args.segments):
        small, cache, rep = fn(cont.params, small, cache, jnp.int32(16))
        np.asarray(rep)
    dt = time.perf_counter() - t0
    res["segment_plus_sync_fetch_ms"] = round(1e3 * dt / args.segments, 2)

    # per-segment with async copy + fetch 4 behind
    from collections import deque
    pend = deque()
    t0 = time.perf_counter()
    for _ in range(args.segments):
        small, cache, rep = fn(cont.params, small, cache, jnp.int32(16))
        rep.copy_to_host_async()
        pend.append(rep)
        if len(pend) > 4:
            np.asarray(pend.popleft())
    while pend:
        np.asarray(pend.popleft())
    dt = time.perf_counter() - t0
    res["segment_pipelined_fetch_ms"] = round(1e3 * dt / args.segments, 2)

    # -- (b) insert cost ---------------------------------------------------
    ins = cont._insert_fn(32)
    slot_arr = jnp.asarray(np.arange(32, dtype=np.int32))
    imgs32 = jnp.asarray(np.stack([images[i] for i in range(32)]))
    small2, cache2 = ins(cont.params, cont.model_state, small, cache,
                         slot_arr, imgs32)
    np.asarray(small2.pos)
    t0 = time.perf_counter()
    for _ in range(5):
        small2, cache2 = ins(cont.params, cont.model_state, small2, cache2,
                             slot_arr, imgs32)
    np.asarray(small2.pos)
    res["insert32_ms"] = round(1e3 * (time.perf_counter() - t0) / 5, 2)

    # -- (c) instrumented full run ----------------------------------------
    phase_t = {"admit": 0.0, "dispatch": 0.0, "copy_start": 0.0,
               "forced_harvest": 0.0, "opportunistic": 0.0}

    class Timed(ContinuousDecoder):
        def step_once(self):
            t0 = time.perf_counter()
            self._admit()
            t1 = time.perf_counter()
            phase_t["admit"] += t1 - t0
            if self._slot_req:
                n = self._pick_segment_len()
                self._small, self._cache, rep = self._segment_fn(
                    self.params, self._small, self._cache, jnp.int32(n))
                self._seg_counter += 1
                t2 = time.perf_counter()
                phase_t["dispatch"] += t2 - t1
                self._start_report_copy(rep)
                t3 = time.perf_counter()
                phase_t["copy_start"] += t3 - t2
                self._in_flight.append(
                    cont_mod._InFlight(self._seg_counter, rep, n))
                self.segments_run += 1
                self.steps_scheduled += n
                self.occupancy_sum += (
                    n * len(self._slot_req) / self.num_slots)
            results = {}
            t4 = time.perf_counter()
            while self._in_flight and (
                    len(self._in_flight) > self.pipeline_depth
                    or not self._slot_req):
                self.harvest_blocks += 1
                results.update(self._harvest_one())
            t5 = time.perf_counter()
            phase_t["forced_harvest"] += t5 - t4
            while self._in_flight and self._report_ready(
                    self._in_flight[0]):
                results.update(self._harvest_one())
            phase_t["opportunistic"] += time.perf_counter() - t5
            return results

    cont2 = Timed(params, state, cfg, tok, num_slots=args.slots,
                  segment_steps=16, pipeline_depth=8)
    t0 = time.perf_counter()
    cont2.run_all(images)
    dt = time.perf_counter() - t0
    res["run_all_s"] = round(dt, 2)
    res["run_img_per_s"] = round(args.requests / dt, 2)
    res["segments"] = cont2.segments_run
    for k, v in phase_t.items():
        res[f"phase_{k}_s"] = round(v, 2)
    res["stats"] = {k: (round(v, 3) if isinstance(v, float) else v)
                    for k, v in cont2.stats.items() if k != "mesh"}

    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
