"""A/B: per-row cache append formulations for the ragged segment loop.

probe_ragged_split.py attributes 0.49 of the 1.09 ms ragged step to the
two fresh-row cache appends — a double-vmapped dynamic_update_slice at
per-row positions, which XLA lowers as a full-cache rewrite (~168 MB
read + 168 MB write per step at 64 MHA slots). Candidates:

  dus      double-vmapped dynamic_update_slice (shipped)
  scatter  sk.at[:, arange(B), pos].set(rows) — one explicit scatter
           with unique indices; XLA TPU can apply it in place on the
           donated while-loop carry
  dge      dynamic_update_slice with a (L,B,1,kvd) update via a single
           vmap over rows only (fewer vmap layers, same semantics)

Usage: python benchmarks/probe_append_variants.py [--slots 64]
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
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from handwritten_math_ocr_api_tpu.core.config import ModelConfig

    cfg = ModelConfig(vocab_size=600)
    B, T = args.slots, cfg.max_seq_len
    L, kvd = cfg.num_decoder_layers, cfg.kv_dim
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    sk = (jax.random.normal(ks[0], (L, B, T, kvd)) * 0.3).astype(jnp.bfloat16)
    sv = (jax.random.normal(ks[1], (L, B, T, kvd)) * 0.3).astype(jnp.bfloat16)
    rows = (jax.random.normal(ks[2], (L, B, kvd)) * 0.3).astype(jnp.bfloat16)
    pos = jax.random.randint(ks[3], (B,), 0, T - args.steps - 1).astype(
        jnp.int32)
    S = args.steps

    def row_append(c, r, p):
        return jax.lax.dynamic_update_slice(c, r[None], (p, 0))

    dus = jax.vmap(jax.vmap(row_append, in_axes=(0, 0, 0)),
                   in_axes=(0, 0, None))

    iota_b = jnp.arange(B)

    def scatter(c, r, p):
        return c.at[:, iota_b, p].set(r, unique_indices=True,
                                      indices_are_sorted=False)

    variants = {
        "dus": dus,
        "scatter": scatter,
    }

    def timed(fn):
        @jax.jit
        def chain(sk, sv, pos):
            def body(i, c):
                sk, sv, ps = c
                sk = fn(sk, rows, ps)
                sv = fn(sv, rows, ps)
                return (sk, sv, ps + 1)
            sk, sv, _ = jax.lax.fori_loop(0, S, body, (sk, sv, pos))
            return sk[0, 0, 0, 0].astype(jnp.float32) + \
                sv[0, 0, 0, 0].astype(jnp.float32)

        out = chain(sk, sv, pos)
        jax.block_until_ready(out)
        for _ in range(3):
            out = chain(sk, sv, pos)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = chain(sk, sv, pos)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.iters / S

    res = {}
    for name, fn in variants.items():
        res[name] = round(timed(fn) * 1e3, 3)
        print(name, res[name], "ms/step", flush=True)
    # numerics: variants agree
    a = dus(sk, rows, pos)
    b = scatter(sk, rows, pos)
    assert bool(jnp.all(a == b)), "append variants disagree"
    res["equal"] = True
    print(json.dumps(res))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "probe_append_variants_results.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
