"""A/B: tile-pad the Swin stage-1 sub-tile contractions (VERDICT r3 #4).

Stage-1 of swin_t runs at C=96 with 3 heads of 32 — every matmul
contracts K=96 against the MXU's 128-wide tiles, and the per-head
attention works on 32-lane blocks. Hypothesis (BENCHMARKS.md "Encoder
roofline"): physically zero-padding the stage to the tile (C 96->128,
head_dim 32->128 per head, outputs padded consistently; LayerNorm
mean/var corrected to the real 96 lanes so numerics are UNCHANGED) lets
XLA schedule full tiles and wins >15% encoder time.

Arms (full 4-stage trunk, batch 32, bf16, device-chained fori_loop):
  A: swin_apply as shipped
  B: stage-1 blocks in padded-128 space (masked LN, per-head padded
     q/k/v, padded proj/MLP), sliced back to 96 before patch merging;
     stages 2-4 identical code.

Accept (>15% win) -> adopt in models/swin.py; else record the refutation.
Numerics: arm B output is asserted allclose to arm A first.

Usage: python benchmarks/ab_encoder_pad.py [--batch 32] [--iters 8]
Writes benchmarks/ab_encoder_pad_results.json.
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

HD_REAL = 32     # stage-1 head dim
HDP = 128        # padded head dim (one full lane tile)
C_REAL = 96      # stage-1 channels
CP = 128         # padded channels


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--chain", type=int, default=4,
                    help="trunk applications chained per timed call")
    ap.add_argument("--out", default="ab_encoder_pad_results.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from handwritten_math_ocr_api_tpu.core.config import ModelConfig
    from handwritten_math_ocr_api_tpu.models import layers, swin

    cfg = ModelConfig().swin
    nh = cfg.num_heads[0]
    ws = cfg.window_size
    key = jax.random.PRNGKey(0)
    params = swin.init_swin_params(key, cfg)

    B = args.batch
    x_img = (jax.random.normal(jax.random.PRNGKey(1), (B, 96, 320, 1))
             .astype(jnp.bfloat16))

    # ---- padded stage-1 parameter construction ---------------------------
    def pad_block(p):
        """Real stage-1 block params -> padded-space params."""
        a = p["attn"]
        w_qkv = np.asarray(a["w_qkv"], np.float32)   # (96, 288)
        b_qkv = np.asarray(a["b_qkv"], np.float32)   # (288,)
        wq, wk, wv = np.split(w_qkv, 3, axis=1)      # each (96, 96)
        bq, bk, bv = np.split(b_qkv, 3)

        def pad_proj(w, b):
            # (96, 96) head-major columns -> (128, nh*128): head h's real
            # 32 columns land at [h*128, h*128+32)
            wp = np.zeros((CP, nh * HDP), np.float32)
            bp = np.zeros((nh * HDP,), np.float32)
            for h in range(nh):
                wp[:C_REAL, h * HDP:h * HDP + HD_REAL] = (
                    w[:, h * HD_REAL:(h + 1) * HD_REAL])
                bp[h * HDP:h * HDP + HD_REAL] = (
                    b[h * HD_REAL:(h + 1) * HD_REAL])
            return wp, bp

        wqp, bqp = pad_proj(wq, bq)
        wkp, bkp = pad_proj(wk, bk)
        wvp, bvp = pad_proj(wv, bv)
        w_qkv_p = np.concatenate([wqp, wkp, wvp], axis=1)
        b_qkv_p = np.concatenate([bqp, bkp, bvp])

        w_out = np.asarray(a["w_out"], np.float32)   # (96, 96)
        w_out_p = np.zeros((nh * HDP, CP), np.float32)
        for h in range(nh):
            w_out_p[h * HDP:h * HDP + HD_REAL, :C_REAL] = (
                w_out[h * HD_REAL:(h + 1) * HD_REAL])
        b_out_p = np.zeros((CP,), np.float32)
        b_out_p[:C_REAL] = np.asarray(a["b_out"], np.float32)

        def pad_ln(ln):
            return {"scale": np.pad(np.asarray(ln["scale"], np.float32),
                                    (0, CP - C_REAL)),
                    "bias": np.pad(np.asarray(ln["bias"], np.float32),
                                   (0, CP - C_REAL))}

        hid = int(C_REAL * cfg.mlp_ratio)
        fc1w = np.zeros((CP, hid), np.float32)
        fc1w[:C_REAL] = np.asarray(p["mlp"]["fc1"]["w"], np.float32)
        fc2w = np.zeros((hid, CP), np.float32)
        fc2w[:, :C_REAL] = np.asarray(p["mlp"]["fc2"]["w"], np.float32)
        fc2b = np.zeros((CP,), np.float32)
        fc2b[:C_REAL] = np.asarray(p["mlp"]["fc2"]["b"], np.float32)

        return {
            "norm1": pad_ln(p["norm1"]),
            "norm2": pad_ln(p["norm2"]),
            "w_qkv": jnp.asarray(w_qkv_p), "b_qkv": jnp.asarray(b_qkv_p),
            "w_out": jnp.asarray(w_out_p), "b_out": jnp.asarray(b_out_p),
            "rel_bias_table": a["rel_bias_table"],
            "fc1w": jnp.asarray(fc1w),
            "fc1b": p["mlp"]["fc1"]["b"],
            "fc2w": jnp.asarray(fc2w), "fc2b": jnp.asarray(fc2b),
        }

    padded_blocks = [pad_block(b) for b in params["stages"][0]["blocks"]]

    def ln_masked(pp, x, eps: float = 1e-5):
        """LayerNorm over the REAL 96 lanes of a padded-128 tensor (pads
        are zero): full-width sums rescaled by 128/96 reproduce the real
        mean/var exactly; padded γ/β are zero so pads stay zero."""
        orig = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.sum(x32, axis=-1, keepdims=True) / C_REAL
        var = (jnp.sum(jnp.square(x32), axis=-1, keepdims=True) / C_REAL
               - jnp.square(mean))
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
        y = y * jnp.asarray(pp["scale"]) + jnp.asarray(pp["bias"])
        return y.astype(orig)

    def padded_window_attention(pp, x, shift):
        Bx, H, W, C = x.shape
        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        pad_h, pad_w = H + pad_b, W + pad_r
        shift_h = 0 if ws >= pad_h else shift
        shift_w = 0 if ws >= pad_w else shift
        if shift_h or shift_w:
            x = jnp.roll(x, shift=(-shift_h, -shift_w), axis=(1, 2))
        windows = swin.window_partition(x, ws)
        n_windows = (pad_h // ws) * (pad_w // ws)
        N = ws * ws

        rel_index = swin.relative_position_index(ws).reshape(-1)
        bias = pp["rel_bias_table"][rel_index]
        bias = bias.reshape(N, N, nh).transpose(2, 0, 1)
        smask = swin.shift_attention_mask(pad_h, pad_w, ws, shift_h,
                                         shift_w)
        mask = (bias[None] if smask is None
                else bias[None] + jnp.asarray(smask)[:, None])

        w = pp["w_qkv"].astype(windows.dtype)
        b = pp["b_qkv"].astype(windows.dtype)
        qkv = jnp.dot(windows, w, preferred_element_type=windows.dtype) + b
        q, k, v = jnp.split(qkv, 3, axis=-1)      # each (B*nW, N, nh*128)
        q = layers.split_heads(q, nh).reshape(Bx, n_windows, nh, N, HDP)
        k = layers.split_heads(k, nh).reshape(Bx, n_windows, nh, N, HDP)
        v = layers.split_heads(v, nh).reshape(Bx, n_windows, nh, N, HDP)
        # layers.attention scales by 1/sqrt(HDP); the real head dim is 32,
        # so pre-scale q by sqrt(HDP/HD_REAL)
        q = q * np.sqrt(HDP / HD_REAL).astype(np.float32)
        out = layers.attention(q, k, v, mask[None])
        out = layers.merge_heads(out).reshape(Bx * n_windows, N, nh * HDP)
        out = (jnp.dot(out, pp["w_out"].astype(out.dtype),
                       preferred_element_type=out.dtype)
               + pp["b_out"].astype(out.dtype))
        x = swin.window_unpartition(out, ws, Bx, pad_h, pad_w)
        if shift_h or shift_w:
            x = jnp.roll(x, shift=(shift_h, shift_w), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :H, :W, :]
        return x

    def padded_block_apply(pp, x, shift):
        h = padded_window_attention(pp, ln_masked(pp["norm1"], x), shift)
        x = x + h
        h2 = ln_masked(pp["norm2"], x)
        h2 = jax.nn.gelu(jnp.dot(h2, pp["fc1w"].astype(h2.dtype),
                                 preferred_element_type=h2.dtype)
                         + pp["fc1b"].astype(h2.dtype))
        h2 = (jnp.dot(h2, pp["fc2w"].astype(h2.dtype),
                      preferred_element_type=h2.dtype)
              + pp["fc2b"].astype(h2.dtype))
        return x + h2

    def trunk_a(images):
        return swin.swin_apply(params, images, cfg)

    def trunk_b(images):
        x = swin.patch_embed(params["patch_embed"], images)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, CP - C_REAL)))
        for d, pb in enumerate(padded_blocks):
            x = padded_block_apply(pb, x, 0 if d % 2 == 0 else ws // 2)
        x = x[..., :C_REAL]
        x = swin.patch_merging(params["merges"][0], x)
        for i in range(1, len(cfg.depths)):
            for d in range(cfg.depths[i]):
                x = swin.swin_block(
                    params["stages"][i]["blocks"][d], x, ws,
                    0 if d % 2 == 0 else ws // 2, cfg.num_heads[i],
                    cfg.mlp_ratio, deterministic=True)
            if i < len(cfg.depths) - 1:
                x = swin.patch_merging(params["merges"][i], x)
        Bx, H, W, C = x.shape
        return x.reshape(Bx, H * W, C)

    # numerics parity first
    ja, jb = jax.jit(trunk_a), jax.jit(trunk_b)
    out_a = np.asarray(ja(x_img), np.float32)
    out_b = np.asarray(jb(x_img), np.float32)
    scale = max(np.abs(out_a).max(), 1e-6)
    max_err = float(np.abs(out_a - out_b).max() / scale)
    print(f"numerics max rel err: {max_err:.3e}")
    assert max_err < 2e-2, "padded path diverged — not a fair A/B"

    def chained(fn):
        @jax.jit
        def run(images):
            def body(i, acc):
                out = fn(images + acc * 1e-12)
                return acc + out.astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, args.chain, body, jnp.float32(0))
        return run

    ca, cb = chained(trunk_a), chained(trunk_b)

    def timed(fn):
        jax.block_until_ready(fn(x_img))
        for _ in range(2):
            out = fn(x_img)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(x_img)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.iters / args.chain

    dt_a1 = timed(ca)
    dt_b = timed(cb)
    dt_a2 = timed(ca)   # A/B/A

    out = {
        "batch": B, "chain": args.chain, "iters": args.iters,
        "numerics_max_rel_err": max_err,
        "ms_trunk_A1": round(dt_a1 * 1e3, 3),
        "ms_trunk_B_padded": round(dt_b * 1e3, 3),
        "ms_trunk_A2": round(dt_a2 * 1e3, 3),
        "speedup_vs_meanA": round(
            ((dt_a1 + dt_a2) / 2) / dt_b, 4),
    }
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        args.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
