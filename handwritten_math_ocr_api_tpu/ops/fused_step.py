"""Pallas TPU megakernel: one fused decoder-layer step, grid over layers.

The jnp decode step lowers to ~15 separate XLA fusions per layer x 8
layers; each pays HBM round-trips for intermediates and fixed scheduling
overhead. This kernel executes an ENTIRE decoder layer step — packed qkv
projection, KV-cache append, masked self-attention, output projection,
residual+LN, cross-attention, residual+LN, FFN, residual+LN — as one
program per layer, with the activations resident in a VMEM scratch carried
across the layer grid and the per-layer weights/caches streamed by Pallas's
pipelined block DMA. Only the final activations and the updated caches
touch HBM.

Head trick: attention per head needs reductions over each head's Dh=32
lane group. Instead of per-head loops (which force 32->128 lane padding),
a constant group matrix ``G (D, H)`` with ``G[d, h] = 1 iff d//Dh == h``
turns them into MXU matmuls over full 256-lane rows:
  logits (B, T, H) = ((q * scale) ⊙ k) @ G
  out    (B, T, D) = (softmax(logits) @ G^T) ⊙ v, summed over T.

Cache layout for this path: (L, B, T, D) with heads merged into lanes
(torch head-interleave order, so ``build_stacked`` consumes the standard
param tree unchanged). T is padded to a multiple of 16 (bf16 sublane
tile); the pos-mask covers padding slots.

Numerics match ``models/decoder.decoder_step`` (post-norm order, f32 LN,
log-softmax outside) — asserted by tests in interpret mode and on TPU.

**Status: PRODUCTION fast path — ~2x the XLA decode schedule on v5e**
(A/B/A, benchmarks/ab_fused.py; round 1's "17x slower" verdict was an
artifact of the contaminated measurement era). Three variants:
- v2 (default): compute-only — caches are read-only inputs, the fresh K/V
  row is merged in VMEM for attention and emitted as a (L, B, D) output;
  the HBM append is two 40 KB ``dynamic_update_slice`` calls outside.
  10.7-10.9 ms per worst-case batch-10 decode vs XLA's 20.5-21.5.
- v2 quantized ("v2q", via :func:`quantize_stacked`): int8 weights
  dequantized on the matmul output in-kernel. Measured at parity with v2
  (the kernel is latency-bound, not weight-bandwidth-bound at this size);
  use for the 2x weight-memory saving, not speed.
- v1: round-1 aliased full-cache write-back — 12% slower than v2, kept
  for A/B.
Enable in serving with ``SERVING_USE_FUSED=1`` / ``DecodeEngine(
use_fused=True)``. On trained weights decode output agrees with the XLA
path (64/64 sampled decodes); on random weights bf16 argmax ties can flip
rare tokens (97.3% token match).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import ModelConfig


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def build_stacked(decoder_params, cfg: ModelConfig) -> Dict[str, jax.Array]:
    """Stack per-layer decoder weights into (L, ...) arrays (bf16 weights,
    f32 norms/biases) for the layer-grid kernel. MQA/GQA configs
    (nhead_kv < nhead) are supported by the v2 kernel — the packed qkv
    width and cache lane width follow the weights."""
    layers = decoder_params["layers"]
    wdt = jnp.dtype(cfg.dtype)

    def stack(path, dtype):
        def get(lp):
            node = lp
            for key in path:
                node = node[key]
            return node

        return jnp.stack([jnp.asarray(get(lp), dtype) for lp in layers])

    return {
        "w_qkv": stack(("self_attn", "w_qkv"), wdt),      # (L, D, 3D)
        "b_qkv": stack(("self_attn", "b_qkv"), jnp.float32)[:, None, :],
        "w_out": stack(("self_attn", "w_out"), wdt),
        "b_out": stack(("self_attn", "b_out"), jnp.float32)[:, None, :],
        "w_cq": stack(("cross_attn", "w_qkv"), wdt)[:, :, :cfg.d_model],
        "b_cq": stack(("cross_attn", "b_qkv"), jnp.float32)[:, None, :cfg.d_model],
        "w_co": stack(("cross_attn", "w_out"), wdt),
        "b_co": stack(("cross_attn", "b_out"), jnp.float32)[:, None, :],
        "w_ff1": stack(("ffn", "fc1", "w"), wdt),
        "b_ff1": stack(("ffn", "fc1", "b"), jnp.float32)[:, None, :],
        "w_ff2": stack(("ffn", "fc2", "w"), wdt),
        "b_ff2": stack(("ffn", "fc2", "b"), jnp.float32)[:, None, :],
        "ln": jnp.stack([jnp.stack([
            jnp.asarray(lp["norm1"]["scale"], jnp.float32),
            jnp.asarray(lp["norm1"]["bias"], jnp.float32),
            jnp.asarray(lp["norm2"]["scale"], jnp.float32),
            jnp.asarray(lp["norm2"]["bias"], jnp.float32),
            jnp.asarray(lp["norm3"]["scale"], jnp.float32),
            jnp.asarray(lp["norm3"]["bias"], jnp.float32),
        ]) for lp in layers]),                             # (L, 6, D)
    }


def _group_matrix(d_model: int, nhead: int, dtype) -> np.ndarray:
    dh = d_model // nhead
    g = np.zeros((d_model, nhead), np.float32)
    for d in range(d_model):
        g[d, d // dh] = 1.0
    return g.astype(dtype)


def _mqa_attn_perhead(q_scaled, k, v, keep, D: int, kvd: int):
    """MQA self-attention inside a Pallas kernel, per query head.

    Neither obvious all-heads formulation survives hardware lowering at
    eval batch sizes: lane-replicating K/V to D lanes (the MHA G-matrix
    path) materializes (B, T, D) f32 temporaries that blow the ~16 MB
    scoped-VMEM stack at B=64 (measured: 19.1 MB), and the batched-dot
    alternative needs a (B, D)->(B, H, dh) lane-splitting reshape that
    Mosaic cannot lower (`tpu.reshape vector<64x256xf32> ->
    vector<64x8x32xf32>`). So: loop the H query heads that share the one
    K/V head. Each iteration is 2-D matmuls against constant one-hot lane
    selectors plus (B, T, dh) f32 elementwise work (~1.3 MB at B=64) —
    all Mosaic-lowerable, and the f32 product/sum numerics match the XLA
    grouped path.

    q_scaled: (B, D) f32, already multiplied by 1/sqrt(dh).
    k, v: (B, T, kvd) in storage dtype. v must be pre-masked by the
    caller if stale rows can hold NaNs (masked probs are exactly 0, but
    0 * NaN = NaN). keep: (B, T) bool causal keep-mask.
    k/v/keep may also be equal-length lists of extents (e.g. the HBM
    cache plus the segment ring buffer) — one softmax runs across all
    extents via a shared online max.
    Returns attn (B, D) f32.
    """
    H = D // kvd
    parts = [(k, v, keep)] if not isinstance(k, (list, tuple)) else \
        list(zip(k, v, keep))
    parts = [(kk.astype(jnp.float32), vv.astype(jnp.float32), mm_)
             for kk, vv, mm_ in parts]
    row = jax.lax.broadcasted_iota(jnp.int32, (D, kvd), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (D, kvd), 1)
    row_t = jax.lax.broadcasted_iota(jnp.int32, (kvd, D), 0)
    col_t = jax.lax.broadcasted_iota(jnp.int32, (kvd, D), 1)
    attn = jnp.zeros(q_scaled.shape, jnp.float32)
    for h in range(H):
        sel = (row == h * kvd + col).astype(jnp.float32)     # (D, dh)
        sel_t = (col_t == h * kvd + row_t).astype(jnp.float32)  # (dh, D)
        qh = jnp.dot(q_scaled, sel,
                     preferred_element_type=jnp.float32)     # (B, dh)
        lgs = []
        for kf, vf, kp in parts:
            lg = jnp.sum(qh[:, None, :] * kf, axis=-1)       # (B, Tp_)
            lgs.append(jnp.where(kp, lg, -jnp.inf))
        mh = lgs[0].max(axis=1, keepdims=True)
        for lg in lgs[1:]:                                   # shared max
            mh = jnp.maximum(mh, lg.max(axis=1, keepdims=True))
        whs = [jnp.exp(lg - mh) for lg in lgs]
        den = sum(w.sum(axis=1, keepdims=True) for w in whs)  # (B, 1)
        oh = jnp.zeros((q_scaled.shape[0], kvd), jnp.float32)
        for w, (_, vf, _) in zip(whs, parts):
            oh = oh + jnp.sum((w / den)[:, :, None] * vf, axis=1)
        attn = attn + jnp.dot(oh, sel_t,
                              preferred_element_type=jnp.float32)
    return attn


def _ln(x32, scale, bias):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias


def _make_kernel(cfg: ModelConfig, B: int, T: int, L_enc: int,
                 l_enc_actual: int):
    D = cfg.d_model
    H = cfg.nhead
    scale = 1.0 / (cfg.head_dim ** 0.5)
    n_layers = cfg.num_decoder_layers

    def kernel(pos_ref, x_ref, g_ref,
               w_qkv, b_qkv, w_out, b_out, w_cq, b_cq, w_co, b_co,
               w_ff1, b_ff1, w_ff2, b_ff2, ln,
               sk_in, sv_in, ck_ref, cv_ref,
               x_out, sk_out, sv_out,
               x_scr):
        layer = pl.program_id(0)
        pos = pos_ref[0]
        G = g_ref[:].astype(jnp.float32)               # (D, H)

        @pl.when(layer == 0)
        def _():
            x_scr[:] = x_ref[:].astype(jnp.float32)

        x = x_scr[:]                                   # (B, D) f32
        cdt = sk_in.dtype

        # ---- self-attention with cache append ----
        qkv = jnp.dot(x.astype(w_qkv.dtype), w_qkv[0],
                      preferred_element_type=jnp.float32) + b_qkv[0]
        q, k_new, v_new = (qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:])

        slot = jax.lax.broadcasted_iota(jnp.int32, (B, T, 1), 1)
        at_pos = slot == pos
        k = jnp.where(at_pos, k_new[:, None, :].astype(cdt), sk_in[0])
        v = jnp.where(at_pos, v_new[:, None, :].astype(cdt), sv_in[0])
        sk_out[0] = k
        sv_out[0] = v

        kf = k.astype(jnp.float32)
        prod = (q * scale)[:, None, :] * kf            # (B, T, D)
        logits = jax.lax.dot_general(
            prod, G, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (B, T, H)
        logits = jnp.where(slot <= pos, logits, -jnp.inf)
        m = jnp.max(logits, axis=1, keepdims=True)
        w = jnp.exp(logits - m)
        probs = w / jnp.sum(w, axis=1, keepdims=True)  # (B, T, H)
        probs_d = jax.lax.dot_general(
            probs, G, dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (B, T, D)
        attn = jnp.sum(probs_d * v.astype(jnp.float32), axis=1)  # (B, D)
        sa = jnp.dot(attn.astype(w_out.dtype), w_out[0],
                     preferred_element_type=jnp.float32) + b_out[0]
        x = _ln(x + sa, ln[0, 0], ln[0, 1])

        # ---- cross-attention (precomputed memory K/V) ----
        qc = jnp.dot(x.astype(w_cq.dtype), w_cq[0],
                     preferred_element_type=jnp.float32) + b_cq[0]
        ckf = ck_ref[0].astype(jnp.float32)            # (B, L_enc, D)
        cvf = cv_ref[0].astype(jnp.float32)
        prod_c = (qc * scale)[:, None, :] * ckf
        logits_c = jax.lax.dot_general(
            prod_c, G, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (B, L_enc, H)
        if l_enc_actual < L_enc:  # mask tile-padding slots
            slot_c = jax.lax.broadcasted_iota(jnp.int32, (B, L_enc, 1), 1)
            logits_c = jnp.where(slot_c < l_enc_actual, logits_c, -jnp.inf)
        mc = jnp.max(logits_c, axis=1, keepdims=True)
        wc = jnp.exp(logits_c - mc)
        probs_c = wc / jnp.sum(wc, axis=1, keepdims=True)
        probs_cd = jax.lax.dot_general(
            probs_c, G, dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        attn_c = jnp.sum(probs_cd * cvf, axis=1)       # (B, D)
        ca = jnp.dot(attn_c.astype(w_co.dtype), w_co[0],
                     preferred_element_type=jnp.float32) + b_co[0]
        x = _ln(x + ca, ln[0, 2], ln[0, 3])

        # ---- FFN ----
        h = jnp.dot(x.astype(w_ff1.dtype), w_ff1[0],
                    preferred_element_type=jnp.float32) + b_ff1[0]
        h = jnp.maximum(h, 0.0)
        ff = jnp.dot(h.astype(w_ff2.dtype), w_ff2[0],
                     preferred_element_type=jnp.float32) + b_ff2[0]
        x = _ln(x + ff, ln[0, 4], ln[0, 5])

        x_scr[:] = x

        @pl.when(layer == n_layers - 1)
        def _():
            x_out[:] = x.astype(x_out.dtype)

    return kernel


def _make_kernel_v2(cfg: ModelConfig, B: int, T: int, L_enc: int,
                    l_enc_actual: int, quantized: bool = False,
                    mxu_attn: bool = False, kv_dim: int | None = None):
    """Compute-only variant: caches are READ-ONLY inputs; the kernel merges
    the freshly-projected K/V row into its VMEM copy for attention and
    emits it as a tiny (B, D) output per layer — the HBM cache append is a
    single dynamic_update_slice on the stacked cache *outside* the kernel.
    Removes v1's pathology (12.3 MB/step of (B, T, D) cache write-back +
    aliasing copies inside the while_loop).

    ``quantized``: weights arrive as int8 with per-output-column f32
    scales; dequant happens on the matmul *output* (scale commutes with a
    per-column-scaled weight), so the HBM weight stream is halved and no
    dequantized copy is ever materialized.

    ``mxu_attn``: attention as two batched MXU matmuls per site —
    ``logits = K @ (q ⊙ G)`` and ``out_heads = probsᵀ @ V`` — with the
    fresh K/V row folded in as a separate online-softmax term. The
    hypothesis was that removing the (B, T, D)-sized VPU work (f32
    casts of K/V, q⊙K product, probs⊙V product, row merge) would win,
    since the DMA probe showed the kernel compute-bound. **Measured
    SLOWER** (83 vs 68 us/step wall, 96 vs 79 us/step device-chained,
    batch 10): dot_general with a B-sized batch dimension and M=H=8
    lowers to ~160 tiny matmuls per step — worse MXU utilization than
    the VPU elementwise formulation it replaces. Default False (the
    elementwise formulation); True kept for A/B evidence
    (benchmarks/ab_device_results.json)."""
    D = cfg.d_model
    kvd = kv_dim if kv_dim is not None else D
    if kvd != D and mxu_attn:
        raise NotImplementedError("mxu_attn A/B arm is MHA-only")
    scale = 1.0 / (cfg.head_dim ** 0.5)
    n_layers = cfg.num_decoder_layers

    def kernel(*refs):
        if quantized:
            (pos_ref, x_ref, g_ref, gt_ref,
             w_qkv, s_qkv, b_qkv, w_out, s_out, b_out,
             w_cq, s_cq, b_cq, w_co, s_co, b_co,
             w_ff1, s_ff1, b_ff1, w_ff2, s_ff2, b_ff2,
             ln, sk_in, sv_in, ck_ref, cv_ref,
             x_out, k_new_out, v_new_out, x_scr) = refs

            def mm(x, w_ref, s_ref):
                # int8 -> bf16 is exact (|w_q| <= 127); accumulate f32 on
                # the MXU, apply the per-column scale to the output
                y = jnp.dot(x.astype(jnp.bfloat16),
                            w_ref[0].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                return y * s_ref[0]
        else:
            (pos_ref, x_ref, g_ref, gt_ref,
             w_qkv, b_qkv, w_out, b_out, w_cq, b_cq, w_co, b_co,
             w_ff1, b_ff1, w_ff2, b_ff2,
             ln, sk_in, sv_in, ck_ref, cv_ref,
             x_out, k_new_out, v_new_out, x_scr) = refs
            s_qkv = s_out = s_cq = s_co = s_ff1 = s_ff2 = None

            def mm(x, w_ref, s_ref):
                return jnp.dot(x.astype(w_ref.dtype), w_ref[0],
                               preferred_element_type=jnp.float32)

        layer = pl.program_id(0)
        pos = pos_ref[0]
        G = g_ref[:].astype(jnp.float32)               # (D, H)
        GT = gt_ref[:].astype(jnp.float32)             # (H, D)

        @pl.when(layer == 0)
        def _():
            x_scr[:] = x_ref[:].astype(jnp.float32)

        x = x_scr[:]                                   # (B, D) f32
        cdt = sk_in.dtype

        # ---- self-attention; new K/V row merged in VMEM only ----
        qkv = mm(x, w_qkv, s_qkv) + b_qkv[0]
        q = qkv[:, :D]
        k_new = qkv[:, D:D + kvd]        # (B, kvd); kvd < D under MQA/GQA
        v_new = qkv[:, D + kvd:]
        k_new_out[0] = k_new.astype(k_new_out.dtype)
        v_new_out[0] = v_new.astype(v_new_out.dtype)

        slot = jax.lax.broadcasted_iota(jnp.int32, (B, T, 1), 1)
        if mxu_attn:
            # logits over CACHED rows only (strictly < pos); the fresh row
            # joins as a scalar-per-head online-softmax term, so the cache
            # is never merged/cast — it feeds the MXU as stored (bf16)
            q_s = q * scale                            # (B, D) f32
            qg = (q_s[:, :, None] * G[None, :, :]).astype(cdt)  # (B, D, H)
            logits = jax.lax.dot_general(
                sk_in[0], qg,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)    # (B, T, H)
            logits = jnp.where(slot < pos, logits, -jnp.inf)
            lnew = jnp.dot(q_s * k_new, G,
                           preferred_element_type=jnp.float32)  # (B, H)
            m = jnp.maximum(jnp.max(logits, axis=1), lnew)      # (B, H)
            w = jnp.exp(logits - m[:, None, :])        # (B, T, H)
            w_n = jnp.exp(lnew - m)                    # (B, H)
            s = jnp.sum(w, axis=1) + w_n               # (B, H)
            probs = (w / s[:, None, :]).astype(cdt)    # (B, T, H)
            pv = jax.lax.dot_general(
                probs, sv_in[0],
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)    # (B, H, D)
            attn = jnp.sum(pv * GT[None, :, :], axis=1)         # (B, D)
            p_new = jnp.dot(w_n / s, GT,
                            preferred_element_type=jnp.float32)  # (B, D)
            attn = attn + p_new * v_new
        else:
            at_pos = slot == pos
            k = jnp.where(at_pos, k_new[:, None, :].astype(cdt), sk_in[0])
            v = jnp.where(at_pos, v_new[:, None, :].astype(cdt), sv_in[0])

            if kvd == D:
                kf = k.astype(jnp.float32)
                prod = (q * scale)[:, None, :] * kf    # (B, T, D)
                logits = jax.lax.dot_general(
                    prod, G, dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (B, T, H)
                logits = jnp.where(slot <= pos, logits, -jnp.inf)
                m = jnp.max(logits, axis=1, keepdims=True)
                w = jnp.exp(logits - m)
                probs = w / jnp.sum(w, axis=1, keepdims=True)  # (B, T, H)
                probs_d = jax.lax.dot_general(
                    probs, G, dimension_numbers=(((2,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (B, T, D)
                attn = jnp.sum(probs_d * v.astype(jnp.float32), axis=1)
            else:
                keep = jax.lax.broadcasted_iota(
                    jnp.int32, (B, T), 1) <= pos
                attn = _mqa_attn_perhead(q * scale, k, v, keep, D, kvd)
        sa = mm(attn, w_out, s_out) + b_out[0]
        x = _ln(x + sa, ln[0, 0], ln[0, 1])

        # ---- cross-attention (precomputed memory K/V) ----
        qc = mm(x, w_cq, s_cq) + b_cq[0]
        if mxu_attn:
            qg_c = ((qc * scale)[:, :, None] * G[None, :, :]).astype(cdt)
            logits_c = jax.lax.dot_general(
                ck_ref[0], qg_c,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)    # (B, L_enc, H)
            if l_enc_actual < L_enc:  # mask tile-padding slots
                slot_c = jax.lax.broadcasted_iota(
                    jnp.int32, (B, L_enc, 1), 1)
                logits_c = jnp.where(slot_c < l_enc_actual, logits_c,
                                     -jnp.inf)
            mc = jnp.max(logits_c, axis=1, keepdims=True)
            wc = jnp.exp(logits_c - mc)
            probs_c = (wc / jnp.sum(wc, axis=1, keepdims=True)).astype(cdt)
            pv_c = jax.lax.dot_general(
                probs_c, cv_ref[0],
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)    # (B, H, D)
            attn_c = jnp.sum(pv_c * GT[None, :, :], axis=1)     # (B, D)
        else:
            ckf = ck_ref[0].astype(jnp.float32)        # (B, L_enc, D)
            cvf = cv_ref[0].astype(jnp.float32)
            prod_c = (qc * scale)[:, None, :] * ckf
            logits_c = jax.lax.dot_general(
                prod_c, G, dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # (B, L_enc, H)
            if l_enc_actual < L_enc:  # mask tile-padding slots
                slot_c = jax.lax.broadcasted_iota(
                    jnp.int32, (B, L_enc, 1), 1)
                logits_c = jnp.where(slot_c < l_enc_actual, logits_c,
                                     -jnp.inf)
            mc = jnp.max(logits_c, axis=1, keepdims=True)
            wc = jnp.exp(logits_c - mc)
            probs_c = wc / jnp.sum(wc, axis=1, keepdims=True)
            probs_cd = jax.lax.dot_general(
                probs_c, G, dimension_numbers=(((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            attn_c = jnp.sum(probs_cd * cvf, axis=1)   # (B, D)
        ca = mm(attn_c, w_co, s_co) + b_co[0]
        x = _ln(x + ca, ln[0, 2], ln[0, 3])

        # ---- FFN ----
        h = mm(x, w_ff1, s_ff1) + b_ff1[0]
        h = jnp.maximum(h, 0.0)
        ff = mm(h, w_ff2, s_ff2) + b_ff2[0]
        x = _ln(x + ff, ln[0, 4], ln[0, 5])

        x_scr[:] = x

        @pl.when(layer == n_layers - 1)
        def _():
            x_out[:] = x.astype(x_out.dtype)

    return kernel


WEIGHT_KEYS = ("w_qkv", "w_out", "w_cq", "w_co", "w_ff1", "w_ff2")


def build_stacked_full(decoder_params, cfg: ModelConfig) -> Dict[str, jax.Array]:
    """:func:`build_stacked` plus the embedding / positional / output-head
    tables the whole-step kernel (v4) needs, padded to the 128-lane tile.

    Tables stay f32 to match the jnp path bit-for-bit: the XLA decode step
    reads ``emb[prev] + pos[step]`` in f32 before the dtype cast, and runs
    ``fc_out`` in f32 (models/decoder.py). Padded vocab columns get a -1e9
    head bias so they can never win the in-kernel argmax and contribute
    exactly 0 to the softmax normalizer (exp underflows)."""
    st = dict(build_stacked(decoder_params, cfg))
    emb = jnp.asarray(decoder_params["embedding"]["table"], jnp.float32)
    V = emb.shape[0]
    Vp = _round_up(V, 128)
    st["emb"] = jnp.pad(emb, ((0, Vp - V), (0, 0)))
    pos_tab = jnp.asarray(decoder_params["pos"]["table"], jnp.float32)
    Tp = _round_up(pos_tab.shape[0], 8)  # sublane tile for the VMEM block
    st["pos_emb"] = jnp.pad(pos_tab, ((0, Tp - pos_tab.shape[0]), (0, 0)))
    w = jnp.asarray(decoder_params["fc_out"]["w"], jnp.float32)
    b = jnp.asarray(decoder_params["fc_out"]["b"], jnp.float32)
    st["w_head"] = jnp.pad(w, ((0, 0), (0, Vp - V)))
    st["b_head"] = jnp.pad(b, (0, Vp - V), constant_values=-1e9)[None, :]
    return st


def quantize_stacked(stacked) -> Dict[str, jax.Array]:
    """int8-quantize the six stacked weight tensors per output column
    (ops.quant semantics, vmapped over the layer axis). Returns a new dict
    with ``{k}`` replaced by int8 and ``{k}_s`` f32 (L, 1, out) scales."""
    from .quant import quantize_weight

    out = dict(stacked)
    for k in WEIGHT_KEYS:
        w_q, s = jax.vmap(quantize_weight)(stacked[k].astype(jnp.float32))
        out[k] = w_q
        out[f"{k}_s"] = s[:, None, :]
    return out


def _make_kernel_v4(cfg: ModelConfig, B: int, T: int, L_enc: int,
                    l_enc_actual: int, Vp: int, Tp: int,
                    time_major: bool = True):
    """Whole-step kernel: embedding gather (one-hot MXU matmul) + all
    decoder layers + output head (logits, argmax, chosen log-prob) in one
    Pallas program, with the fresh K/V rows written straight into the HBM
    caches via dynamic out-block index maps (aliased, single-row writes).

    Per decode step this leaves ~zero XLA ops outside the kernel: the only
    external work is the (B,)-vector finished/eos bookkeeping of the while
    loop. Compare v2, which leaves embedding + fc_out + argmax + softmax +
    two cache dynamic_update_slice calls to XLA (~24 us/step of dispatch
    overhead at batch 10 — see benchmarks/diag_cache_scaling.py).

    Self-cache layout here is (L, T, B, D) — time-major, unlike v1/v2's
    (L, B, T, D) — so the per-step fresh row is a (1, 1, B, D) out block
    whose last two dims are whole-array (tileable), written in place at
    ``pos`` via the scalar-prefetch index map."""
    D = cfg.d_model
    scale = 1.0 / (cfg.head_dim ** 0.5)
    n_layers = cfg.num_decoder_layers

    def kernel(pos_ref, prev_ref, g_ref, emb_ref, pos_tab_ref,
               w_qkv, b_qkv, w_out, b_out, w_cq, b_cq, w_co, b_co,
               w_ff1, b_ff1, w_ff2, b_ff2, ln,
               sk_in, sv_in, ck_ref, cv_ref, w_head_ref, b_head_ref,
               nxt_out, logp_out, sk_row_out, sv_row_out,
               x_scr):
        layer = pl.program_id(0)
        pos = pos_ref[0]
        G = g_ref[:].astype(jnp.float32)               # (D, H)
        wdt = w_qkv.dtype

        @pl.when(layer == 0)
        def _():
            # one-hot embedding gather on the MXU: onehotT (Vp, B) with
            # onehotT[v, b] = (prev[b] == v), contracted over Vp against the
            # f32 table; exact row selection, no transposes.
            iota_v = jax.lax.broadcasted_iota(jnp.int32, (Vp, B), 0)
            onehot_t = (iota_v == prev_ref[:]).astype(jnp.float32)
            x0 = jax.lax.dot_general(
                onehot_t, emb_ref[:],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # (B, D)
            # positional row via the same one-hot trick (dynamic sublane
            # indexing is not tileable; a (1, Tp) @ (Tp, D) matmul is)
            iota_p = jax.lax.broadcasted_iota(jnp.int32, (1, Tp), 1)
            oh_pos = (iota_p == pos).astype(jnp.float32)
            pos_row = jnp.dot(oh_pos, pos_tab_ref[:],
                              preferred_element_type=jnp.float32)  # (1, D)
            x0 = x0 + pos_row
            # match the jnp path: cast to the compute dtype, then f32
            x_scr[:] = x0.astype(wdt).astype(jnp.float32)

        x = x_scr[:]                                   # (B, D) f32
        cdt = sk_in.dtype

        def mm(x, w_ref):
            return jnp.dot(x.astype(w_ref.dtype), w_ref[0],
                           preferred_element_type=jnp.float32)

        # ---- self-attention; fresh K/V row -> HBM via out index map ----
        qkv = mm(x, w_qkv) + b_qkv[0]
        q, k_new, v_new = (qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:])
        if time_major:
            # cache blocks are (T, B, D); the fresh row is an in-place
            # (1, 1, B, D) HBM write; reductions run over the leading
            # (untiled) T axis
            sk_row_out[0, 0] = k_new.astype(cdt)
            sv_row_out[0, 0] = v_new.astype(cdt)
            slot = jax.lax.broadcasted_iota(jnp.int32, (T, B, 1), 0)
            at_pos = slot == pos
            k = jnp.where(at_pos, k_new[None, :, :].astype(cdt), sk_in[0])
            v = jnp.where(at_pos, v_new[None, :, :].astype(cdt), sv_in[0])
            t_axis = 0
        else:
            # batch-major (B, T, D) blocks, same as v2: fresh rows are
            # emitted as (L, B, D) outputs and appended by the caller
            sk_row_out[0] = k_new.astype(cdt)
            sv_row_out[0] = v_new.astype(cdt)
            slot = jax.lax.broadcasted_iota(jnp.int32, (B, T, 1), 1)
            at_pos = slot == pos
            k = jnp.where(at_pos, k_new[:, None, :].astype(cdt), sk_in[0])
            v = jnp.where(at_pos, v_new[:, None, :].astype(cdt), sv_in[0])
            t_axis = 1

        kf = k.astype(jnp.float32)
        if time_major:
            prod = (q * scale)[None, :, :] * kf        # (T, B, D)
        else:
            prod = (q * scale)[:, None, :] * kf        # (B, T, D)
        logits = jax.lax.dot_general(
            prod, G, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (., ., H)
        logits = jnp.where(slot <= pos, logits, -jnp.inf)
        m = jnp.max(logits, axis=t_axis, keepdims=True)
        w = jnp.exp(logits - m)
        probs = w / jnp.sum(w, axis=t_axis, keepdims=True)
        probs_d = jax.lax.dot_general(
            probs, G, dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (., ., D)
        attn = jnp.sum(probs_d * v.astype(jnp.float32), axis=t_axis)
        sa = mm(attn, w_out) + b_out[0]
        x = _ln(x + sa, ln[0, 0], ln[0, 1])

        # ---- cross-attention (precomputed memory K/V) ----
        qc = mm(x, w_cq) + b_cq[0]
        ckf = ck_ref[0].astype(jnp.float32)            # (B, L_enc, D)
        cvf = cv_ref[0].astype(jnp.float32)
        prod_c = (qc * scale)[:, None, :] * ckf
        logits_c = jax.lax.dot_general(
            prod_c, G, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (B, L_enc, H)
        if l_enc_actual < L_enc:  # mask tile-padding slots
            slot_c = jax.lax.broadcasted_iota(jnp.int32, (B, L_enc, 1), 1)
            logits_c = jnp.where(slot_c < l_enc_actual, logits_c, -jnp.inf)
        mc = jnp.max(logits_c, axis=1, keepdims=True)
        wc = jnp.exp(logits_c - mc)
        probs_c = wc / jnp.sum(wc, axis=1, keepdims=True)
        probs_cd = jax.lax.dot_general(
            probs_c, G, dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        attn_c = jnp.sum(probs_cd * cvf, axis=1)       # (B, D)
        ca = mm(attn_c, w_co) + b_co[0]
        x = _ln(x + ca, ln[0, 2], ln[0, 3])

        # ---- FFN ----
        h = mm(x, w_ff1) + b_ff1[0]
        h = jnp.maximum(h, 0.0)
        ff = mm(h, w_ff2) + b_ff2[0]
        x = _ln(x + ff, ln[0, 4], ln[0, 5])

        x_scr[:] = x

        # ---- output head: logits, first-argmax, chosen log-prob ----
        @pl.when(layer == n_layers - 1)
        def _():
            logits_v = jnp.dot(x, w_head_ref[:],
                               preferred_element_type=jnp.float32)
            logits_v = logits_v + b_head_ref[:]        # (B, Vp) f32
            mv = jnp.max(logits_v, axis=-1, keepdims=True)
            se = jnp.sum(jnp.exp(logits_v - mv), axis=-1, keepdims=True)
            iota = jax.lax.broadcasted_iota(jnp.int32, logits_v.shape, 1)
            idx = jnp.min(jnp.where(logits_v >= mv, iota, Vp), axis=-1,
                          keepdims=True)               # first max, as argmax
            p_max = jnp.exp(mv - (mv + jnp.log(se)))   # softmax of chosen
            nxt_out[:] = idx.astype(jnp.int32)
            logp_out[:] = jnp.log(p_max + 1e-10)       # reference numerics

    return kernel


def fused_whole_step(stacked, cfg: ModelConfig, prev, self_k, self_v,
                     cross_k, cross_v, pos,
                     l_enc_actual: int | None = None,
                     *, interpret: bool | None = None,
                     time_major: bool = True):
    """One whole greedy-decode step as a single Pallas program.

    prev: (B,) int32 previous tokens; cross_k/v: (L, B, L_enc_pad, D);
    ``stacked`` must come from :func:`build_stacked_full`.

    time_major=True ("v4"): self_k/v are (L, T, B, D) caches, donated —
    the fresh rows are written in place at ``pos`` via aliased single-row
    out blocks. Returns (nxt (B,) i32, logp (B,) f32, self_k', self_v').

    time_major=False ("v3"): self_k/v are v2's (L, B, T, D) caches, read
    only; the fresh rows come back as (L, B, D) for the caller to append
    (keeps the T-row sublane layout, whose cache-block DMA is ~1.5x
    cheaper than time-major's B-padded tiles at small batch). Returns
    (nxt, logp, k_new (L, B, D), v_new (L, B, D))."""
    from . import default_interpret

    if interpret is None:
        interpret = default_interpret()
    if time_major:
        L, T, B, D = self_k.shape
    else:
        L, B, T, D = self_k.shape
    L_enc = cross_k.shape[2]
    if l_enc_actual is None:
        l_enc_actual = L_enc
    ff = cfg.dim_feedforward
    Vp = stacked["emb"].shape[0]
    Tp = stacked["pos_emb"].shape[0]
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    G = jnp.asarray(_group_matrix(D, cfg.nhead, np.float32))

    def fixed(shape):
        return pl.BlockSpec(shape, lambda l, p: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_layer(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda l, p: (l,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[
            fixed((1, B)),                  # prev tokens (int32 row)
            fixed((D, cfg.nhead)),          # G
            fixed((Vp, D)),                 # embedding table (f32)
            fixed((Tp, D)),                 # positional table (f32)
            per_layer((D, 3 * D)), per_layer((1, 3 * D)),  # w_qkv, b_qkv
            per_layer((D, D)), per_layer((1, D)),          # w_out, b_out
            per_layer((D, D)), per_layer((1, D)),          # w_cq, b_cq
            per_layer((D, D)), per_layer((1, D)),          # w_co, b_co
            per_layer((D, ff)), per_layer((1, ff)),        # w_ff1, b_ff1
            per_layer((ff, D)), per_layer((1, D)),         # w_ff2, b_ff2
            per_layer((6, D)),              # ln
            per_layer((T, B, D) if time_major else (B, T, D)),  # self_k
            per_layer((T, B, D) if time_major else (B, T, D)),  # self_v
            per_layer((B, L_enc, D)),       # cross_k
            per_layer((B, L_enc, D)),       # cross_v
            fixed((D, Vp)),                 # w_head (f32)
            fixed((1, Vp)),                 # b_head (f32, pads -1e9)
        ],
        out_specs=(
            fixed((B, 1)),                  # next token ids
            fixed((B, 1)),                  # chosen log-prob
        ) + ((
            # single fresh cache row per layer, written in place at pos
            pl.BlockSpec((1, 1, B, D), lambda l, p: (l, p[0], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B, D), lambda l, p: (l, p[0], 0, 0),
                         memory_space=pltpu.VMEM),
        ) if time_major else (
            per_layer((B, D)),              # k_new, appended by caller
            per_layer((B, D)),              # v_new
        )),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)],
    )

    if time_major:
        kv_out_shapes = (
            jax.ShapeDtypeStruct(self_k.shape, self_k.dtype),
            jax.ShapeDtypeStruct(self_v.shape, self_v.dtype),
        )
        # operand indices incl. scalar prefetch: pos=0, prev=1, G=2, emb=3,
        # pos_tab=4, 13 weight arrays at 5..17, self_k=18, self_v=19,
        # cross_k=20, cross_v=21, w_head=22, b_head=23
        aliases = {18: 2, 19: 3}
    else:
        kv_out_shapes = (
            jax.ShapeDtypeStruct((L, B, D), self_k.dtype),
            jax.ShapeDtypeStruct((L, B, D), self_v.dtype),
        )
        aliases = {}

    kernel = _make_kernel_v4(cfg, B, T, L_enc, l_enc_actual, Vp, Tp,
                             time_major=time_major)
    nxt, logp, k_out, v_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ) + kv_out_shapes,
        input_output_aliases=aliases,
        interpret=interpret,
    )(pos_arr, jnp.asarray(prev, jnp.int32)[None, :], G,
      stacked["emb"], stacked["pos_emb"],
      stacked["w_qkv"], stacked["b_qkv"], stacked["w_out"], stacked["b_out"],
      stacked["w_cq"], stacked["b_cq"], stacked["w_co"], stacked["b_co"],
      stacked["w_ff1"], stacked["b_ff1"], stacked["w_ff2"], stacked["b_ff2"],
      stacked["ln"], self_k, self_v, cross_k, cross_v,
      stacked["w_head"], stacked["b_head"])
    return nxt[:, 0], logp[:, 0], k_out, v_out


def fused_decoder_layers_step_v2(stacked, cfg: ModelConfig, x_emb, self_k,
                                 self_v, cross_k, cross_v, pos,
                                 l_enc_actual: int | None = None,
                                 *, interpret: bool | None = None,
                                 mxu_attn: bool = False,
                                 t_active: int | None = None):
    """Compute-only fused step. Caches are inputs only; returns
    (x_out (B, D) f32, k_new (L, B, D), v_new (L, B, D)) — the caller
    appends the rows with one dynamic_update_slice per stacked cache.

    If ``stacked`` came from :func:`quantize_stacked` (detected by the
    ``w_qkv_s`` key), weights stream from HBM as int8 and dequantize on the
    matmul output inside the kernel (half the weight bandwidth).

    ``mxu_attn=True`` selects the batched-MXU attention formulation
    (measured slower at batch 10; see :func:`_make_kernel_v2`).

    ``t_active``: static T-prefix bucket — the kernel streams and
    computes only cache rows [0, t_active), valid whenever every row's
    ``pos`` < t_active. The decode loop chains per-bucket while_loops
    (greedy_decode_fused), halving average cache DMA + attention
    compute over a full worst-case decode."""
    from . import default_interpret

    if interpret is None:
        interpret = default_interpret()
    quantized = "w_qkv_s" in stacked
    L, B, T, kvd = self_k.shape     # kvd < D under MQA/GQA
    if t_active is not None:
        if not 0 < t_active <= T:
            raise ValueError(f"t_active {t_active} not in (0, {T}]")
        T = t_active
    D = cfg.d_model
    L_enc = cross_k.shape[2]
    if l_enc_actual is None:
        l_enc_actual = L_enc
    ff = cfg.dim_feedforward
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    G = jnp.asarray(_group_matrix(D, cfg.nhead, np.float32))
    GT = jnp.asarray(G.T)

    def fixed(shape):
        return pl.BlockSpec(shape, lambda l, pos_ref: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_layer(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda l, pos_ref: (l,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def weight_specs(name, shape):
        specs = [per_layer(shape)]
        if quantized:
            specs.append(per_layer((1, shape[-1])))  # per-column scale
        return specs

    in_specs = [fixed((B, D)), fixed((D, cfg.nhead)),
                fixed((cfg.nhead, D))]
    in_specs += (weight_specs("w_qkv", (D, D + 2 * kvd))
                 + [per_layer((1, D + 2 * kvd))])
    in_specs += weight_specs("w_out", (D, D)) + [per_layer((1, D))]
    in_specs += weight_specs("w_cq", (D, D)) + [per_layer((1, D))]
    in_specs += weight_specs("w_co", (D, D)) + [per_layer((1, D))]
    in_specs += weight_specs("w_ff1", (D, ff)) + [per_layer((1, ff))]
    in_specs += weight_specs("w_ff2", (ff, D)) + [per_layer((1, D))]
    in_specs += [
        per_layer((6, D)),              # ln
        per_layer((B, T, kvd)),         # self_k (read-only)
        per_layer((B, T, kvd)),         # self_v (read-only)
        per_layer((B, L_enc, D)),       # cross_k
        per_layer((B, L_enc, D)),       # cross_v
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=in_specs,
        out_specs=(
            fixed((B, D)),                  # x_out
            per_layer((B, kvd)),            # k_new
            per_layer((B, kvd)),            # v_new
        ),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)],
    )

    def weight_args(name, bias):
        args = [stacked[name]]
        if quantized:
            args.append(stacked[f"{name}_s"])
        return args + [stacked[bias]]

    operands = [pos_arr, x_emb, G, GT]
    operands += weight_args("w_qkv", "b_qkv")
    operands += weight_args("w_out", "b_out")
    operands += weight_args("w_cq", "b_cq")
    operands += weight_args("w_co", "b_co")
    operands += weight_args("w_ff1", "b_ff1")
    operands += weight_args("w_ff2", "b_ff2")
    operands += [stacked["ln"], self_k, self_v, cross_k, cross_v]

    kernel = _make_kernel_v2(cfg, B, T, L_enc, l_enc_actual,
                             quantized=quantized, mxu_attn=mxu_attn,
                             kv_dim=kvd)
    x_out, k_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct((L, B, kvd), self_k.dtype),
            jax.ShapeDtypeStruct((L, B, kvd), self_v.dtype),
        ),
        interpret=interpret,
        # The default 16 MB scoped-VMEM stack is ~5% short of the MQA
        # per-head path's peak at eval batch sizes (16.87 MB at B=64,
        # T=160) — v5e has 128 MB of VMEM, so raise the stack budget
        # rather than contort the math into worse-lowering shapes.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(*operands)
    return x_out, k_new, v_new


def fused_decoder_layers_step(stacked, cfg: ModelConfig, x_emb, self_k,
                              self_v, cross_k, cross_v, pos,
                              l_enc_actual: int | None = None,
                              *, interpret: bool | None = None):
    """x_emb: (B, D) post-embedding activations; self_k/v: (L, B, T, D);
    cross_k/v: (L, B, L_enc_padded, D) with valid rows < ``l_enc_actual``;
    pos: scalar. Returns (x_out (B, D) f32, self_k', self_v') with caches
    updated at pos."""
    from . import default_interpret

    if interpret is None:
        interpret = default_interpret()
    L, B, T, D = self_k.shape
    L_enc = cross_k.shape[2]
    if l_enc_actual is None:
        l_enc_actual = L_enc
    ff = cfg.dim_feedforward
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    G = jnp.asarray(_group_matrix(D, cfg.nhead, np.float32))

    def fixed(shape):
        return pl.BlockSpec(shape, lambda l, pos_ref: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_layer(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda l, pos_ref: (l,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[
            fixed((B, D)),                  # x_emb
            fixed((D, cfg.nhead)),          # G
            per_layer((D, 3 * D)),          # w_qkv
            per_layer((1, 3 * D)),          # b_qkv
            per_layer((D, D)), per_layer((1, D)),      # w_out, b_out
            per_layer((D, D)), per_layer((1, D)),      # w_cq, b_cq
            per_layer((D, D)), per_layer((1, D)),      # w_co, b_co
            per_layer((D, ff)), per_layer((1, ff)),    # w_ff1, b_ff1
            per_layer((ff, D)), per_layer((1, D)),     # w_ff2, b_ff2
            per_layer((6, D)),              # ln
            per_layer((B, T, D)),           # self_k
            per_layer((B, T, D)),           # self_v
            per_layer((B, L_enc, D)),       # cross_k
            per_layer((B, L_enc, D)),       # cross_v
        ],
        out_specs=(
            fixed((B, D)),                  # x_out
            per_layer((B, T, D)),           # self_k out
            per_layer((B, T, D)),           # self_v out
        ),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)],
    )

    kernel = _make_kernel(cfg, B, T, L_enc, l_enc_actual)
    x_out, k_out, v_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct(self_k.shape, self_k.dtype),
            jax.ShapeDtypeStruct(self_v.shape, self_v.dtype),
        ),
        # operand indices include the scalar prefetch: pos=0, x=1, G=2,
        # 13 weight arrays at 3..15, self_k=16, self_v=17, cross_k=18,
        # cross_v=19
        input_output_aliases={16: 1, 17: 2},
        interpret=interpret,
    )(pos_arr, x_emb, G, stacked["w_qkv"], stacked["b_qkv"],
      stacked["w_out"], stacked["b_out"], stacked["w_cq"], stacked["b_cq"],
      stacked["w_co"], stacked["b_co"], stacked["w_ff1"], stacked["b_ff1"],
      stacked["w_ff2"], stacked["b_ff2"], stacked["ln"],
      self_k, self_v, cross_k, cross_v)
    return x_out, k_out, v_out


# ---------------------------------------------------------------------------
# Ragged (per-row position) whole-step kernel for continuous batching
# ---------------------------------------------------------------------------

def _make_kernel_ragged(cfg: ModelConfig, Bc: int, T: int, L_enc: int,
                        l_enc_actual: int, Vp: int, Tp: int, kvd: int,
                        quantized: bool = False,
                        return_logits: bool = False,
                        ring_s: int = 0):
    """Whole-step kernel with PER-ROW decode positions, for the continuous
    slot pool (decode/continuous.py): embedding gather + all decoder
    layers + output head in one Pallas program, grid (layers, B-chunks).

    Unlike v2/v4 the batch is chunked (Bc rows per grid step) so the
    (Bc, T, D) cache blocks fit VMEM at pool sizes of 64+ slots — every
    row in a chunk attends over the full (masked) T with its OWN ``pos``,
    so no cross-chunk online softmax is needed; numerics are identical to
    the v2 kernel at that row's position. Fresh K/V rows are emitted as
    (L, B, D) outputs and scattered at per-row positions by the caller
    (compute-only: caches are read-only inputs).

    The activation scratch holds ALL pool rows ((B, D) f32): grid order is
    (layer, chunk) with chunks innermost, so chunk b's layer-l output is
    still resident when layer l+1 revisits chunk b."""
    D = cfg.d_model
    scale = 1.0 / (cfg.head_dim ** 0.5)
    n_layers = cfg.num_decoder_layers

    def kernel(*refs):
        if quantized:
            (pos_ref, prev_ref, g_ref, emb_ref, pos_tab_ref,
             w_qkv, s_qkv, b_qkv, w_out, s_out, b_out,
             w_cq, s_cq, b_cq, w_co, s_co, b_co,
             w_ff1, s_ff1, b_ff1, w_ff2, s_ff2, b_ff2, ln,
             sk_in, sv_in, ck_ref, cv_ref, *rest) = refs
        else:
            (pos_ref, prev_ref, g_ref, emb_ref, pos_tab_ref,
             w_qkv, b_qkv, w_out, b_out, w_cq, b_cq, w_co, b_co,
             w_ff1, b_ff1, w_ff2, b_ff2, ln,
             sk_in, sv_in, ck_ref, cv_ref, *rest) = refs
            s_qkv = s_out = s_cq = s_co = s_ff1 = s_ff2 = None
        if ring_s:
            seg_ref, rk_in, rv_in = rest[:3]
            rest = rest[3:]
        else:
            seg_ref = rk_in = rv_in = None
        w_head_ref, b_head_ref, *out_refs = rest
        if return_logits:  # full distribution out (beam search consumers)
            logits_out, k_new_out, v_new_out, x_scr = out_refs
            nxt_out = logp_out = None
        else:
            nxt_out, logp_out, k_new_out, v_new_out, x_scr = out_refs
        layer = pl.program_id(0)
        chunk = pl.program_id(1)
        pos = pos_ref[:, 0]                            # (Bc,) int32
        G = g_ref[:].astype(jnp.float32)               # (D, H)
        # embedding round-trip dtype = model compute dtype (matches the
        # XLA/v2 paths); with int8 weights w_qkv.dtype would be wrong
        wdt = jnp.dtype(cfg.dtype) if quantized else w_qkv.dtype

        @pl.when(layer == 0)
        def _():
            # one-hot embedding gather on the MXU (v4's trick), per chunk
            iota_v = jax.lax.broadcasted_iota(jnp.int32, (Vp, Bc), 0)
            onehot_t = (iota_v == prev_ref[:, 0][None, :]).astype(
                jnp.float32)
            x0 = jax.lax.dot_general(
                onehot_t, emb_ref[:],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # (Bc, D)
            # per-row positional rows: (Bc, Tp) one-hot @ (Tp, D)
            iota_p = jax.lax.broadcasted_iota(jnp.int32, (Bc, Tp), 1)
            oh_pos = (iota_p == pos[:, None]).astype(jnp.float32)
            pos_rows = jnp.dot(oh_pos, pos_tab_ref[:],
                               preferred_element_type=jnp.float32)
            x0 = x0 + pos_rows
            x_scr[pl.ds(chunk * Bc, Bc), :] = (
                x0.astype(wdt).astype(jnp.float32))

        x = x_scr[pl.ds(chunk * Bc, Bc), :]            # (Bc, D) f32
        cdt = sk_in.dtype

        if quantized:
            def mm(x, w_ref, s_ref):
                # int8 -> bf16 is exact (|w_q| <= 127); f32 MXU accum,
                # per-output-column scale on the result (v2 semantics)
                y = jnp.dot(x.astype(jnp.bfloat16),
                            w_ref[0].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                return y * s_ref[0]
        else:
            def mm(x, w_ref, s_ref):
                return jnp.dot(x.astype(w_ref.dtype), w_ref[0],
                               preferred_element_type=jnp.float32)

        # ---- self-attention, per-row positions ----
        qkv = mm(x, w_qkv, s_qkv) + b_qkv[0]
        q = qkv[:, :D]
        k_new = qkv[:, D:D + kvd]
        v_new = qkv[:, D + kvd:]
        k_new_out[0] = k_new.astype(cdt)
        v_new_out[0] = v_new.astype(cdt)

        slot = jax.lax.broadcasted_iota(jnp.int32, (Bc, T, 1), 1)
        p_col = pos[:, None, None]                     # (Bc, 1, 1)
        if ring_s:
            # Segment-ring mode: rows [seg_start, pos] live in the small
            # (S, kvd) ring (previous steps of THIS segment, written by
            # scalar-index updates in the caller's loop — cheap), plus
            # the fresh row merged here at j = pos - seg_start. The HBM
            # cache supplies rows < seg_start only; it is written back
            # ONCE per segment instead of per step (the per-step
            # full-cache scatter was 45% of segment time — see
            # benchmarks/probe_ragged_split.py). One softmax spans both
            # extents via a shared online max.
            seg0 = seg_ref[:, 0]                       # (Bc,)
            s0_col = seg0[:, None, None]
            jslot = jax.lax.broadcasted_iota(jnp.int32, (Bc, ring_s, 1), 1)
            jc_col = (pos - seg0)[:, None, None]       # (Bc, 1, 1)
            rk = jnp.where(jslot == jc_col,
                           k_new[:, None, :].astype(cdt), rk_in[0])
            rv = jnp.where(jslot == jc_col,
                           v_new[:, None, :].astype(cdt), rv_in[0])
            # 0*NaN belts: V of both extents zeroed beyond their masks
            rv = jnp.where(jslot <= jc_col, rv, jnp.zeros_like(rv))
            v_c = jnp.where(slot < s0_col, sv_in[0],
                            jnp.zeros_like(sv_in[0]))
            if kvd == D:
                q_s = (q * scale)[:, None, :]
                prod = q_s * sk_in[0].astype(jnp.float32)
                lc = jax.lax.dot_general(
                    prod, G, dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (Bc, T, H)
                lc = jnp.where(slot < s0_col, lc, -jnp.inf)
                prod_r = q_s * rk.astype(jnp.float32)
                lr = jax.lax.dot_general(
                    prod_r, G, dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (Bc, S, H)
                lr = jnp.where(jslot <= jc_col, lr, -jnp.inf)
                m = jnp.maximum(jnp.max(lc, axis=1, keepdims=True),
                                jnp.max(lr, axis=1, keepdims=True))
                wc_ = jnp.exp(lc - m)
                wr_ = jnp.exp(lr - m)
                den = (jnp.sum(wc_, axis=1, keepdims=True)
                       + jnp.sum(wr_, axis=1, keepdims=True))
                pc_d = jax.lax.dot_general(
                    wc_ / den, G,
                    dimension_numbers=(((2,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (Bc, T, D)
                pr_d = jax.lax.dot_general(
                    wr_ / den, G,
                    dimension_numbers=(((2,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (Bc, S, D)
                attn = (jnp.sum(pc_d * v_c.astype(jnp.float32), axis=1)
                        + jnp.sum(pr_d * rv.astype(jnp.float32), axis=1))
            else:
                keep_c = (jax.lax.broadcasted_iota(
                    jnp.int32, (Bc, T), 1) < seg0[:, None])
                keep_r = (jax.lax.broadcasted_iota(
                    jnp.int32, (Bc, ring_s), 1) <= (pos - seg0)[:, None])
                attn = _mqa_attn_perhead(
                    q * scale, [sk_in[0], rk], [v_c, rv],
                    [keep_c, keep_r], D, kvd)
        else:
            at_pos = slot == p_col
            k = jnp.where(at_pos, k_new[:, None, :].astype(cdt), sk_in[0])
            v = jnp.where(at_pos, v_new[:, None, :].astype(cdt), sv_in[0])
            # Zero V beyond the causal horizon: attn sums probs*v over ALL
            # T rows and masked probs are exactly 0, but 0*NaN = NaN — a
            # recycled slot's stale cache rows (incl. uninitialized garbage
            # scattered there by bucketed dispatch while the slot sat
            # finished) must never poison the sum. K needs no mask: its
            # NaNs die in the post-dot `slot <= pos` -inf where below.
            v = jnp.where(slot <= p_col, v, jnp.zeros_like(v))
            if kvd == D:
                kf = k.astype(jnp.float32)
                prod = (q * scale)[:, None, :] * kf    # (Bc, T, D)
                logits = jax.lax.dot_general(
                    prod, G, dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (Bc, T, H)
                logits = jnp.where(slot <= p_col, logits, -jnp.inf)
                m = jnp.max(logits, axis=1, keepdims=True)
                w = jnp.exp(logits - m)
                probs = w / jnp.sum(w, axis=1, keepdims=True)
                probs_d = jax.lax.dot_general(
                    probs, G, dimension_numbers=(((2,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (Bc, T, D)
                attn = jnp.sum(probs_d * v.astype(jnp.float32), axis=1)
            else:
                # MQA: per-head loop (v pre-masked above, so NaN-safe)
                keep = (jax.lax.broadcasted_iota(jnp.int32, (Bc, T), 1)
                        <= pos[:, None])
                attn = _mqa_attn_perhead(q * scale, k, v, keep, D, kvd)
        sa = mm(attn, w_out, s_out) + b_out[0]
        x = _ln(x + sa, ln[0, 0], ln[0, 1])

        # ---- cross-attention ----
        qc = mm(x, w_cq, s_cq) + b_cq[0]
        ckf = ck_ref[0].astype(jnp.float32)            # (Bc, L_enc, D)
        cvf = cv_ref[0].astype(jnp.float32)
        prod_c = (qc * scale)[:, None, :] * ckf
        logits_c = jax.lax.dot_general(
            prod_c, G, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (Bc, L_enc, H)
        if l_enc_actual < L_enc:
            slot_c = jax.lax.broadcasted_iota(jnp.int32, (Bc, L_enc, 1), 1)
            logits_c = jnp.where(slot_c < l_enc_actual, logits_c, -jnp.inf)
        mc = jnp.max(logits_c, axis=1, keepdims=True)
        wc = jnp.exp(logits_c - mc)
        probs_c = wc / jnp.sum(wc, axis=1, keepdims=True)
        probs_cd = jax.lax.dot_general(
            probs_c, G, dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        attn_c = jnp.sum(probs_cd * cvf, axis=1)       # (Bc, D)
        ca = mm(attn_c, w_co, s_co) + b_co[0]
        x = _ln(x + ca, ln[0, 2], ln[0, 3])

        # ---- FFN ----
        h = mm(x, w_ff1, s_ff1) + b_ff1[0]
        h = jnp.maximum(h, 0.0)
        ff = mm(h, w_ff2, s_ff2) + b_ff2[0]
        x = _ln(x + ff, ln[0, 4], ln[0, 5])

        x_scr[pl.ds(chunk * Bc, Bc), :] = x

        # ---- output head (last layer only) ----
        @pl.when(layer == n_layers - 1)
        def _():
            logits_v = jnp.dot(x, w_head_ref[:],
                               preferred_element_type=jnp.float32)
            logits_v = logits_v + b_head_ref[:]        # (Bc, Vp) f32
            if return_logits:
                logits_out[:] = logits_v
                return
            mv = jnp.max(logits_v, axis=-1, keepdims=True)
            se = jnp.sum(jnp.exp(logits_v - mv), axis=-1, keepdims=True)
            iota = jax.lax.broadcasted_iota(jnp.int32, logits_v.shape, 1)
            idx = jnp.min(jnp.where(logits_v >= mv, iota, Vp), axis=-1,
                          keepdims=True)               # first max, as argmax
            p_max = jnp.exp(mv - (mv + jnp.log(se)))
            nxt_out[:] = idx.astype(jnp.int32)
            logp_out[:] = jnp.log(p_max + 1e-10)       # reference numerics

    return kernel


def fused_ragged_step(stacked, cfg: ModelConfig, prev, pos,
                      self_k, self_v, cross_k, cross_v,
                      l_enc_actual: int | None = None, *,
                      block_b: int = 16, n_chunks: int | None = None,
                      return_logits: bool = False,
                      seg_start=None, ring_k=None, ring_v=None,
                      t_active: int | None = None,
                      interpret: bool | None = None):
    """One whole ragged decode step for the continuous slot pool.

    prev, pos: (B,) int32 — B must be a multiple of ``block_b`` (the pool
    construction pads with scratch slots). self_k/v: (L, B, T, kvd)
    batch-major read-only caches; cross_k/v: (L, B, L_enc_pad, D).
    ``stacked`` from :func:`build_stacked_full`.

    Returns (nxt (B,) i32, logp (B,) f32, k_new (L, B, kvd),
    v_new (L, B, kvd)); the caller scatters the fresh rows at per-row
    ``pos`` (two vmapped dynamic_update_slice calls).

    ``return_logits=True`` replaces the in-kernel argmax with the full
    head distribution: returns (logits (B, Vp) f32, k_new, v_new). The
    beam consumer (decode/fused.py::beam_decode_fused) needs every
    candidate's log-prob, not the top-1, so ranking moves to XLA.

    Segment-ring mode (``seg_start`` (B,) + ``ring_k``/``ring_v``
    (L, B, S, kvd)): rows [seg_start_b, pos_b] are read from the ring
    (this segment's fresh rows) instead of the cache; the cache only
    supplies rows < seg_start_b, so the caller can defer the expensive
    per-row cache scatter to once per segment (decode/continuous.py::
    decode_segment_fused(ring=True)).

    ``t_active``: static T-prefix bucket — stream/compute only cache
    rows [0, t_active). Correctness requires t_active > every row's
    highest READ cache slot: >= max(seg_start) in ring mode,
    > max(pos) reached during the call otherwise (the engine tracks a
    host-side per-slot position upper bound and picks the bucket per
    segment)."""
    from . import default_interpret

    if interpret is None:
        interpret = default_interpret()
    L, B, T, kvd = self_k.shape
    if t_active is not None:
        if not 0 < t_active <= T:
            raise ValueError(f"t_active {t_active} not in (0, {T}]")
        T = t_active
    if block_b % 8:
        # hardware Mosaic requires row blocks on the 8-sublane tile: a
        # (5, D) f32 store into an 8-row scratch fails with "cannot
        # statically prove that index ... is a multiple of 8" (interpret
        # mode would silently accept it, so enforce the contract here)
        raise ValueError(f"block_b {block_b} must be a multiple of 8")
    if B % block_b:
        raise ValueError(f"pool size {B} not a multiple of {block_b}")
    nB = B // block_b
    if n_chunks is not None:
        # Bucketed ragged dispatch: only the first n_chunks batch-chunks
        # (covering every live slot — the scheduler allocates low slots
        # first) are computed; rows beyond get uninitialized outputs,
        # which the caller's live-masking never reads. Cuts per-step
        # cost ~linearly with pool occupancy.
        if not 1 <= n_chunks <= nB:
            raise ValueError(f"n_chunks {n_chunks} not in [1, {nB}]")
        nB = n_chunks
    L_enc = cross_k.shape[2]
    if l_enc_actual is None:
        l_enc_actual = L_enc
    D = cfg.d_model
    ff = cfg.dim_feedforward
    Vp = stacked["emb"].shape[0]
    Tp = stacked["pos_emb"].shape[0]
    G = jnp.asarray(_group_matrix(D, cfg.nhead, np.float32))
    Bc = block_b

    def fixed(shape):
        return pl.BlockSpec(shape, lambda l, b: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_layer(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda l, b: (l,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_chunk_col(width):                       # (B, 1) int32 columns
        return pl.BlockSpec((Bc, 1), lambda l, b: (b, 0),
                            memory_space=pltpu.VMEM)

    def per_layer_chunk(shape):                     # (L, B, ...) blocks
        return pl.BlockSpec((1, Bc) + shape,
                            lambda l, b: (l, b) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    if return_logits:
        out_specs = (
            pl.BlockSpec((Bc, Vp), lambda l, b: (b, 0),
                         memory_space=pltpu.VMEM),  # head logits
            per_layer_chunk((kvd,)),                # k_new
            per_layer_chunk((kvd,)),                # v_new
        )
        out_shape = (
            jax.ShapeDtypeStruct((B, Vp), jnp.float32),
            jax.ShapeDtypeStruct((L, B, kvd), self_k.dtype),
            jax.ShapeDtypeStruct((L, B, kvd), self_v.dtype),
        )
    else:
        out_specs = (
            pl.BlockSpec((Bc, 1), lambda l, b: (b, 0),
                         memory_space=pltpu.VMEM),  # next token ids
            pl.BlockSpec((Bc, 1), lambda l, b: (b, 0),
                         memory_space=pltpu.VMEM),  # chosen log-prob
            per_layer_chunk((kvd,)),                # k_new
            per_layer_chunk((kvd,)),                # v_new
        )
        out_shape = (
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((L, B, kvd), self_k.dtype),
            jax.ShapeDtypeStruct((L, B, kvd), self_v.dtype),
        )

    quantized = "w_qkv_s" in stacked
    ring_s = 0
    if ring_k is not None:
        if seg_start is None or ring_v is None:
            raise ValueError("ring mode needs seg_start, ring_k AND ring_v")
        ring_s = ring_k.shape[2]
    kernel = _make_kernel_ragged(cfg, Bc, T, L_enc, l_enc_actual, Vp, Tp,
                                 kvd, quantized=quantized,
                                 return_logits=return_logits,
                                 ring_s=ring_s)

    w_dims = {"w_qkv": (D, 2 * kvd + D), "w_out": (D, D), "w_cq": (D, D),
              "w_co": (D, D), "w_ff1": (D, ff), "w_ff2": (ff, D)}
    weight_specs, weight_args = [], []
    for k in WEIGHT_KEYS:
        weight_specs.append(per_layer(w_dims[k]))
        weight_args.append(stacked[k])
        if quantized:                       # per-column scales (L, 1, out)
            weight_specs.append(per_layer((1, w_dims[k][1])))
            weight_args.append(stacked[f"{k}_s"])
        weight_specs.append(per_layer((1, w_dims[k][1])))   # bias
        weight_args.append(stacked["b" + k[1:]])

    ring_specs, ring_args = [], []
    if ring_s:
        ring_specs = [
            per_chunk_col(Bc),              # seg_start
            per_layer_chunk((ring_s, kvd)),  # ring_k
            per_layer_chunk((ring_s, kvd)),  # ring_v
        ]
        ring_args = [jnp.asarray(seg_start, jnp.int32)[:, None],
                     ring_k, ring_v]

    outs = pl.pallas_call(
        kernel,
        grid=(L, nB),
        in_specs=[
            per_chunk_col(Bc),              # pos
            per_chunk_col(Bc),              # prev
            fixed((D, cfg.nhead)),          # G
            fixed((Vp, D)),                 # embedding table (f32)
            fixed((Tp, D)),                 # positional table (f32)
            *weight_specs,
            per_layer((6, D)),              # ln
            per_layer_chunk((T, kvd)),      # self_k
            per_layer_chunk((T, kvd)),      # self_v
            per_layer_chunk((L_enc, D)),    # cross_k
            per_layer_chunk((L_enc, D)),    # cross_v
            *ring_specs,
            fixed((D, Vp)),                 # w_head (f32)
            fixed((1, Vp)),                 # b_head (f32, pads -1e9)
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)],
        interpret=interpret,
        # Headroom for the MQA per-head path at large chunk sizes (the
        # default 16 MB scoped stack is ~5% short at Bc=64; v5e has
        # 128 MB VMEM) — see fused_decoder_layers_step_v2.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(jnp.asarray(pos, jnp.int32)[:, None],
      jnp.asarray(prev, jnp.int32)[:, None], G,
      stacked["emb"], stacked["pos_emb"],
      *weight_args,
      stacked["ln"], self_k, self_v, cross_k, cross_v,
      *ring_args,
      stacked["w_head"], stacked["b_head"])
    if return_logits:
        logits, k_out, v_out = outs
        return logits, k_out, v_out
    nxt, logp, k_out, v_out = outs
    return nxt[:, 0], logp[:, 0], k_out, v_out
