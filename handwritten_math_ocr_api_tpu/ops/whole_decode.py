"""Whole-decode Pallas megakernel (v5): the ENTIRE greedy decode loop in
ONE kernel launch, with the decoder weights resident in VMEM.

Why: the per-step kernels (ops/fused_step.py v1-v4) re-stream every
decoder weight from HBM on every one of the ~150 decode steps (10.8 MB
per step at the flagship size) and pay per-step launch + XLA-op overhead;
measured ~53 us/step at batch 10 against a ~32 us/step HBM floor
(BENCHMARKS.md). Running the full autoregressive loop *inside* one Pallas
program inverts the memory equation:

- weights stream HBM->VMEM ONCE per decode (int8-quantized they fit
  comfortably: ~5.2 MB + scales), not once per step;
- cross-attention K/V (precomputed, ~4 MB bf16 at the padded batch) are
  VMEM-resident;
- only the growing self-attention KV cache lives in HBM — ONE merged
  (L, T, B, 2D) array holding K and V side by side in lanes, read back
  each step with ONE DMA per layer whose length is selected from four
  static prefix buckets (T/4, T/2, 3T/4, T) by the current position, so
  DMA bytes scale with the live prefix and the per-step DMA count stays
  at 8 reads + 1 row write-back;
- the read for layer l+1 is issued right after layer l's attention has
  consumed the landing buffer, so it overlaps cross-attention + FFN
  compute (cross-layer pipelining with a single buffer);
- the embedding gather, positional add, output head, argmax, log-prob
  and finished/eos bookkeeping all happen in-kernel (proven in the v4
  whole-step kernel, ops/fused_step.py:434), leaving ZERO XLA ops and
  ZERO extra launches per step.

The grid is a single program; the step loop is an in-kernel
``lax.fori_loop`` (always ``T_out`` iterations — no early-exit inside
the kernel; the worst-case full-length decode is exactly what bench.py
measures, and serving keeps the early-exit v2 path for short outputs).

Self-cache layout is TIME-major ``(L, T, B, 2D)`` (merged heads, K then
V in lanes): Mosaic keeps the last two dims tiled even for HBM refs, so
per-row write-backs and prefix reads must slice the untiled T axis, and
the batch dim must be padded to 16 for full-B slices to stay
tile-aligned (the driver pads and un-pads; MXU/VPU tiles were already
16-row padded, so the cost is confined to DMA bytes).

Numerics: identical matmul/LN semantics to the v2 kernel (f32
accumulate, f32 LN, int8 dequant on the matmul output); the chunked
attention applies softmax from a full (T, B, H) f32 logits buffer, so
the only divergence from v2 is the f32 summation order of the
probs*V reduction (chunk-ordered vs single reduce). Verified against
the jnp greedy path in tests/test_whole_decode.py.

Reference behavior being replaced: the serving greedy loop
(/root/reference/app/src/im2latex.py:15-57) and batched greedy
(/root/reference/src/inference.py:7-25), re-imagined as a single TPU
program rather than a Python token loop.

**Status: EXPERIMENTAL — measured at parity with v2, not faster.**
Device-chained A/B on v5e (batch 10, full 150-step decode, encoder
subtracted): v5 loop ~54 us/step vs v2's ~51; at batch 1 v5 loses
clearly (11.0 vs 7.9 ms/decode — the mandatory 16-row batch padding
wastes 15/16 of every VPU/DMA tile). The weight-residency saving
(~13 us/step of HBM traffic) is real but fully consumed by what the
per-step grid path gets for free: Mosaic's software-pipelined block DMA
and per-program scheduling. A/B ablations that did NOT close the gap:
DMA count 5x reduction (merged K/V + bucket-selected single read per
layer: 91 -> 85 us/step), cross-layer DMA/compute overlap, static
layer unroll (85 -> 83). Production stays on v2 (SERVING_USE_FUSED);
this module is kept as a correct, tested design probe with the Mosaic
constraints documented above. A/B levers: MATHOCR_V5_CH (DMA/compute
chunk rows), MATHOCR_V5_UNROLL=1 (static layer unroll).
"""

from __future__ import annotations

import os
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import EOS_ID, ModelConfig, PAD_ID, SOS_ID
from .fused_step import _group_matrix, _ln, _round_up

NEG = -1.0e30  # softmax mask fill; exp(NEG - m) underflows to exactly 0


class WholeDecodeOut(NamedTuple):
    tokens: jax.Array       # (B, T) int32, PAD after eos
    lengths: jax.Array      # (B,) int32, non-pad count (incl. eos)
    logprob_sum: jax.Array  # (B,) f32 sum of chosen log-probs
    token_count: jax.Array  # (B,) int32 non-eos emitted tokens


def _make_kernel(cfg: ModelConfig, B: int, T: int, T_out: int, L_enc: int,
                 l_enc_actual: int, Vp: int, Tp: int, CH: int,
                 quantized: bool, sos_id: int, eos_id: int, pad_id: int):
    D = cfg.d_model
    L = cfg.num_decoder_layers
    scale = 1.0 / (cfg.head_dim ** 0.5)
    n_chunks = T // CH
    wdt = jnp.dtype(cfg.dtype)
    # prefix buckets for the per-layer cache read: one DMA, length picked
    # by the live prefix (pos); strictly increasing, last covers T
    buckets = sorted({max(T // 4, 1), max(T // 2, 1), max(3 * T // 4, 1), T})

    def kernel(*refs):
        if quantized:
            (g_ref, emb_ref, pos_tab_ref, w_head_ref, b_head_ref,
             w_qkv, s_qkv, b_qkv, w_out, s_out, b_out,
             w_cq, s_cq, b_cq, w_co, s_co, b_co,
             w_ff1, s_ff1, b_ff1, w_ff2, s_ff2, b_ff2,
             ln, ck_ref, cv_ref, skv_in,
             skv_out, tok_out, lp_out, cnt_out,
             kvbuf, lg_scr, acc_scr, rows, sems) = refs

            def mm(x, w, s):
                y = jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                return y * s
        else:
            (g_ref, emb_ref, pos_tab_ref, w_head_ref, b_head_ref,
             w_qkv, b_qkv, w_out, b_out, w_cq, b_cq, w_co, b_co,
             w_ff1, b_ff1, w_ff2, b_ff2,
             ln, ck_ref, cv_ref, skv_in,
             skv_out, tok_out, lp_out, cnt_out,
             kvbuf, lg_scr, acc_scr, rows, sems) = refs
            s_qkv = s_out = s_cq = s_co = s_ff1 = s_ff2 = None

            def mm(x, w, s):
                return jnp.dot(x.astype(w.dtype), w,
                               preferred_element_type=jnp.float32)

        G = g_ref[:].astype(jnp.float32)                    # (D, H)
        cdt = skv_out.dtype
        tok_out[...] = jnp.full((B, T), pad_id, jnp.int32)

        def scl(t, l):
            return t[l] if quantized else None

        def kv_dma(l, p):
            """The bucket-selected prefix copy for layer ``l`` at position
            ``p`` — exactly one bucket condition fires."""
            def mk(hi):
                return pltpu.make_async_copy(
                    skv_out.at[l, pl.ds(0, hi)],
                    kvbuf.at[pl.ds(0, hi)],
                    sems.at[0])
            conds = []
            for bi, hi in enumerate(buckets):
                lo = buckets[bi - 1] if bi else 0
                cond = (p <= hi) if bi == 0 else ((p > lo) & (p <= hi))
                conds.append((cond, hi))
            return conds, mk

        def start_kv(l, p):
            conds, mk = kv_dma(l, p)
            for cond, hi in conds:
                @pl.when(cond)
                def _(hi=hi):
                    mk(hi).start()

        def wait_kv(l, p):
            conds, mk = kv_dma(l, p)
            for cond, hi in conds:
                @pl.when(cond)
                def _(hi=hi):
                    mk(hi).wait()

        def step_body(pos, carry):
            prev, fin, lp, cnt = carry  # (B,1) i32 / i32(0,1) / f32 / i32
            start_kv(0, pos)

            # ---- embedding + positional, in f32 then cast (jnp parity);
            # overlaps layer 0's cache DMA ----
            iota_v = jax.lax.broadcasted_iota(jnp.int32, (B, Vp), 1)
            onehot = (iota_v == prev).astype(jnp.float32)   # (B, Vp)
            x0 = jnp.dot(onehot, emb_ref[:],
                         preferred_element_type=jnp.float32)  # (B, D)
            iota_p = jax.lax.broadcasted_iota(jnp.int32, (1, Tp), 1)
            oh_pos = (iota_p == pos).astype(jnp.float32)
            pos_row = jnp.dot(oh_pos, pos_tab_ref[:],
                              preferred_element_type=jnp.float32)  # (1, D)
            x = (x0 + pos_row).astype(wdt).astype(jnp.float32)

            def layer_body(l, x):
                # qkv projection overlaps this layer's cache DMA
                qkv = mm(x, w_qkv[l], scl(s_qkv, l)) + b_qkv[l]
                q = qkv[:, :D]
                k_new = qkv[:, D:2 * D]
                v_new = qkv[:, 2 * D:]
                rows[pl.ds(l, 1)] = jnp.concatenate(
                    [k_new, v_new], axis=-1).astype(cdt)[None, None, :, :]

                wait_kv(l, pos)

                # -- self-attention pass 1: logits per live chunk --
                q_s = q * scale                             # (B, D) f32
                slot = jax.lax.broadcasted_iota(jnp.int32, (T, B, 1), 0)
                for c in range(n_chunks):
                    @pl.when(c * CH <= pos)
                    def _(c=c):
                        kc = kvbuf[c * CH:(c + 1) * CH, :, :D].astype(
                            jnp.float32)                    # (CH, B, D)
                        prod = q_s[None, :, :] * kc
                        lg = jax.lax.dot_general(
                            prod, G,
                            dimension_numbers=(((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (CH,B,H)
                        lg_scr[pl.ds(c * CH, CH)] = lg
                # mask dead slots (incl. skipped chunks' stale rows), then
                # overwrite the ``pos`` row with the fresh-row logits
                lnew = jnp.dot(q_s * k_new, G,
                               preferred_element_type=jnp.float32)  # (B, H)
                lg = jnp.where(slot < pos, lg_scr[...], NEG)
                lg = jnp.where(slot == pos, lnew[None, :, :], lg)
                m = jnp.max(lg, axis=0, keepdims=True)      # (1, B, H)
                w = jnp.exp(lg - m)
                lg_scr[...] = w / jnp.sum(w, axis=0, keepdims=True)

                # -- pass 2: probs @ V per live chunk, accumulated --
                acc_scr[...] = jnp.zeros((B, D), jnp.float32)
                for c in range(n_chunks):
                    @pl.when(c * CH <= pos)
                    def _(c=c):
                        pc = lg_scr[c * CH:(c + 1) * CH]    # (CH, B, H)
                        pd = jax.lax.dot_general(
                            pc, G,
                            dimension_numbers=(((2,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (CH,B,D)
                        vc = kvbuf[c * CH:(c + 1) * CH, :, D:].astype(
                            jnp.float32)
                        # rows past the DMA'd prefix hold garbage; their
                        # probs are 0 but 0*NaN = NaN — mask V explicitly.
                        # (fresh iota, not a slice of ``slot``: Mosaic's
                        # vector_extract_strided_slice crashes on slicing
                        # the (T, B, 1) iota inside scf.if)
                        slc = jax.lax.broadcasted_iota(
                            jnp.int32, (CH, B, 1), 0) + c * CH
                        vc = jnp.where(slc < pos, vc, 0.0)
                        acc_scr[...] += jnp.sum(pd * vc, axis=0)
                # fresh-row term: probs at slot==pos (came from lnew) * v_new
                w_pos = jnp.sum(
                    jnp.where(slot == pos, lg_scr[...], 0.0), axis=0)  # (B,H)
                p_new = jnp.dot(w_pos, G.T,
                                preferred_element_type=jnp.float32)  # (B, D)
                attn = acc_scr[...] + p_new * v_new

                # the landing buffer is free now: issue the NEXT layer's
                # cache read so it overlaps cross-attention + FFN compute
                @pl.when(l < L - 1)
                def _():
                    start_kv(l + 1, pos)

                sa = mm(attn, w_out[l], scl(s_out, l)) + b_out[l]
                x = _ln(x + sa, ln[l, 0], ln[l, 1])

                # -- cross-attention (VMEM-resident K/V) --
                qc = mm(x, w_cq[l], scl(s_cq, l)) + b_cq[l]
                ckf = ck_ref[l].astype(jnp.float32)         # (B, L_enc, D)
                cvf = cv_ref[l].astype(jnp.float32)
                prod_c = (qc * scale)[:, None, :] * ckf
                logits_c = jax.lax.dot_general(
                    prod_c, G, dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)     # (B, L_enc, H)
                if l_enc_actual < L_enc:
                    slot_c = jax.lax.broadcasted_iota(
                        jnp.int32, (B, L_enc, 1), 1)
                    logits_c = jnp.where(slot_c < l_enc_actual, logits_c,
                                         NEG)
                mc = jnp.max(logits_c, axis=1, keepdims=True)
                wc = jnp.exp(logits_c - mc)
                probs_c = wc / jnp.sum(wc, axis=1, keepdims=True)
                probs_cd = jax.lax.dot_general(
                    probs_c, G, dimension_numbers=(((2,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                attn_c = jnp.sum(probs_cd * cvf, axis=1)    # (B, D)
                ca = mm(attn_c, w_co[l], scl(s_co, l)) + b_co[l]
                x = _ln(x + ca, ln[l, 2], ln[l, 3])

                # -- FFN --
                h = mm(x, w_ff1[l], scl(s_ff1, l)) + b_ff1[l]
                h = jnp.maximum(h, 0.0)
                f = mm(h, w_ff2[l], scl(s_ff2, l)) + b_ff2[l]
                return _ln(x + f, ln[l, 4], ln[l, 5])

            if os.environ.get("MATHOCR_V5_UNROLL", "0") == "1":
                # static unroll: weight indices become compile-time
                # constants (A/B lever vs the dynamic-index fori)
                for li in range(L):
                    x = layer_body(li, x)
            else:
                x = jax.lax.fori_loop(0, L, layer_body, x)

            # append this step's fresh K/V rows: ONE strided DMA
            pltpu.make_async_copy(
                rows, skv_out.at[:, pl.ds(pos, 1)], sems.at[1]
            ).start()

            # ---- output head (overlaps the row write-back) ----
            logits_v = jnp.dot(x, w_head_ref[:],
                               preferred_element_type=jnp.float32)
            logits_v = logits_v + b_head_ref[:]             # (B, Vp)
            mv = jnp.max(logits_v, axis=-1, keepdims=True)
            se = jnp.sum(jnp.exp(logits_v - mv), axis=-1, keepdims=True)
            iota = jax.lax.broadcasted_iota(jnp.int32, (B, Vp), 1)
            nxt = jnp.min(jnp.where(logits_v >= mv, iota, Vp), axis=-1,
                          keepdims=True).astype(jnp.int32)  # (B, 1)
            logp = jnp.log(jnp.exp(mv - (mv + jnp.log(se))) + 1e-10)

            # ---- finished/eos bookkeeping (decode/fused.py semantics) ----
            is_eos = (nxt == eos_id).astype(jnp.int32)
            lp = lp + jnp.where(fin == 1, 0.0, logp)
            cnt = cnt + jnp.where((fin | is_eos) == 1, 0, 1)
            emit = jnp.where(fin == 1, pad_id, nxt)         # (B, 1)
            iota_t = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
            tok_out[...] = jnp.where(iota_t == pos, emit, tok_out[...])
            fin = fin | is_eos
            prev = jnp.where(fin == 1, eos_id, nxt)

            pltpu.make_async_copy(
                rows, skv_out.at[:, pl.ds(pos, 1)], sems.at[1]
            ).wait()
            return prev, fin, lp, cnt

        prev0 = jnp.full((B, 1), sos_id, jnp.int32)
        fin0 = jnp.zeros((B, 1), jnp.int32)
        lp0 = jnp.zeros((B, 1), jnp.float32)
        cnt0 = jnp.zeros((B, 1), jnp.int32)
        _, _, lp, cnt = jax.lax.fori_loop(
            0, T_out, step_body, (prev0, fin0, lp0, cnt0))
        lp_out[...] = lp
        cnt_out[...] = cnt

    return kernel


def fused_whole_decode(stacked, cfg: ModelConfig, memory,
                       max_len: int | None = None, *,
                       sos_id: int = SOS_ID, eos_id: int = EOS_ID,
                       pad_id: int = PAD_ID,
                       interpret: bool | None = None) -> WholeDecodeOut:
    """Full greedy decode in one kernel launch.

    ``stacked``: :func:`~.fused_step.build_stacked_full` output, optionally
    :func:`~.fused_step.quantize_stacked`-ed (required at flagship size —
    bf16-resident weights exceed VMEM alongside the cache buffers).
    ``memory``: (B, L_enc, D) encoder output.
    """
    from . import default_interpret
    from ..decode.fused import init_fused_cache

    if interpret is None:
        interpret = default_interpret()
    quantized = "w_qkv_s" in stacked
    B_in, l_enc_actual, D = memory.shape
    T_out = max_len or cfg.max_seq_len
    # Mosaic tiles the last two dims of every ref (even HBM) in (8, 128)
    # sublane-pairs; a B that is not a multiple of 16 makes the full-B
    # cache/buffer slices tile-misaligned. Pad the batch dim — the MXU/VPU
    # tiles were already padded to 16 rows internally, so this costs ~0.
    B = _round_up(B_in, 16)
    if B != B_in:
        memory = jnp.pad(memory, ((0, B - B_in), (0, 0), (0, 0)))
    # cross-K/V projection needs the raw decoder params; callers pass them
    # via stacked["_params"] (see build_resident)
    dec_params = stacked.get("_params")
    if dec_params is None:
        raise ValueError("stacked must carry '_params' (see build_resident)")
    _bk, _bv, cross_k, cross_v = init_fused_cache(
        dec_params, cfg, memory, max_len=T_out)
    # TIME-major merged self cache (L, T, B, 2D): K in lanes [0, D),
    # V in [D, 2D) — one bucket-selected DMA per layer reads both
    L, _, T, _ = _bk.shape
    cdt = _bk.dtype
    del _bk, _bv
    self_kv = jnp.zeros((L, T, B, 2 * D), cdt)
    L_enc = cross_k.shape[2]
    CH = int(os.environ.get("MATHOCR_V5_CH", "0")) or (
        32 if T % 32 == 0 else 16)
    assert T % CH == 0, (T, CH)
    Vp = stacked["emb"].shape[0]
    Tp = stacked["pos_emb"].shape[0]
    H = cfg.nhead
    G = jnp.asarray(_group_matrix(D, cfg.nhead, np.float32))

    def vmem():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    def hbm():
        # explicit HBM: pl.ANY lets Mosaic place the cache in VMEM, where
        # the single-row write-back slice breaks (16,128) tile alignment
        return pl.BlockSpec(memory_space=pltpu.HBM)

    # inputs: G, emb, pos_tab, w_head, b_head, <weights: 6x(w[,s],b)>, ln,
    #         ck, cv, skv
    n_vmem = 5 + (18 if quantized else 12) + 1 + 2
    in_specs = [vmem()] * n_vmem + [hbm()]
    i_skv = n_vmem
    out_specs = [hbm(), vmem(), vmem(), vmem()]
    out_shape = [
        jax.ShapeDtypeStruct(self_kv.shape, cdt),
        jax.ShapeDtypeStruct((B, T), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
    ]

    def weight_args():
        keys = ("w_qkv", "w_out", "w_cq", "w_co", "w_ff1", "w_ff2")
        bias = ("b_qkv", "b_out", "b_cq", "b_co", "b_ff1", "b_ff2")
        args = []
        for k, b in zip(keys, bias):
            args.append(stacked[k])
            if quantized:
                args.append(stacked[f"{k}_s"])
            args.append(stacked[b])
        return args

    kernel = _make_kernel(cfg, B, T, T_out, L_enc, l_enc_actual, Vp, Tp,
                          CH, quantized, sos_id, eos_id, pad_id)
    _, tokens, lp, cnt = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((T, B, 2 * D), cdt),       # merged K/V landing buf
            pltpu.VMEM((T, B, H), jnp.float32),   # logits/probs
            pltpu.VMEM((B, D), jnp.float32),      # attention accumulator
            pltpu.VMEM((L, 1, B, 2 * D), cdt),    # fresh K/V rows
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={i_skv: 0},
        interpret=interpret,
    )(G, stacked["emb"], stacked["pos_emb"], stacked["w_head"],
      stacked["b_head"], *weight_args(), stacked["ln"],
      cross_k, cross_v, self_kv)

    # drop cache-tile padding columns and batch padding rows
    tokens = tokens[:B_in, :T_out]
    lengths = jnp.sum(tokens != pad_id, axis=-1)
    return WholeDecodeOut(tokens, lengths, lp[:B_in, 0], cnt[:B_in, 0])


def build_resident(decoder_params, cfg: ModelConfig,
                   quantize: bool = True) -> Dict[str, jax.Array]:
    """Weight bundle for :func:`fused_whole_decode`: stacked + head tables
    (+ int8 quantization for VMEM residency), plus the raw params needed
    for the cross-K/V projection at decode entry."""
    from .fused_step import build_stacked_full, quantize_stacked

    st = build_stacked_full(decoder_params, cfg)
    if quantize:
        st = quantize_stacked(st)
    st = dict(st)
    st["_params"] = decoder_params
    return st
