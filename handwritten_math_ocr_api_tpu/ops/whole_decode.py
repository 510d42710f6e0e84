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
- cross-attention K/V (precomputed, ~2.6 MB bf16) are VMEM-resident;
- only the growing self-attention KV cache lives in HBM, read back each
  step with chunk-granular DMA *gated on the current position* — chunks
  beyond ``pos`` are neither copied nor computed, so both DMA bytes and
  VPU work scale with the live prefix, not the padded T;
- the embedding gather, positional add, output head, argmax, log-prob
  and finished/eos bookkeeping all happen in-kernel (proven in the v4
  whole-step kernel, ops/fused_step.py:434), leaving ZERO XLA ops and
  ZERO extra launches per step.

The grid is a single program; the step loop is an in-kernel
``lax.fori_loop`` (always ``T_out`` iterations — no early-exit inside
the kernel; the worst-case full-length decode is exactly what bench.py
measures, and serving keeps the early-exit v2 path for short outputs).

Self-cache layout is TIME-major ``(L, T, B, D)`` (merged heads): Mosaic
keeps the last two dims tiled even for HBM refs, so per-row write-backs
and chunk reads must slice the untiled T axis (batch-major's 1-row T
slice fails tile alignment). Weight layout comes from ``build_stacked_full`` (+
``quantize_stacked`` for the int8-resident production configuration;
bf16-resident works for small configs / tests but does not fit VMEM at
the flagship size together with the buffers).

Numerics: identical matmul/LN semantics to the v2 kernel (f32
accumulate, f32 LN, int8 dequant on the matmul output); the chunked
attention applies softmax from a full (B, T, H) f32 logits buffer, so
the only divergence from v2 is the f32 summation order of the
probs*V reduction (chunk-ordered vs single reduce). Verified against
the v2q path in tests/test_whole_decode.py.

Reference behavior being replaced: the serving greedy loop
(/root/reference/app/src/im2latex.py:15-57) and batched greedy
(/root/reference/src/inference.py:7-25), re-imagined as a single TPU
program rather than a Python token loop.
"""

from __future__ import annotations

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
    H = cfg.nhead
    ff = cfg.dim_feedforward
    L = cfg.num_decoder_layers
    scale = 1.0 / (cfg.head_dim ** 0.5)
    n_chunks = T // CH
    wdt = jnp.dtype(cfg.dtype)

    def kernel(*refs):
        if quantized:
            (g_ref, emb_ref, pos_tab_ref, w_head_ref, b_head_ref,
             w_qkv, s_qkv, b_qkv, w_out, s_out, b_out,
             w_cq, s_cq, b_cq, w_co, s_co, b_co,
             w_ff1, s_ff1, b_ff1, w_ff2, s_ff2, b_ff2,
             ln, ck_ref, cv_ref, sk_in, sv_in,
             sk_out, sv_out, tok_out, lp_out, cnt_out,
             kbuf, vbuf, lg_scr, acc_scr, rows_k, rows_v, sems) = refs

            def mm(x, w, s):
                y = jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                return y * s
        else:
            (g_ref, emb_ref, pos_tab_ref, w_head_ref, b_head_ref,
             w_qkv, b_qkv, w_out, b_out, w_cq, b_cq, w_co, b_co,
             w_ff1, b_ff1, w_ff2, b_ff2,
             ln, ck_ref, cv_ref, sk_in, sv_in,
             sk_out, sv_out, tok_out, lp_out, cnt_out,
             kbuf, vbuf, lg_scr, acc_scr, rows_k, rows_v, sems) = refs
            s_qkv = s_out = s_cq = s_co = s_ff1 = s_ff2 = [None] * 0

            def mm(x, w, s):
                return jnp.dot(x.astype(w.dtype), w,
                               preferred_element_type=jnp.float32)

        G = g_ref[:].astype(jnp.float32)                    # (D, H)
        cdt = sk_out.dtype
        tok_out[...] = jnp.full((B, T), pad_id, jnp.int32)

        def scl(t, l):
            return t[l] if quantized else None

        def step_body(pos, carry):
            prev, fin, lp, cnt = carry  # (B,1) i32 / i32(0,1) / f32 / i32

            # ---- embedding + positional, in f32 then cast (jnp parity) --
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
                # -- gated chunk DMA of this layer's cached K/V prefix --
                # caches are TIME-major (L, T, B, D): chunk slices land on
                # the untiled T axis (HBM refs keep (B, D) tiling, so
                # slicing B or T-in-batch-major-layout by 1 is illegal)
                for c in range(n_chunks):
                    @pl.when(c * CH <= pos)
                    def _(c=c):
                        pltpu.make_async_copy(
                            sk_out.at[l, pl.ds(c * CH, CH)],
                            kbuf.at[pl.ds(c * CH, CH)],
                            sems.at[0]).start()
                        pltpu.make_async_copy(
                            sv_out.at[l, pl.ds(c * CH, CH)],
                            vbuf.at[pl.ds(c * CH, CH)],
                            sems.at[1]).start()

                # overlap: qkv projection while cache chunks stream
                qkv = mm(x, w_qkv[l], scl(s_qkv, l)) + b_qkv[l]
                q = qkv[:, :D]
                k_new = qkv[:, D:2 * D]
                v_new = qkv[:, 2 * D:]
                rows_k[pl.ds(l, 1)] = k_new.astype(cdt)[None, None, :, :]
                rows_v[pl.ds(l, 1)] = v_new.astype(cdt)[None, None, :, :]

                for c in range(n_chunks):
                    @pl.when(c * CH <= pos)
                    def _(c=c):
                        pltpu.make_async_copy(
                            sk_out.at[l, pl.ds(c * CH, CH)],
                            kbuf.at[pl.ds(c * CH, CH)],
                            sems.at[0]).wait()
                        pltpu.make_async_copy(
                            sv_out.at[l, pl.ds(c * CH, CH)],
                            vbuf.at[pl.ds(c * CH, CH)],
                            sems.at[1]).wait()

                # -- self-attention pass 1: logits per live chunk --
                q_s = q * scale                             # (B, D) f32
                slot = jax.lax.broadcasted_iota(jnp.int32, (T, B, 1), 0)
                for c in range(n_chunks):
                    @pl.when(c * CH <= pos)
                    def _(c=c):
                        kc = kbuf[c * CH:(c + 1) * CH].astype(
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
                        vc = vbuf[c * CH:(c + 1) * CH].astype(jnp.float32)
                        acc_scr[...] += jnp.sum(pd * vc, axis=0)
                # fresh-row term: probs at slot==pos (came from lnew) * v_new
                w_pos = jnp.sum(
                    jnp.where(slot == pos, lg_scr[...], 0.0), axis=0)  # (B,H)
                p_new = jnp.dot(w_pos, G.T,
                                preferred_element_type=jnp.float32)  # (B, D)
                attn = acc_scr[...] + p_new * v_new
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

            x = jax.lax.fori_loop(0, L, layer_body, x)

            # append this step's fresh K/V rows: one strided DMA per cache
            pltpu.make_async_copy(
                rows_k, sk_out.at[:, pl.ds(pos, 1)], sems.at[2]
            ).start()
            pltpu.make_async_copy(
                rows_v, sv_out.at[:, pl.ds(pos, 1)], sems.at[3]
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
                rows_k, sk_out.at[:, pl.ds(pos, 1)], sems.at[2]
            ).wait()
            pltpu.make_async_copy(
                rows_v, sv_out.at[:, pl.ds(pos, 1)], sems.at[3]
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
    # decoder_params only used for cross-K/V projection weights; rebuild a
    # minimal view from the stacked arrays is not possible (they hold only
    # self/ffn weights), so callers pass decoder params via stacked["_params"]
    dec_params = stacked.get("_params")
    if dec_params is None:
        raise ValueError("stacked must carry '_params' (see build_resident)")
    _bk, _bv, cross_k, cross_v = init_fused_cache(
        dec_params, cfg, memory, max_len=T_out)
    # TIME-major self caches (L, T, B, D): chunk reads and single-row
    # write-backs slice the untiled T axis (see _make_kernel)
    L, _, T, _ = _bk.shape
    cdt0 = _bk.dtype
    del _bk, _bv
    self_k = jnp.zeros((L, T, B, D), cdt0)
    self_v = jnp.zeros((L, T, B, D), cdt0)
    L_enc = cross_k.shape[2]
    CH = 32 if T % 32 == 0 else 16
    Vp = stacked["emb"].shape[0]
    Tp = stacked["pos_emb"].shape[0]
    H = cfg.nhead
    ff = cfg.dim_feedforward
    G = jnp.asarray(_group_matrix(D, cfg.nhead, np.float32))
    cdt = self_k.dtype

    def vmem():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    def hbm():
        # explicit HBM: pl.ANY lets Mosaic place the cache in VMEM, where
        # the single-row write-back slice breaks (16,128) tile alignment
        return pl.BlockSpec(memory_space=pltpu.HBM)

    # inputs: G, emb, pos_tab, w_head, b_head, <weights: 6x(w[,s],b)>, ln,
    #         ck, cv, sk, sv
    n_vmem = 5 + (18 if quantized else 12) + 1 + 2
    in_specs = [vmem()] * n_vmem + [hbm(), hbm()]
    i_sk = n_vmem
    out_specs = [hbm(), hbm(), vmem(), vmem(), vmem()]
    out_shape = [
        jax.ShapeDtypeStruct(self_k.shape, cdt),
        jax.ShapeDtypeStruct(self_v.shape, cdt),
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
    _, _, tokens, lp, cnt = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((T, B, D), cdt),           # kbuf (time-major)
            pltpu.VMEM((T, B, D), cdt),           # vbuf
            pltpu.VMEM((T, B, H), jnp.float32),   # logits/probs
            pltpu.VMEM((B, D), jnp.float32),      # attention accumulator
            pltpu.VMEM((L, 1, B, D), cdt),        # fresh K rows
            pltpu.VMEM((L, 1, B, D), cdt),        # fresh V rows
            pltpu.SemaphoreType.DMA((4,)),
        ],
        input_output_aliases={i_sk: 0, i_sk + 1: 1},
        interpret=interpret,
    )(G, stacked["emb"], stacked["pos_emb"], stacked["w_head"],
      stacked["b_head"], *weight_args(), stacked["ln"],
      cross_k, cross_v, self_k, self_v)

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
