"""Pallas TPU megakernel: one launch per whole Swin block.

Round-2 close-out left the Swin-T encoder at ~3% MFU / 4.4 ms for a
batch-10 encode — 44% of end-to-end decode — with XLA beating the
narrow window-attention kernel (ops/window_attention.py) on these
shapes. The remaining costs in XLA's schedule are *around* the matmuls:
window partition/unpartition transposes, rolls, pad/slice, LN/softmax
round-trips, and a few hundred kernel launches per trunk forward.

This kernel runs an ENTIRE Swin block (reference semantics:
torchvision SwinTransformerBlock, consumed via src/model_swin.py:17) in
one Pallas launch per (batch, window-row) band:

    LN1 -> qkv -> per-window MHA (+rel-bias, +shift mask) -> proj
        -> +residual -> LN2 -> MLP(gelu) -> +residual

All intermediates live in VMEM; the (ws, W_pad, C) band is read once
from HBM and written once. Window partitioning becomes static slices of
the band (no transposes); the shifted case is a pre-kernel jnp.roll.

The qkv/proj/MLP matmuls see ws*W_pad tokens at once (588 rows at
stage 1), keeping the MXU fed; only the (N, N) score matmuls stay
window-small, and those run back-to-back in VMEM.

Stage 4 of Swin-T (C=768) would need ~14 MB of VMEM weights alone, so
callers gate on `fits_vmem` (stages 1-3 fuse; stage 4 stays on XLA).

Equivalence vs models/swin.py::swin_block is asserted in interpret mode
on CPU and compiled on TPU (tests/test_swin_block_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def fits_vmem(C: int, ws: int, W_pad: int, mlp_ratio: float = 4.0,
              bytes_per_el: int = 2) -> bool:
    """Conservative estimate: weights + band activations must fit VMEM."""
    hid = int(C * mlp_ratio)
    weights = (C * 3 * C + C * C + 2 * C * hid) * bytes_per_el
    tokens = ws * W_pad
    acts = tokens * (3 * C * 4 + hid * 4 + 4 * C * bytes_per_el)
    return weights + acts < VMEM_BUDGET_BYTES


def _block_kernel(x_ref, bias_ref, mask_ref,
                  g1_ref, b1_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                  g2_ref, b2_ref, w1_ref, bm1_ref, w2_ref, bm2_ref,
                  out_ref, *, ws: int, num_heads: int):
    """One (batch, window-row) band: x (1, ws, W_pad, C)."""
    f32 = jnp.float32
    x = x_ref[0]                                   # (ws, Wp, C) bf16
    ws_, Wp, C = x.shape
    N = ws * ws
    nW = Wp // ws
    nh = num_heads
    dh = C // nh
    T = ws_ * Wp

    def layer_norm(t, g, b):
        tf = t.astype(f32)
        mu = jnp.mean(tf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(tf - mu), axis=-1, keepdims=True)
        return ((tf - mu) * jax.lax.rsqrt(var + 1e-5)
                * g.astype(f32) + b.astype(f32))

    # --- attention half -----------------------------------------------
    xn = layer_norm(x, g1_ref[0], b1_ref[0]).astype(x.dtype)
    tok = xn.reshape(T, C)
    qkv = jnp.dot(tok, wqkv_ref[...],
                  preferred_element_type=f32) + bqkv_ref[0].astype(f32)
    qkv = qkv.astype(x.dtype).reshape(ws_, Wp, 3 * C)

    scale = 1.0 / (dh ** 0.5)
    attn_cols = []
    for j in range(nW):
        win = qkv[:, j * ws:(j + 1) * ws, :].reshape(N, 3 * C)
        heads = []
        for h in range(nh):
            qh = win[:, h * dh:(h + 1) * dh].astype(f32)
            kh = win[:, C + h * dh:C + (h + 1) * dh].astype(f32)
            vh = win[:, 2 * C + h * dh:2 * C + (h + 1) * dh].astype(f32)
            logits = jax.lax.dot_general(
                qh * scale, kh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            logits = (logits + bias_ref[h].astype(f32)
                      + mask_ref[0, j].astype(f32))
            m = jnp.max(logits, axis=-1, keepdims=True)
            w = jnp.exp(logits - m)
            probs = w / jnp.sum(w, axis=-1, keepdims=True)
            heads.append(jnp.dot(probs, vh, preferred_element_type=f32))
        attn_cols.append(
            jnp.concatenate(heads, axis=-1).reshape(ws_, ws, C))
    attn = jnp.concatenate(attn_cols, axis=1)       # (ws, Wp, C) f32
    attn = attn.astype(x.dtype).reshape(T, C)
    proj = jnp.dot(attn, wo_ref[...],
                   preferred_element_type=f32) + bo_ref[0].astype(f32)
    x1 = x + proj.astype(x.dtype).reshape(ws_, Wp, C)

    # --- MLP half ------------------------------------------------------
    xn2 = layer_norm(x1, g2_ref[0], b2_ref[0]).astype(x.dtype)
    h1 = jnp.dot(xn2.reshape(T, C), w1_ref[...],
                 preferred_element_type=f32) + bm1_ref[0].astype(f32)
    h1 = jax.nn.gelu(h1).astype(x.dtype)  # approximate=True, as
    # models/layers.py::mlp uses jax.nn.gelu's default
    h2 = jnp.dot(h1, w2_ref[...],
                 preferred_element_type=f32) + bm2_ref[0].astype(f32)
    out_ref[0] = x1 + h2.astype(x.dtype).reshape(ws_, Wp, C)


def fused_swin_block(p, x, ws: int, shift: int, num_heads: int,
                     *, interpret: bool | None = None):
    """Whole Swin block as one Pallas launch per (batch, window-row).

    p: swin block params (models/swin.py::_block_init layout).
    x: (B, H, W, C). Returns (B, H, W, C) — same numerics as
    models/swin.py::swin_block with deterministic=True, sd_rate=0.
    """
    from . import default_interpret
    from ..models.swin import relative_position_index, shift_attention_mask

    if interpret is None:
        interpret = default_interpret()

    B, H, W, C = x.shape
    pad_b = (ws - H % ws) % ws
    pad_r = (ws - W % ws) % ws
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    Hp, Wp = H + pad_b, W + pad_r
    shift_h = 0 if ws >= Hp else shift
    shift_w = 0 if ws >= Wp else shift
    if shift_h or shift_w:
        x = jnp.roll(x, shift=(-shift_h, -shift_w), axis=(1, 2))

    nWh, nWw = Hp // ws, Wp // ws
    N = ws * ws

    rel_index = relative_position_index(ws).reshape(-1)
    bias = p["attn"]["rel_bias_table"][rel_index]
    bias = bias.reshape(N, N, num_heads).transpose(2, 0, 1)  # (nh, N, N)

    smask = shift_attention_mask(Hp, Wp, ws, shift_h, shift_w)
    if smask is None:
        mask = jnp.zeros((nWh, nWw, N, N), jnp.float32)
    else:
        mask = jnp.asarray(smask, jnp.float32).reshape(nWh, nWw, N, N)

    dt = x.dtype
    row = lambda a: a.reshape(1, -1)   # noqa: E731 — biases/LN params
    # stay f32; the kernel accumulates them in f32 like the jnp path
    attn, mlp = p["attn"], p["mlp"]
    operands = [
        x,
        bias.astype(jnp.float32),
        mask,
        row(p["norm1"]["scale"]), row(p["norm1"]["bias"]),
        attn["w_qkv"].astype(dt), row(attn["b_qkv"]),
        attn["w_out"].astype(dt), row(attn["b_out"]),
        row(p["norm2"]["scale"]), row(p["norm2"]["bias"]),
        mlp["fc1"]["w"].astype(dt), row(mlp["fc1"]["b"]),
        mlp["fc2"]["w"].astype(dt), row(mlp["fc2"]["b"]),
    ]
    hid = mlp["fc1"]["w"].shape[1]

    full = lambda *s: pl.BlockSpec(s, lambda b, i: (0,) * len(s),  # noqa
                                   memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(B, nWh),
        in_specs=[
            pl.BlockSpec((1, ws, Wp, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            full(num_heads, N, N),
            pl.BlockSpec((1, nWw, N, N), lambda b, i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(1, C), full(1, C),
            full(C, 3 * C), full(1, 3 * C),
            full(C, C), full(1, C),
            full(1, C), full(1, C),
            full(C, hid), full(1, hid),
            full(hid, C), full(1, C),
        ],
        out_specs=pl.BlockSpec((1, ws, Wp, C), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_block_kernel, ws=ws, num_heads=num_heads),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp, C), x.dtype),
        interpret=interpret,
    )(*operands)

    if shift_h or shift_w:
        out = jnp.roll(out, shift=(shift_h, shift_w), axis=(1, 2))
    if pad_b or pad_r:
        out = out[:, :H, :W, :]
    return out
