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

All intermediates live in VMEM; each band is read once from HBM and
written once.

Layout (Mosaic constraint): the band is window-partitioned OUTSIDE the
kernel into a flat token matrix (B, nWh, nWw*Npad, C) where Npad rounds
the window token count N=ws*ws up to the bf16 sublane tile (16), so
every in-kernel window access is a tile-aligned static slice of a 2-D
matrix — no in-kernel reshapes across the sublane dim (Mosaic rejects
e.g. (7,7,C)->(49,C) shape casts on hardware; the padded layout keeps
slice offsets multiples of 16). Padded tokens are zeros; they are
masked out of attention with -1e9 on the key axis and stripped after
the kernel. The qkv/proj/MLP matmuls see all nWw*Npad band tokens at
once, keeping the MXU fed; only the (Npad, Npad) score matmuls stay
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET_BYTES = 12 * 1024 * 1024

# Window token counts are padded to the bf16 sublane tile so static
# slices of the flat token matrix stay tile-aligned on hardware.
_SUBLANE = 16


def _pad_n(n: int) -> int:
    return ((n + _SUBLANE - 1) // _SUBLANE) * _SUBLANE


def fits_vmem(C: int, ws: int, W_pad: int, mlp_ratio: float = 4.0,
              bytes_per_el: int = 2) -> bool:
    """Conservative estimate: weights + band activations must fit VMEM."""
    hid = int(C * mlp_ratio)
    weights = (C * 3 * C + C * C + 2 * C * hid) * bytes_per_el
    tokens = (W_pad // ws) * _pad_n(ws * ws)
    acts = tokens * (3 * C * 4 + hid * 4 + 4 * C * bytes_per_el)
    return weights + acts < VMEM_BUDGET_BYTES


def _block_kernel(x_ref, bias_ref, mask_ref,
                  g1_ref, b1_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                  g2_ref, b2_ref, w1_ref, bm1_ref, w2_ref, bm2_ref,
                  out_ref, *, n_pad: int, nw: int, num_heads: int):
    """One (batch, window-row) band: x (1, 1, nw*n_pad, C) flat tokens."""
    f32 = jnp.float32
    tok_in = x_ref[0, 0]                           # (T, C) bf16
    T, C = tok_in.shape
    nh = num_heads
    dh = C // nh

    def layer_norm(t, g, b):
        tf = t.astype(f32)
        mu = jnp.mean(tf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(tf - mu), axis=-1, keepdims=True)
        return ((tf - mu) * jax.lax.rsqrt(var + 1e-5)
                * g.astype(f32) + b.astype(f32))

    # --- attention half -----------------------------------------------
    xn = layer_norm(tok_in, g1_ref[0], b1_ref[0]).astype(tok_in.dtype)
    qkv = jnp.dot(xn, wqkv_ref[...],
                  preferred_element_type=f32) + bqkv_ref[0].astype(f32)
    qkv = qkv.astype(tok_in.dtype)                 # (T, 3C)

    scale = 1.0 / (dh ** 0.5)
    attn_rows = []
    for j in range(nw):
        win = qkv[j * n_pad:(j + 1) * n_pad, :]    # (Npad, 3C)
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
        attn_rows.append(jnp.concatenate(heads, axis=-1))  # (Npad, C)
    attn = jnp.concatenate(attn_rows, axis=0)       # (T, C) f32
    proj = jnp.dot(attn.astype(tok_in.dtype), wo_ref[...],
                   preferred_element_type=f32) + bo_ref[0].astype(f32)
    x1 = tok_in + proj.astype(tok_in.dtype)

    # --- MLP half ------------------------------------------------------
    xn2 = layer_norm(x1, g2_ref[0], b2_ref[0]).astype(tok_in.dtype)
    h1 = jnp.dot(xn2, w1_ref[...],
                 preferred_element_type=f32) + bm1_ref[0].astype(f32)
    h1 = jax.nn.gelu(h1).astype(tok_in.dtype)  # approximate=True, as
    # models/layers.py::mlp uses jax.nn.gelu's default
    h2 = jnp.dot(h1, w2_ref[...],
                 preferred_element_type=f32) + bm2_ref[0].astype(f32)
    out_ref[0, 0] = x1 + h2.astype(tok_in.dtype)


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
    Npad = _pad_n(N)
    T = nWw * Npad

    # Window-partition to flat padded tokens: (B, nWh, nWw*Npad, C).
    xp = x.reshape(B, nWh, ws, nWw, ws, C).transpose(0, 1, 3, 2, 4, 5)
    xp = xp.reshape(B, nWh, nWw, N, C)
    if Npad != N:
        xp = jnp.pad(xp, ((0, 0),) * 3 + ((0, Npad - N), (0, 0)))
    xp = xp.reshape(B, nWh, T, C)

    rel_index = relative_position_index(ws).reshape(-1)
    bias = p["attn"]["rel_bias_table"][rel_index]
    bias = bias.reshape(N, N, num_heads).transpose(2, 0, 1)  # (nh, N, N)
    if Npad != N:
        bias = jnp.pad(bias, ((0, 0), (0, Npad - N), (0, Npad - N)))

    smask = shift_attention_mask(Hp, Wp, ws, shift_h, shift_w)
    if smask is None:
        mask = jnp.zeros((nWh, nWw, N, N), jnp.float32)
    else:
        mask = jnp.asarray(smask, jnp.float32).reshape(nWh, nWw, N, N)
    if Npad != N:
        # Padded tokens must never be attended to: -1e9 on the key axis.
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, Npad - N), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, 0), (0, Npad - N)),
                       constant_values=-1e9)

    dt = x.dtype
    row = lambda a: a.reshape(1, -1)   # noqa: E731 — biases/LN params
    # stay f32; the kernel accumulates them in f32 like the jnp path
    attn, mlp = p["attn"], p["mlp"]
    operands = [
        xp,
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
            pl.BlockSpec((1, 1, T, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            full(num_heads, Npad, Npad),
            pl.BlockSpec((1, nWw, Npad, Npad), lambda b, i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(1, C), full(1, C),
            full(C, 3 * C), full(1, 3 * C),
            full(C, C), full(1, C),
            full(1, C), full(1, C),
            full(C, hid), full(1, hid),
            full(hid, C), full(1, C),
        ],
        out_specs=pl.BlockSpec((1, 1, T, C), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_block_kernel, n_pad=Npad, nw=nWw,
                          num_heads=num_heads),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nWh, T, C), x.dtype),
        interpret=interpret,
    )(*operands)

    # Un-partition: strip token padding, restore (B, Hp, Wp, C).
    out = out.reshape(B, nWh, nWw, Npad, C)[:, :, :, :N, :]
    out = out.reshape(B, nWh, nWw, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(B, Hp, Wp, C)

    if shift_h or shift_w:
        out = jnp.roll(out, shift=(shift_h, shift_w), axis=(1, 2))
    if pad_b or pad_r:
        out = out[:, :H, :W, :]
    return out
