"""Pallas TPU kernel: fused shifted-window attention core for the Swin
encoder.

Replaces the library attention the reference leaned on (torchvision's
CUDA-backed ``shifted_window_attention`` inside ``swin_t``,
reference: src/model_swin.py:17,40) with a TPU kernel: one program per
(window, head) computes ``softmax(QK^T * scale + bias + shift_mask) V``
entirely in VMEM — the (N, N) logit/probability tiles never round-trip to
HBM, and the relative-position bias + shift mask are pre-combined into one
additive operand (models/swin.py builds it; this kernel consumes it).

The qkv/output projections stay in XLA: they are dense matmuls the MXU
already runs at peak; the win here is fusing the bandwidth-bound
mask+bias+softmax chain between the two attention matmuls.

Equivalence with the jnp path (models/swin.py window_attention) is asserted
by tests in interpret mode on CPU and compiled on TPU.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models import layers


def _attn_kernel(q_ref, k_ref, v_ref, m_ref, out_ref):
    # blocks: q/k/v (1, N, dh); m (1, N, N); out (1, N, dh)
    q = q_ref[0].astype(jnp.float32)       # (N, dh)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    bias = m_ref[0].astype(jnp.float32)    # (N, N)
    dh = q.shape[-1]
    scale = 1.0 / (dh ** 0.5)

    logits = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias                                # (N, N)
    m = jnp.max(logits, axis=-1, keepdims=True)
    w = jnp.exp(logits - m)
    probs = w / jnp.sum(w, axis=-1, keepdims=True)
    out = jnp.dot(probs, v, preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def window_attention_core(q, k, v, mask, num_heads: int,
                          *, interpret: bool | None = None):
    """q, k, v: (B, nW, nh, N, dh); mask: (nW, nh, N, N) additive
    (relative bias + shift mask). Returns (B, nW, nh, N, dh)."""
    from . import default_interpret

    if interpret is None:
        interpret = default_interpret()
    B, nW, nh, N, dh = q.shape
    G = B * nW * nh
    qf = q.reshape(G, N, dh)
    kf = k.reshape(G, N, dh)
    vf = v.reshape(G, N, dh)
    mf = mask.reshape(nW * nh, N, N)
    per_batch = nW * nh

    grid_spec = pl.GridSpec(
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, N, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, N), lambda i: (i % per_batch, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, dh), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _attn_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, N, dh), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * G * N * N * dh,
            bytes_accessed=3 * G * N * dh * 2 + G * N * N * 4,
            transcendentals=G * N * N,
        ),
    )(qf, kf, vf, mf)
    return out.reshape(B, nW, nh, N, dh)


def fused_window_attention(p, windows, num_heads: int, mask, n_windows: int,
                           *, interpret: bool | None = None):
    """Drop-in for the jnp attention body in models/swin.py
    ``window_attention``: windows (B*nW, N, C), mask (nW, nh, N, N) or
    (1, nh, N, N); returns (B*nW, N, C) after the output projection."""
    BW, N, C = windows.shape
    B = BW // n_windows
    dh = C // num_heads

    w = p["w_qkv"].astype(windows.dtype)
    b = p["b_qkv"].astype(windows.dtype)
    qkv = jnp.dot(windows, w, preferred_element_type=windows.dtype) + b
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(x):
        return layers.split_heads(x, num_heads).reshape(
            B, n_windows, num_heads, N, dh)

    mask_full = jnp.broadcast_to(
        mask, (n_windows, num_heads, N, N)).astype(jnp.float32)
    out = window_attention_core(heads(q), heads(k), heads(v), mask_full,
                                num_heads, interpret=interpret)
    out = layers.merge_heads(out.reshape(B * n_windows, num_heads, N, dh))
    return layers.linear({"w": p["w_out"], "b": p["b_out"]}, out)
