"""Pallas TPU kernel: single-query decode attention over the KV cache.

The decode hot loop executes this op 8 layers x up to 150 steps per decoded
sequence (decoder_step in models/decoder.py). The kernel fuses mask
construction + QK^T + softmax + PV into one VMEM-resident pass per
(batch, head) program: the cache block is streamed HBM->VMEM once and both
reductions run on-chip, instead of XLA materializing the (B, H, 1, T)
logits and probability tensors in HBM between ops.

Shapes: q (B, H, 1, Dh); k, v (B, H, T, Dh); ``pos`` (scalar-prefetch)
marks the last valid cache slot — slots > pos are masked to -inf exactly
like the jnp path (models/decoder.py decoder_step), which tests assert
against (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(pos_ref, q_ref, k_ref, v_ref, out_ref):
    # blocks: q (1, 1, Dh); k, v (1, T, Dh); out (1, 1, Dh)
    q = q_ref[0].astype(jnp.float32)                 # (1, Dh)
    k = k_ref[0].astype(jnp.float32)                 # (T, Dh)
    v = v_ref[0].astype(jnp.float32)                 # (T, Dh)
    T, dh = k.shape

    scale = 1.0 / (dh ** 0.5)
    logits = jnp.sum(k * (q * scale), axis=1, keepdims=True)   # (T, 1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    pos = pos_ref[0]
    logits = jnp.where(slot <= pos, logits, -jnp.inf)

    m = jnp.max(logits)
    w = jnp.exp(logits - m)                                    # (T, 1)
    probs = w / jnp.sum(w)
    out = jnp.sum(v * probs, axis=0, keepdims=True)            # (1, Dh)
    out_ref[0] = out.astype(out_ref.dtype)


def decode_attention(q, k, v, pos, *, interpret: bool | None = None):
    """q: (B, H, 1, Dh); k, v: (B, H, T, Dh); pos: scalar int32.

    Returns (B, H, 1, Dh) attention output, numerically equal to
    ``layers.attention(q, k, v, additive_mask(slot <= pos))``.
    """
    from . import default_interpret

    if interpret is None:
        interpret = default_interpret()
    B, H, _, Dh = q.shape
    T = k.shape[2]
    qf = q.reshape(B * H, 1, Dh)
    kf = k.reshape(B * H, T, Dh)
    vf = v.reshape(B * H, T, Dh)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, 1, Dh), lambda i, pos_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, Dh), lambda i, pos_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, Dh), lambda i, pos_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Dh), lambda i, pos_ref: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * H, 1, Dh), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * Dh,
            bytes_accessed=2 * B * H * T * Dh * 2 + 2 * B * H * Dh * 2,
            transcendentals=B * H * T,
        ),
    )(pos_arr, qf, kf, vf)
    return out.reshape(B, H, 1, Dh)
