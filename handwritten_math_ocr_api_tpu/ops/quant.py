"""Weight-only int8 quantization for the decode path.

Small-batch autoregressive decode is weight-bandwidth-bound: every step
streams all decoder matrices (~12.6 MB bf16) from HBM while the activations
are tiny. Symmetric per-output-channel int8 storage halves that traffic;
because the scale is per output column, dequantization commutes with the
matmul — ``(x @ w_q) * scale == x @ (w_q * scale)`` exactly — so the int8
weights are cast to bf16 in-register after the (half-sized) HBM load and
accuracy loss comes only from the int8 rounding of the weights
(~1% RMS). Opt-in: ``DecodeEngine(..., quantize=True)``.

**Status: EXPERIMENTAL.** Numerics are correct (tests/test_quant.py) but
the naive XLA lowering of int8-weight matmuls measured ~4 orders of
magnitude SLOWER than bf16 on v5e (A/B/A verified: 3308 -> 0.39 -> 3277
img/s on the batch-10 bench) — the compiler does not stream int8 + cast
in-register for these shapes. Realizing the 2x bandwidth win needs a
Pallas dequant-matmul kernel (double-buffered int8 weight DMA + in-VMEM
cast); staged for a future round. Keep ``quantize=True`` off in
production.

The reference had no quantization story at all; its serving weights were
fp32 pickles (app/src/im2latex.py:11).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.layers import Array

QUANT_KEYS = ("w", "w_qkv", "w_out")  # linear-like weights to quantize


def quantize_weight(w: Array) -> Tuple[Array, Array]:
    """(in, out) float -> (int8 (in, out), f32 scale (out,)) symmetric
    per-output-channel."""
    w = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_q, scale.astype(jnp.float32)


def dequant_matmul(x: Array, w_q: Array, scale: Array) -> Array:
    """x (..., in) @ int8 (in, out) with per-column scale -> (..., out).

    The int8->bf16 cast is exact (|w_q| <= 127) and happens after the
    half-bandwidth HBM load; the scale applies to the matmul output.
    """
    y = jnp.dot(x, w_q.astype(x.dtype), preferred_element_type=jnp.float32)
    return (y * scale).astype(x.dtype)


def _quantize_tree(p):
    if isinstance(p, dict):
        out = {}
        for k, v in p.items():
            if k in QUANT_KEYS and hasattr(v, "ndim") and v.ndim == 2:
                w_q, scale = quantize_weight(v)
                out[f"{k}_q"] = w_q
                out[f"{k}_scale"] = scale
            else:
                out[k] = _quantize_tree(v)
        return out
    if isinstance(p, list):
        return [_quantize_tree(x) for x in p]
    return p


def quantize_decoder_params(decoder_params: Dict) -> Dict:
    """Quantize every 2D linear weight in the decoder subtree; embeddings,
    positional tables, layernorms and biases stay float."""
    out = dict(decoder_params)
    out["layers"] = _quantize_tree(decoder_params["layers"])
    out["fc_out"] = _quantize_tree(decoder_params["fc_out"])
    return out


def quantized_bytes(decoder_params: Dict) -> Tuple[int, int]:
    """(float_bytes_bf16, quantized_bytes) for the weights the decode loop
    streams per step — documentation/telemetry helper."""
    fsum = qsum = 0
    for leaf in jax.tree_util.tree_leaves(decoder_params):
        if hasattr(leaf, "ndim") and leaf.ndim == 2:
            fsum += leaf.size * 2
            qsum += leaf.size + leaf.shape[-1] * 4
    return fsum, qsum
