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
neither lowering realizes the bandwidth win on v5e (A/B/A ratios verified;
round-1 absolute img/s figures retracted with the bench formula fix):
- naive XLA int8-weight matmuls: ~8000x slower than the bf16 path (the
  compiler materializes a dequantized copy per step);
- the per-matmul Pallas dequant kernel below: ~2% slower (~48 pallas
  custom-calls per decode step; per-call launch overhead inside the
  while_loop dwarfs the saved bytes).
The viable design is int8 dequant fused inside a single whole-layer kernel
(combine with ops/fused_step.py once its cache write-back is row-granular)
— staged for a future round. Keep ``quantize=True`` off in production.

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


def dequant_matmul(x: Array, w_q: Array, scale: Array,
                   *, use_pallas: bool | None = None) -> Array:
    """x (..., in) @ int8 (in, out) with per-column scale -> (..., out).

    The int8->bf16 cast is exact (|w_q| <= 127) and happens after the
    half-bandwidth HBM load; the scale applies to the matmul output.
    On TPU the Pallas kernel below is used (XLA's own lowering of
    int8-weight matmuls materializes a dequantized copy and is
    catastrophically slow — see module docstring); on CPU the jnp form.
    """
    if use_pallas is None:
        import jax

        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and x.ndim >= 2 and w_q.ndim == 2:
        lead = x.shape[:-1]
        y = _dequant_matmul_pallas(x.reshape(-1, x.shape[-1]), w_q, scale)
        return y.reshape(*lead, w_q.shape[-1])
    y = jnp.dot(x, w_q.astype(x.dtype), preferred_element_type=jnp.float32)
    return (y * scale).astype(x.dtype)


def _dq_kernel(x_ref, w_ref, s_ref, o_ref):
    w = w_ref[:].astype(x_ref.dtype)       # int8 -> compute dtype, in VMEM
    y = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    o_ref[:] = (y * s_ref[0]).astype(o_ref.dtype)


def _dequant_matmul_pallas(x: Array, w_q: Array, scale: Array) -> Array:
    """x (B, Din) @ w_q (Din, Dout) int8, per-column scale. Decode-sized
    operands (Din/Dout <= ~768) fit VMEM whole; the int8 block is cast
    in-register after the half-bandwidth HBM load."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from . import default_interpret

    B, Din = x.shape
    Dout = w_q.shape[1]
    return pl.pallas_call(
        _dq_kernel,
        out_shape=jax.ShapeDtypeStruct((B, Dout), x.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dout), lambda: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=default_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Din * Dout,
            bytes_accessed=B * Din * 2 + Din * Dout + B * Dout * 2,
            transcendentals=0,
        ),
    )(x, w_q, scale.reshape(1, Dout).astype(jnp.float32))


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
