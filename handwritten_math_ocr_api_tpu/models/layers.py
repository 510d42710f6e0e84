"""Functional building blocks: linear, layernorm, MHA, MLP, dropout.

Design: parameters are plain nested dicts of ``jnp`` arrays (a pytree), and
every module is a pure function ``apply(params, x, ...)``. This keeps the
whole model transparent to ``jax.jit``/``pjit`` sharding annotations, makes
the PyTorch->JAX weight converter a mechanical rename, and lets the decode
engine thread KV caches explicitly through ``lax.scan``.

Math conventions match ``torch.nn`` so converted checkpoints reproduce the
reference logits (reference decoder: src/model_swin.py:49-88 built on
``nn.TransformerDecoderLayer``):
- linear weights stored as (in, out) — transposed from torch's (out, in);
- attention uses a packed (in, 3*d) qkv projection like torch MHA;
- layernorm eps 1e-5, post-norm residual order in the decoder;
- softmax over keys with additive float mask.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# Initializers (used when training from scratch; converted checkpoints
# overwrite these).
# ---------------------------------------------------------------------------

def _xavier_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def linear_init(key, in_dim: int, out_dim: int, bias: bool = True):
    kw, kb = jax.random.split(key)
    p = {"w": _xavier_uniform(kw, (in_dim, out_dim))}
    if bias:
        p["b"] = jnp.zeros((out_dim,), jnp.float32)
    return p


def layer_norm_init(dim: int):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def embedding_init(key, num: int, dim: int, std: float = 0.02):
    return {"table": jax.random.normal(key, (num, dim), jnp.float32) * std}


def mha_init(key, d_model: int, kv_dim: int | None = None):
    """Packed q/k/v projection. ``kv_dim`` < d_model gives multi-/grouped-
    query attention (k and v project to kv_dim; queries stay d_model)."""
    kv = kv_dim if kv_dim is not None else d_model
    kq, ko = jax.random.split(key)
    return {
        "w_qkv": _xavier_uniform(kq, (d_model, d_model + 2 * kv)),
        "b_qkv": jnp.zeros((d_model + 2 * kv,), jnp.float32),
        "w_out": _xavier_uniform(ko, (d_model, d_model)),
        "b_out": jnp.zeros((d_model,), jnp.float32),
    }


def mlp_init(key, d_model: int, hidden: int):
    k1, k2 = jax.random.split(key)
    return {"fc1": linear_init(k1, d_model, hidden),
            "fc2": linear_init(k2, hidden, d_model)}


# ---------------------------------------------------------------------------
# Apply functions
# ---------------------------------------------------------------------------

def linear(p, x: Array) -> Array:
    if "w_q" in p:  # weight-only int8 (ops/quant.py)
        from ..ops.quant import dequant_matmul

        y = dequant_matmul(x, p["w_q"], p["w_scale"])
    else:
        y = jnp.dot(x, p["w"].astype(x.dtype),
                    preferred_element_type=x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def layer_norm(p, x: Array, eps: float = 1e-5) -> Array:
    # Normalize in f32 regardless of compute dtype for numerical stability.
    orig = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(orig)


def embedding(p, ids: Array) -> Array:
    return p["table"][ids]


def dropout(key: Optional[Array], x: Array, rate: float, deterministic: bool) -> Array:
    if deterministic or rate == 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def split_heads(x: Array, num_heads: int) -> Array:
    """(..., L, D) -> (..., H, L, Dh)."""
    *lead, L, D = x.shape
    x = x.reshape(*lead, L, num_heads, D // num_heads)
    return jnp.swapaxes(x, -3, -2)


def merge_heads(x: Array) -> Array:
    """(..., H, L, Dh) -> (..., L, D)."""
    x = jnp.swapaxes(x, -3, -2)
    *lead, L, H, Dh = x.shape
    return x.reshape(*lead, L, H * Dh)


def grouped_attention(q: Array, k: Array, v: Array,
                      mask: Optional[Array], num_heads: int,
                      **kwargs) -> Array:
    """Attention where k/v may carry fewer heads than q (MQA/GQA).

    q: (..., H, Lq, Dh); k, v: (..., Hkv, Lk, Dh), Hkv | H. Rather than
    materializing k/v at H heads, the QUERY is reshaped to
    (..., Hkv, H/Hkv, Lq, Dh) and k/v gain a singleton group dim — einsum
    broadcasting then reads each kv head once (A/B on v5e: the
    materializing formulation made GQA *slower* than MHA; this one is
    cache-bandwidth-proportional). A mask with q's rank is normalized
    here — its head axis (size 1, Hkv or H) gains/absorbs the group
    axis — so callers pass the same mask they would for MHA; a
    pre-expanded rank-(q.ndim+1) mask passes through untouched."""
    hkv = k.shape[-3]
    if hkv == num_heads:
        return attention(q, k, v, mask, **kwargs)
    g = num_heads // hkv
    *lead, H, Lq, Dh = q.shape
    qg = q.reshape(*lead, hkv, g, Lq, Dh)
    if mask is not None and mask.ndim == q.ndim:
        if mask.shape[-3] == num_heads:  # per-query-head mask
            mask = mask.reshape(*mask.shape[:-3], hkv, g, *mask.shape[-2:])
        else:  # head axis is 1 or Hkv: insert the group axis
            mask = mask[..., :, None, :, :]
    out = attention(qg, k[..., :, None, :, :], v[..., :, None, :, :], mask,
                    **kwargs)
    return out.reshape(*lead, H, Lq, Dh)


def attention(
    q: Array,
    k: Array,
    v: Array,
    mask: Optional[Array] = None,
    *,
    dropout_rate: float = 0.0,
    dropout_key: Optional[Array] = None,
    deterministic: bool = True,
) -> Array:
    """Scaled dot-product attention over pre-split heads.

    q: (..., H, Lq, Dh); k, v: (..., H, Lk, Dh); mask: additive float
    broadcastable to (..., H, Lq, Lk). Logits/softmax in f32 (TPU: MXU
    accumulates f32; VPU softmax in f32 avoids bf16 exp saturation).
    """
    dh = q.shape[-1]
    scale = 1.0 / math.sqrt(dh)
    logits = jnp.einsum(
        "...qd,...kd->...qk", q * scale, k, preferred_element_type=jnp.float32
    )
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1)
    weights = dropout(dropout_key, weights, dropout_rate, deterministic)
    out = jnp.einsum(
        "...qk,...kd->...qd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


def mha(
    p,
    query: Array,
    kv: Array,
    num_heads: int,
    mask: Optional[Array] = None,
    *,
    dropout_rate: float = 0.0,
    dropout_key: Optional[Array] = None,
    deterministic: bool = True,
) -> Array:
    """torch-style multi-head attention with packed qkv projection.

    query: (B, Lq, D), kv: (B, Lk, D). For self-attention pass kv=query.
    torch MHA applies the packed in_proj where q takes rows [0:D), k rows
    [D:2D), v rows [2D:3D) — our packed weight is (D, 3D) column-blocked
    the same way.
    """
    d = query.shape[-1]
    w = p["w_qkv"].astype(query.dtype)
    b = p["b_qkv"].astype(query.dtype)
    # k/v width from the packed weight: d for MHA, kv_dim < d for MQA/GQA
    kvd = (w.shape[1] - d) // 2
    kv_heads = num_heads * kvd // d
    q = jnp.dot(query, w[:, :d], preferred_element_type=query.dtype) + b[:d]
    k = jnp.dot(kv, w[:, d:d + kvd],
                preferred_element_type=query.dtype) + b[d:d + kvd]
    v = jnp.dot(kv, w[:, d + kvd:],
                preferred_element_type=query.dtype) + b[d + kvd:]
    out = grouped_attention(
        split_heads(q, num_heads),
        split_heads(k, kv_heads),
        split_heads(v, kv_heads),
        mask,
        num_heads,
        dropout_rate=dropout_rate,
        dropout_key=dropout_key,
        deterministic=deterministic,
    )
    out = merge_heads(out)
    return linear({"w": p["w_out"], "b": p["b_out"]}, out)


def mlp(p, x: Array, activation=jax.nn.relu, *, dropout_rate: float = 0.0,
        dropout_key: Optional[Array] = None, deterministic: bool = True) -> Array:
    h = activation(linear(p["fc1"], x))
    h = dropout(dropout_key, h, dropout_rate, deterministic)
    return linear(p["fc2"], h)


def causal_mask(length: int, dtype=jnp.float32) -> Array:
    """Additive causal mask: 0 on/below diagonal, -inf above
    (reference: src/model_swin.py:66-70)."""
    return jnp.triu(jnp.full((length, length), -jnp.inf, dtype), k=1)
