"""ResNet-18 encoder variants, TPU-native (NHWC, functional).

Model C of the reference (src/model.py:13-44): a 1-channel ResNet-18 trunk
(avgpool/fc stripped), AdaptiveAvgPool2d((1, None)) collapsing height, and
a 512->d_model projection, yielding (B, W/32, d_model) memory — 10 columns
for 96x320 input. Model B (src/model_res18trans.py:13-65) additionally runs
an 8-layer transformer encoder over the columns.

Intentional divergences from the reference, both documented in SURVEY §2:
- the reference re-created a *random* positional embedding every forward
  (src/model_res18trans.py:57-59); we use a learned one initialized once;
- the reference's 1-channel conv1 copied only the R-channel weights
  (src/model.py:28); the converter (compat/) reproduces whichever the
  checkpoint actually holds.

BatchNorm carries running statistics in a separate ``state`` pytree so the
model stays a pure function: training-mode apply returns updated stats.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import ModelConfig, ResNetConfig
from . import layers
from .layers import Array


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _conv_init(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    std = np.sqrt(2.0 / fan_in)  # kaiming for relu nets
    return {"w": jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * std}


def _bn_init(dim):
    params = {"scale": jnp.ones((dim,), jnp.float32),
              "bias": jnp.zeros((dim,), jnp.float32)}
    stats = {"mean": jnp.zeros((dim,), jnp.float32),
             "var": jnp.ones((dim,), jnp.float32)}
    return params, stats


def _basic_block_init(key, cin, cout, stride):
    k1, k2, k3 = jax.random.split(key, 3)
    bn1_p, bn1_s = _bn_init(cout)
    bn2_p, bn2_s = _bn_init(cout)
    params = {
        "conv1": _conv_init(k1, 3, 3, cin, cout),
        "bn1": bn1_p,
        "conv2": _conv_init(k2, 3, 3, cout, cout),
        "bn2": bn2_p,
    }
    state = {"bn1": bn1_s, "bn2": bn2_s}
    if stride != 1 or cin != cout:
        bnd_p, bnd_s = _bn_init(cout)
        params["downsample"] = {"conv": _conv_init(k3, 1, 1, cin, cout),
                                "bn": bnd_p}
        state["downsample"] = {"bn": bnd_s}
    return params, state


def init_resnet_params(key, cfg: ResNetConfig) -> Tuple[Dict, Dict]:
    keys = jax.random.split(key, 1 + len(cfg.stage_blocks))
    bn1_p, bn1_s = _bn_init(cfg.stage_channels[0])
    params = {
        "conv1": _conv_init(keys[0], 7, 7, cfg.in_channels, cfg.stage_channels[0]),
        "bn1": bn1_p,
        "layers": [],
    }
    state = {"bn1": bn1_s, "layers": []}
    cin = cfg.stage_channels[0]
    for i, (cout, nblocks) in enumerate(zip(cfg.stage_channels, cfg.stage_blocks)):
        bkeys = jax.random.split(keys[1 + i], nblocks)
        blocks_p, blocks_s = [], []
        for b in range(nblocks):
            stride = 2 if (b == 0 and i > 0) else 1
            bp, bs = _basic_block_init(bkeys[b], cin, cout, stride)
            blocks_p.append(bp)
            blocks_s.append(bs)
            cin = cout
        params["layers"].append(blocks_p)
        state["layers"].append(blocks_s)
    return params, state


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def _conv(p, x: Array, stride: int, padding) -> Array:
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(p, s, x: Array, *, training: bool, momentum: float = 0.1,
        eps: float = 1e-5):
    """BatchNorm (torch semantics). Returns (y, new_stats)."""
    if training:
        x32 = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x32, axis=axes)
        var = jnp.var(x32, axis=axes)
        n = np.prod([x.shape[a] for a in axes])
        unbiased = var * n / max(n - 1, 1)
        new_s = {
            "mean": (1 - momentum) * s["mean"] + momentum * mean,
            "var": (1 - momentum) * s["var"] + momentum * unbiased,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    inv = jax.lax.rsqrt(var + eps) * p["scale"]
    y = (x.astype(jnp.float32) - mean) * inv + p["bias"]
    return y.astype(x.dtype), new_s


def _basic_block(p, s, x: Array, stride: int, *, training: bool):
    new_s = {}
    identity = x
    h = _conv(p["conv1"], x, stride, [(1, 1), (1, 1)])
    h, new_s["bn1"] = _bn(p["bn1"], s["bn1"], h, training=training)
    h = jax.nn.relu(h)
    h = _conv(p["conv2"], h, 1, [(1, 1), (1, 1)])
    h, new_s["bn2"] = _bn(p["bn2"], s["bn2"], h, training=training)
    if "downsample" in p:
        identity = _conv(p["downsample"]["conv"], x, stride, [(0, 0), (0, 0)])
        identity, ds = _bn(p["downsample"]["bn"], s["downsample"]["bn"],
                           identity, training=training)
        new_s["downsample"] = {"bn": ds}
    return jax.nn.relu(h + identity), new_s


def resnet_apply(params, state, images: Array, cfg: ResNetConfig, *,
                 training: bool = False) -> Tuple[Array, Dict]:
    """Trunk: (B, H, W, 1) -> (B, H/32, W/32, 512) NHWC feature map."""
    x = _conv(params["conv1"], images, 2, [(3, 3), (3, 3)])
    x, bn1_s = _bn(params["bn1"], state["bn1"], x, training=training)
    x = jax.nn.relu(x)
    # maxpool 3x3 stride 2 pad 1 (torch resnet stem)
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    new_state = {"bn1": bn1_s, "layers": []}
    for i, blocks in enumerate(params["layers"]):
        stage_s = []
        for b, bp in enumerate(blocks):
            stride = 2 if (b == 0 and i > 0) else 1
            x, bs = _basic_block(bp, state["layers"][i][b], x, stride,
                                 training=training)
            stage_s.append(bs)
        new_state["layers"].append(stage_s)
    return x, new_state


def height_pool_project(proj_params, features: Array) -> Array:
    """AdaptiveAvgPool2d((1, None)) + Linear(512, d_model)
    (reference: src/model.py:34-44): (B, H', W', 512) -> (B, W', d_model)."""
    pooled = jnp.mean(features.astype(jnp.float32), axis=1)  # (B, W', 512)
    return layers.linear(proj_params, pooled.astype(features.dtype))


# --- transformer encoder stack for the res18trans variant -----------------

def init_trans_encoder_params(key, cfg: ModelConfig):
    n = cfg.num_encoder_layers
    keys = jax.random.split(key, n + 1)
    enc_layers = []
    for i in range(n):
        k1, k2 = jax.random.split(keys[i])
        enc_layers.append({
            "self_attn": layers.mha_init(k1, cfg.d_model),
            "norm1": layers.layer_norm_init(cfg.d_model),
            "norm2": layers.layer_norm_init(cfg.d_model),
            "ffn": layers.mlp_init(k2, cfg.d_model, cfg.dim_feedforward),
        })
    return {
        "layers": enc_layers,
        # learned positional embedding over the W/32 columns — fixes the
        # reference's per-forward random embedding (src/model_res18trans.py:57-59)
        "pos": layers.embedding_init(keys[-1], cfg.encoder_len, cfg.d_model),
    }


def trans_encoder_apply(params, x: Array, cfg: ModelConfig, *,
                        deterministic: bool = True, rng=None) -> Array:
    """Post-norm transformer encoder (torch TransformerEncoderLayer order)."""
    L = x.shape[1]
    pos = layers.embedding(params["pos"], jnp.arange(L))
    x = x + pos.astype(x.dtype)
    for i, p in enumerate(params["layers"]):
        keys = [None, None]
        if rng is not None and not deterministic:
            keys = list(jax.random.split(jax.random.fold_in(rng, i)))
        sa = layers.mha(p["self_attn"], x, x, cfg.nhead,
                        deterministic=deterministic)
        x = layers.layer_norm(p["norm1"], x + layers.dropout(
            keys[0], sa, cfg.dropout, deterministic))
        ff = layers.mlp(p["ffn"], x, activation=jax.nn.relu)
        x = layers.layer_norm(p["norm2"], x + layers.dropout(
            keys[1], ff, cfg.dropout, deterministic))
    return x
