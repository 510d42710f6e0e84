"""Swin-Tiny encoder, TPU-native (NHWC, functional, jnp/Pallas).

Re-implements the torchvision ``swin_t`` topology the reference uses as its
shipped encoder (reference: src/model_swin.py:14-46): a 4x4 stride-4 patch
embed on 1-channel input, four stages of shifted-window attention blocks
(depths 2/2/6/2, heads 3/6/12/24, window 7), patch merging between stages.
As in the reference, the trunk's *final layernorm is not applied* — the
reference consumes ``swin.features`` only (src/model_swin.py:36,40), so the
stage-4 block output feeds the d_model projection directly.

Numerics match torchvision's ``shifted_window_attention``: pad to window
multiples, clamp shift when a padded dim fits in one window, additive
region mask with -100.0 fill, relative position bias table indexing, and
PatchMerging's even/odd 2x2 gather order — verified by unit tests against
hand-built references.

TPU notes: everything is NHWC (C on the 128-lane axis); window partition is
reshape/transpose (free in XLA); attention matmuls accumulate in f32 on the
MXU. A fused Pallas window-attention kernel (ops/window_attention.py) can be
enabled via ``use_pallas``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import SwinConfig
from . import layers
from .layers import Array


# ---------------------------------------------------------------------------
# Static (trace-time) index/mask construction
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def relative_position_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) int index into the (2*ws-1)^2 relative bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    coords = coords.reshape(2, -1)  # (2, ws*ws)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)  # (N, N, 2)
    rel[..., 0] += ws - 1
    rel[..., 1] += ws - 1
    rel[..., 0] *= 2 * ws - 1
    return rel.sum(-1)  # (N, N)


@functools.lru_cache(maxsize=None)
def shift_attention_mask(pad_h: int, pad_w: int, ws: int,
                         shift_h: int, shift_w: int) -> Optional[np.ndarray]:
    """Additive (num_windows, N, N) mask for shifted windows; None if no shift.

    Region labeling and -100.0 fill follow torchvision's functional
    implementation so converted weights see identical attention logits.
    """
    if shift_h == 0 and shift_w == 0:
        return None
    region = np.zeros((pad_h, pad_w), np.float32)
    h_slices = ((0, pad_h - ws), (pad_h - ws, pad_h - shift_h), (pad_h - shift_h, pad_h))
    w_slices = ((0, pad_w - ws), (pad_w - ws, pad_w - shift_w), (pad_w - shift_w, pad_w))
    count = 0
    for h0, h1 in h_slices:
        for w0, w1 in w_slices:
            region[h0:h1, w0:w1] = count
            count += 1
    nwh, nww = pad_h // ws, pad_w // ws
    region = region.reshape(nwh, ws, nww, ws).transpose(0, 2, 1, 3)
    region = region.reshape(nwh * nww, ws * ws)
    diff = region[:, None, :] - region[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------

def _block_init(key, dim: int, num_heads: int, ws: int, mlp_ratio: float):
    k1, k2, k3 = jax.random.split(key, 3)
    attn = layers.mha_init(k1, dim)
    attn["rel_bias_table"] = (
        jax.random.normal(k2, ((2 * ws - 1) ** 2, num_heads), jnp.float32) * 0.02
    )
    return {
        "norm1": layers.layer_norm_init(dim),
        "attn": attn,
        "norm2": layers.layer_norm_init(dim),
        "mlp": layers.mlp_init(k3, dim, int(dim * mlp_ratio)),
    }


def init_swin_params(key, cfg: SwinConfig):
    keys = jax.random.split(key, 2 + len(cfg.depths))
    dim = cfg.embed_dim
    ps = cfg.patch_size
    params = {
        "patch_embed": {
            "conv": {
                "w": jax.random.normal(
                    keys[0], (ps, ps, cfg.in_channels, dim), jnp.float32
                ) * (1.0 / np.sqrt(ps * ps * cfg.in_channels)),
                "b": jnp.zeros((dim,), jnp.float32),
            },
            "norm": layers.layer_norm_init(dim),
        },
        "stages": [],
        "merges": [],
    }
    for i, depth in enumerate(cfg.depths):
        sdim = dim * 2 ** i
        bkeys = jax.random.split(keys[1 + i], depth)
        blocks = [
            _block_init(bkeys[d], sdim, cfg.num_heads[i], cfg.window_size,
                        cfg.mlp_ratio)
            for d in range(depth)
        ]
        params["stages"].append({"blocks": blocks})
        if i < len(cfg.depths) - 1:
            mkey = jax.random.fold_in(keys[-1], i)
            params["merges"].append({
                "norm": layers.layer_norm_init(4 * sdim),
                "reduction": layers.linear_init(mkey, 4 * sdim, 2 * sdim,
                                                bias=False),
            })
    return params


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def window_partition(x: Array, ws: int) -> Array:
    """(B, H, W, C) -> (B * nW, ws*ws, C); H, W divisible by ws."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B * (H // ws) * (W // ws), ws * ws, C)


def window_unpartition(x: Array, ws: int, B: int, H: int, W: int) -> Array:
    C = x.shape[-1]
    x = x.reshape(B, H // ws, W // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def window_attention(
    p,
    x: Array,
    ws: int,
    shift: int,
    num_heads: int,
    *,
    use_pallas: bool = False,
) -> Array:
    """Shifted-window MHA on an NHWC feature map. x: (B, H, W, C)."""
    B, H, W, C = x.shape
    pad_b = (ws - H % ws) % ws
    pad_r = (ws - W % ws) % ws
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    pad_h, pad_w = H + pad_b, W + pad_r
    # clamp shift when the padded dim fits in a single window
    shift_h = 0 if ws >= pad_h else shift
    shift_w = 0 if ws >= pad_w else shift

    if shift_h or shift_w:
        x = jnp.roll(x, shift=(-shift_h, -shift_w), axis=(1, 2))

    windows = window_partition(x, ws)  # (B*nW, N, C)
    n_windows = (pad_h // ws) * (pad_w // ws)
    N = ws * ws

    rel_index = relative_position_index(ws).reshape(-1)
    bias = p["rel_bias_table"][rel_index]  # (N*N, nh)
    bias = bias.reshape(N, N, num_heads).transpose(2, 0, 1)  # (nh, N, N)

    smask = shift_attention_mask(pad_h, pad_w, ws, shift_h, shift_w)
    if smask is None:
        mask = bias[None]  # (1, nh, N, N) broadcast over windows
    else:
        mask = bias[None] + jnp.asarray(smask)[:, None]  # (nW, nh, N, N)

    if use_pallas:
        from ..ops.window_attention import fused_window_attention

        out = fused_window_attention(p, windows, num_heads, mask, n_windows)
    else:
        d = C
        w = p["w_qkv"].astype(windows.dtype)
        b = p["b_qkv"].astype(windows.dtype)
        qkv = jnp.dot(windows, w, preferred_element_type=windows.dtype) + b
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = layers.split_heads(q, num_heads).reshape(B, n_windows, num_heads, N, d // num_heads)
        k = layers.split_heads(k, num_heads).reshape(B, n_windows, num_heads, N, d // num_heads)
        v = layers.split_heads(v, num_heads).reshape(B, n_windows, num_heads, N, d // num_heads)
        out = layers.attention(q, k, v, mask[None])  # mask broadcasts over B
        out = layers.merge_heads(out).reshape(B * n_windows, N, C)
        out = layers.linear({"w": p["w_out"], "b": p["b_out"]}, out)

    x = window_unpartition(out, ws, B, pad_h, pad_w)
    if shift_h or shift_w:
        x = jnp.roll(x, shift=(shift_h, shift_w), axis=(1, 2))
    if pad_b or pad_r:
        x = x[:, :H, :W, :]
    return x


def _stochastic_depth(key, x: Array, rate: float, deterministic: bool) -> Array:
    """Row-mode stochastic depth (torchvision semantics)."""
    if deterministic or rate == 0.0 or key is None:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(key, keep, shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def swin_block(p, x: Array, ws: int, shift: int, num_heads: int,
               mlp_ratio: float, *, sd_rate: float = 0.0,
               deterministic: bool = True, rng=None,
               use_pallas: bool = False,
               use_pallas_block: bool = False) -> Array:
    """Pre-norm Swin block: x + SD(attn(LN(x))); x + SD(mlp(LN(x))).

    ``use_pallas_block`` routes the whole block through the fused Pallas
    megakernel (ops/swin_block.py) when the stage fits VMEM — inference
    only (``deterministic`` required: the kernel has no VJP, so routing a
    training forward through it — even with sd_rate == 0 — would fail at
    jax.grad trace time)."""
    if use_pallas_block and deterministic:
        from ..ops.swin_block import fits_vmem, fused_swin_block

        pad_r = (ws - x.shape[2] % ws) % ws
        if fits_vmem(x.shape[-1], ws, x.shape[2] + pad_r, mlp_ratio):
            return fused_swin_block(p, x, ws, shift, num_heads)
    k1 = k2 = None
    if rng is not None:
        k1, k2 = jax.random.split(rng)
    h = window_attention(p["attn"], layers.layer_norm(p["norm1"], x), ws,
                         shift, num_heads, use_pallas=use_pallas)
    x = x + _stochastic_depth(k1, h, sd_rate, deterministic)
    h = layers.mlp(p["mlp"], layers.layer_norm(p["norm2"], x),
                   activation=jax.nn.gelu)
    return x + _stochastic_depth(k2, h, sd_rate, deterministic)


def patch_merging(p, x: Array, *, use_pallas: bool = False) -> Array:
    """(B, H, W, C) -> (B, H/2, W/2, 2C): 2x2 gather, LN(4C), linear 4C->2C.

    Concat order [even/even, odd/even, even/odd, odd/odd] over (H, W) matches
    torchvision PatchMerging so converted reduction weights line up.
    """
    B, H, W, C = x.shape
    if H % 2 or W % 2:
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
    if use_pallas:
        from ..ops.patch_merging import fused_patch_merging

        return fused_patch_merging(p, x)
    x0 = x[:, 0::2, 0::2, :]
    x1 = x[:, 1::2, 0::2, :]
    x2 = x[:, 0::2, 1::2, :]
    x3 = x[:, 1::2, 1::2, :]
    x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
    x = layers.layer_norm(p["norm"], x)
    return layers.linear(p["reduction"], x)


def patch_embed(p, images: Array) -> Array:
    """(B, H, W, 1) NHWC -> (B, H/4, W/4, C) via 4x4/4 conv + LN."""
    w = p["conv"]["w"].astype(images.dtype)
    x = jax.lax.conv_general_dilated(
        images, w,
        window_strides=(4, 4), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = x + p["conv"]["b"].astype(x.dtype)
    return layers.layer_norm(p["norm"], x)


def swin_apply(params, images: Array, cfg: SwinConfig, *,
               deterministic: bool = True, rng=None,
               use_pallas: bool = False,
               use_pallas_block: bool = False) -> Array:
    """Full Swin trunk: (B, H, W, 1) -> (B, H/32 * W/32, 768).

    No final LN — the reference taps swin.features output directly
    (src/model_swin.py:40-42) and flattens (B, h, w, C) row-major to
    (B, h*w, C).
    """
    x = patch_embed(params["patch_embed"], images)
    ws = cfg.window_size
    total_blocks = sum(cfg.depths)
    block_id = 0
    for i, depth in enumerate(cfg.depths):
        stage = params["stages"][i]
        for d in range(depth):
            shift = 0 if d % 2 == 0 else ws // 2
            sd_rate = cfg.stochastic_depth * block_id / max(total_blocks - 1, 1)
            brng = None
            if rng is not None and not deterministic:
                brng = jax.random.fold_in(rng, block_id)
            x = swin_block(
                stage["blocks"][d], x, ws, shift, cfg.num_heads[i],
                cfg.mlp_ratio, sd_rate=sd_rate,
                deterministic=deterministic, rng=brng, use_pallas=use_pallas,
                use_pallas_block=use_pallas_block and deterministic,
            )
            block_id += 1
        if i < len(cfg.depths) - 1:
            x = patch_merging(params["merges"][i], x, use_pallas=use_pallas)
    B, H, W, C = x.shape
    return x.reshape(B, H * W, C)


def swin_apply_stages(params, images: Array, cfg: SwinConfig):
    """swin_apply with per-stage activation taps, for parity goldens
    (tests/fixtures/swin_golden_stages_full.npz): returns a list
    [patch-embed out, stage-1 out (post-blocks, pre-merge), ...,
    final-stage out], each (B, h, w, C) NHWC. Deterministic eval only."""
    taps = []
    x = patch_embed(params["patch_embed"], images)
    taps.append(x)
    ws = cfg.window_size
    for i, depth in enumerate(cfg.depths):
        stage = params["stages"][i]
        for d in range(depth):
            shift = 0 if d % 2 == 0 else ws // 2
            x = swin_block(stage["blocks"][d], x, ws, shift,
                           cfg.num_heads[i], cfg.mlp_ratio,
                           deterministic=True)
        taps.append(x)
        if i < len(cfg.depths) - 1:
            x = patch_merging(params["merges"][i], x)
    return taps
