"""On-device batched augmentation: random affine (rotate/shear/scale).

The reference augments on the host per-sample with PIL
``RandomAffine(degrees=2, shear=2, scale=(0.95, 1.05))``
(src/data_loader.py:51) inside DataLoader worker processes. TPU-first, the
whole batch is warped on device in one vectorized gather that XLA fuses
with the normalize + patch-embed pipeline — no host CPU cost, no worker
processes.

Semantics: rotation ~U(-2, 2) deg, x-shear ~U(-2, 2) deg, isotropic scale
~U(0.95, 1.05) about the image center, nearest-neighbor sampling with
constant fill (torchvision RandomAffine defaults: NEAREST, fill=0 — on
normalized images the equivalent fill is -1.0).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.config import DataConfig
from ..models.layers import Array


def _inverse_affine(theta, shear, scale):
    """2x2 inverse of A = R(theta) @ Shear(shear) @ (scale * I)."""
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    t = jnp.tan(shear)
    # A = [[cos, cos*t - sin], [sin, sin*t + cos]] * scale
    a, b = cos * scale, (cos * t - sin) * scale
    c, d = sin * scale, (sin * t + cos) * scale
    det = a * d - b * c
    inv = jnp.array([[d, -b], [-c, a]]) / det
    return inv


def _warp_one(img: Array, theta, shear, scale, fill: float) -> Array:
    """img: (H, W). Nearest-neighbor inverse warp about the center."""
    H, W = img.shape
    inv = _inverse_affine(theta, shear, scale)
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) - cy
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) - cx
    # source coords = inv @ (x, y)
    sx = inv[0, 0] * xs + inv[0, 1] * ys + cx
    sy = inv[1, 0] * xs + inv[1, 1] * ys + cy
    ix = jnp.round(sx).astype(jnp.int32)
    iy = jnp.round(sy).astype(jnp.int32)
    valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    ix = jnp.clip(ix, 0, W - 1)
    iy = jnp.clip(iy, 0, H - 1)
    gathered = img[iy, ix]
    return jnp.where(valid, gathered, jnp.asarray(fill, img.dtype))


def random_affine_batch(key, images: Array,
                        degrees: float = 2.0, shear: float = 2.0,
                        scale_range: Tuple[float, float] = (0.95, 1.05),
                        fill: float = -1.0) -> Array:
    """images: (B, H, W, 1) normalized floats. jit-friendly."""
    B = images.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    deg2rad = jnp.pi / 180.0
    thetas = jax.random.uniform(k1, (B,), minval=-degrees, maxval=degrees) * deg2rad
    shears = jax.random.uniform(k2, (B,), minval=-shear, maxval=shear) * deg2rad
    scales = jax.random.uniform(k3, (B,), minval=scale_range[0],
                                maxval=scale_range[1])
    warped = jax.vmap(_warp_one, in_axes=(0, 0, 0, 0, None))(
        images[..., 0], thetas, shears, scales, fill)
    return warped[..., None]


def augment_and_normalize(key, images_u8: Array, cfg: DataConfig,
                          dtype=jnp.float32) -> Array:
    """Fused on-device train-path preprocessing: uint8 (B, H, W, 1) ->
    affine-augmented normalized (B, H, W, 1)."""
    x = images_u8.astype(dtype) / 255.0 * 2.0 - 1.0
    return random_affine_batch(key, x, cfg.aug_degrees, cfg.aug_shear,
                               cfg.aug_scale, fill=-1.0)
