"""Pallas TPU kernel: fused patch merging (concat + LayerNorm + reduction).

Between Swin stages the reference relied on torchvision's PatchMerging
(inside ``swin_t``, reference: src/model_swin.py:17): gather the 2x2
neighborhood into 4C channels, LayerNorm, then a 4C->2C linear. As plain
XLA the LN chain materializes the (B, H/2, W/2, 4C) concat + normalized
tensors in HBM between ops; here concat+LN+matmul run in one VMEM-resident
program per (batch, row) so only the final (.., 2C) output is written. The
2x2 strided gather stays in XLA (Mosaic supports only 2D gathers) and
fuses into the kernel's input DMA.

Matches models/swin.py ``patch_merging`` (even/even, odd/even, even/odd,
odd/odd order; LN eps 1e-5; no bias) — asserted by tests in interpret mode
and on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x0_ref, x1_ref, x2_ref, x3_ref, scale_ref, bias_ref, w_ref,
            out_ref):
    # x0..x3: (1, 1, W2, C) quadrants; out: (1, 1, W2, 2C)
    cat = jnp.concatenate(
        [x0_ref[0, 0], x1_ref[0, 0], x2_ref[0, 0], x3_ref[0, 0]],
        axis=-1)                                     # (W2, 4C)
    cat32 = cat.astype(jnp.float32)
    mean = jnp.mean(cat32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(cat32 - mean), axis=-1, keepdims=True)
    normed = (cat32 - mean) * jax.lax.rsqrt(var + 1e-5)
    normed = normed * scale_ref[0] + bias_ref[0]
    out = jnp.dot(normed.astype(cat.dtype), w_ref[:],
                  preferred_element_type=jnp.float32)
    out_ref[0, 0] = out.astype(out_ref.dtype)


def fused_patch_merging(p, x, *, interpret: bool | None = None):
    """Drop-in for models/swin.py ``patch_merging``: x (B, H, W, C) with H,
    W even -> (B, H/2, W/2, 2C)."""
    from . import default_interpret

    if interpret is None:
        interpret = default_interpret()
    B, H, W, C = x.shape
    assert H % 2 == 0 and W % 2 == 0, "pad before the fused kernel"
    H2, W2 = H // 2, W // 2
    # quadrant gather in XLA; fuses into the kernel input pipeline
    x0 = x[:, 0::2, 0::2, :]
    x1 = x[:, 1::2, 0::2, :]
    x2 = x[:, 0::2, 1::2, :]
    x3 = x[:, 1::2, 1::2, :]
    scale = p["norm"]["scale"].astype(jnp.float32).reshape(1, 4 * C)
    bias = p["norm"]["bias"].astype(jnp.float32).reshape(1, 4 * C)
    w = p["reduction"]["w"].astype(x.dtype)        # (4C, 2C)

    quad = pl.BlockSpec((1, 1, W2, C), lambda b, i: (b, i, 0, 0),
                        memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, 4 * C), lambda b, i: (0, 0),
                       memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(B, H2),
        in_specs=[quad, quad, quad, quad, vec, vec,
                  pl.BlockSpec((4 * C, 2 * C), lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, W2, 2 * C), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H2, W2, 2 * C), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H2 * W2 * 4 * C * 2 * C,
            bytes_accessed=B * H * W * C * 2 + B * H2 * W2 * 2 * C * 2,
            transcendentals=0,
        ),
    )(x0, x1, x2, x3, scale, bias, w)
