"""Pallas TPU kernel: fused KV-cache append + decode attention, in place.

The jnp decode step (models/decoder.py) does, per layer:
``dynamic_update_slice`` into the (B, H, T, Dh) K cache, the same for V,
then masked attention over both — three passes over the cache tensors, and
XLA may materialize copies for the updates. This kernel does all of it in
ONE pass per (batch, head) program: the new K/V row is stored at ``pos``
directly in the cache block (aliased input->output, so the update is
in-place in HBM), and the masked softmax(QK^T)V runs from the same VMEM
residency.

Returns (attn_out, k_cache, v_cache) — callers thread the aliased caches
exactly like the jnp path, so while_loop decode keeps its in-place chain.
Equivalence with the jnp step is asserted in tests (interpret on CPU,
compiled on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(pos_ref, q_ref, kn_ref, vn_ref, k_ref, v_ref,
            out_ref, ko_ref, vo_ref):
    # blocks: q/kn/vn (1, 1, Dh); k/v caches (1, T, Dh)
    pos = pos_ref[0]
    T = k_ref.shape[1]
    # append the new K/V row via a masked full-block merge (Mosaic cannot
    # store at an arbitrary sublane offset; the block is VMEM-resident so
    # the extra write bandwidth is on-chip)
    slot = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    at_pos = slot == pos
    k = jnp.where(at_pos, kn_ref[0], k_ref[0])       # (T, Dh)
    v = jnp.where(at_pos, vn_ref[0], v_ref[0])
    ko_ref[0] = k
    vo_ref[0] = v

    q = q_ref[0].astype(jnp.float32)                 # (1, Dh)
    k = k.astype(jnp.float32)
    v = v.astype(jnp.float32)
    dh = k.shape[1]
    scale = 1.0 / (dh ** 0.5)
    logits = jnp.sum(k * (q * scale), axis=1, keepdims=True)   # (T, 1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    logits = jnp.where(slot <= pos, logits, -jnp.inf)
    m = jnp.max(logits)
    w = jnp.exp(logits - m)
    probs = w / jnp.sum(w)
    out_ref[0] = jnp.sum(v * probs, axis=0, keepdims=True).astype(
        out_ref.dtype)


def cache_append_attention(q, k_new, v_new, k_cache, v_cache, pos,
                           *, interpret: bool | None = None):
    """q, k_new, v_new: (B, H, 1, Dh); k_cache, v_cache: (B, H, T, Dh);
    pos: scalar int32. Returns (out (B, H, 1, Dh), k_cache', v_cache')
    with the caches updated in place at ``pos``."""
    from . import default_interpret

    if interpret is None:
        interpret = default_interpret()
    B, H, _, Dh = q.shape
    T = k_cache.shape[2]
    G = B * H
    qf = q.reshape(G, 1, Dh)
    knf = k_new.reshape(G, 1, Dh)
    vnf = v_new.reshape(G, 1, Dh)
    kf = k_cache.reshape(G, T, Dh)
    vf = v_cache.reshape(G, T, Dh)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)

    row = pl.BlockSpec((1, 1, Dh), lambda i, pos_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    cacheb = pl.BlockSpec((1, T, Dh), lambda i, pos_ref: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[row, row, row, cacheb, cacheb],
        out_specs=(row, cacheb, cacheb),
    )
    out, k_out, v_out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((G, 1, Dh), q.dtype),
            jax.ShapeDtypeStruct((G, T, Dh), k_cache.dtype),
            jax.ShapeDtypeStruct((G, T, Dh), v_cache.dtype),
        ),
        # alias cache inputs to cache outputs: operand indices count the
        # scalar-prefetch arg first (pos=0, q=1, kn=2, vn=3, k=4, v=5)
        input_output_aliases={4: 1, 5: 2},
        interpret=interpret,
    )(pos_arr, qf, knf, vnf, kf, vf)
    return (out.reshape(B, H, 1, Dh),
            k_out.reshape(B, H, T, Dh),
            v_out.reshape(B, H, T, Dh))
