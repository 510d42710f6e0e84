"""Pallas beam-cache reorder: the parent gather as pure block DMA.

Beam search must physically rewrite the self-attention KV cache every
step so row ``r`` holds its (possibly re-parented) beam's history. XLA
lowers the natural ``take_along_axis`` formulation to a gather that runs
at ~11% of HBM peak, and re-expressing it as a one-hot matmul only
reaches ~14% (benchmarks/probe_beam_split_results.json) — at 64×5 beam
rows and the full 150-row extent that gather alone was ~78% of the beam
step (8.8 of 11.3 ms).

This kernel does the only thing the operation actually requires: copy
row blocks. The (R,) source-row map rides scalar prefetch and drives the
INPUT BlockSpec index map, so each grid step DMAs cache row ``src[r]``
HBM→VMEM and writes it back to row ``r`` of a fresh output — no compute,
no lane shuffles, Mosaic's pipelined block DMA at memory speed. K and V
ride one launch (shared grid, two in/out pairs).

Reference-free capability: the reference never implemented beam search
(src/config.py:50, src/inference.py:5); this accelerates the fused beam
path (decode/fused.py::beam_decode_fused).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def beam_cache_gather(self_k, self_v, src, t_ext: int, *,
                      interpret: bool | None = None):
    """Gather cache rows by ``src`` over the leading time prefix.

    self_k/self_v: (L, R, T, kvd); src: (R,) int32 — output row ``r``
    takes input row ``src[r]`` (dead/padded rows pass ``src[r] = r``).
    Returns two fresh (L, R, t_ext, kvd) arrays (positions [0, t_ext)).
    A fresh output is semantically required: an in-place gather would
    overwrite parent rows other rows still need to read.
    """
    from . import default_interpret

    if interpret is None:
        interpret = default_interpret()
    L, R, T, kvd = self_k.shape
    if not 0 < t_ext <= T:
        raise ValueError(f"t_ext {t_ext} not in (0, {T}]")

    def kernel(src_ref, k_in, v_in, k_out, v_out):
        k_out[...] = k_in[...]
        v_out[...] = v_in[...]

    blk = (1, 1, t_ext, kvd)
    in_spec = pl.BlockSpec(blk, lambda l, r, src_ref: (l, src_ref[r], 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(blk, lambda l, r, src_ref: (l, r, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(L, R),
        in_specs=[in_spec, in_spec],
        out_specs=[out_spec, out_spec])
    shape = jax.ShapeDtypeStruct((L, R, t_ext, kvd), self_k.dtype)
    return pl.pallas_call(
        kernel, out_shape=[shape, shape], grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.asarray(src, jnp.int32), self_k, self_v)
