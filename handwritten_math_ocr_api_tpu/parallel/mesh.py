"""Device mesh construction and sharding rules (data + tensor parallel).

The reference had no distributed compute at all — its only multi-device
code was a ``torch.nn.DataParallel`` wrap at eval (src/test_model.py:40)
and it scaled serving with Cloud Run replicas (app/deploy.sh:96-98). The
TPU-native equivalent is a ``jax.sharding.Mesh`` with named axes:

- ``data``: batch dimension (training DP, serving batch sharding);
- ``tensor``: attention heads / FFN hidden / vocab logits (TP). Collectives
  (psum of partial matmuls, all-gather of activations) are inserted by
  GSPMD and ride ICI within a slice.

Sharding rules are path-pattern based over the param pytree so they apply
uniformly to the Swin encoder, the ResNet projection, and the decoder.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, tensor: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'tensor') mesh. data=-1 uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % tensor == 0, f"{n} devices not divisible by tensor={tensor}"
        data = n // tensor
    assert data * tensor == n, f"mesh {data}x{tensor} != {n} devices"
    arr = np.asarray(devices).reshape(data, tensor)
    return Mesh(arr, ("data", "tensor"))


# (path-regex, PartitionSpec) — first match wins. Paths look like
# "decoder/layers/3/self_attn/w_qkv". Specs shard the head/hidden/vocab
# dimension over 'tensor'; everything unmatched is replicated.
TP_RULES: Tuple[Tuple[str, P], ...] = (
    # packed qkv: (d, 3d) — shard output columns (heads)
    (r".*attn/w_qkv$", P(None, "tensor")),
    (r".*attn/b_qkv$", P("tensor")),
    # attention output proj: (d, d) — shard input rows (heads), psum output
    (r".*attn/w_out$", P("tensor", None)),
    # FFN: fc1 (d, f) column-sharded, fc2 (f, d) row-sharded
    (r".*ffn/fc1/w$", P(None, "tensor")),
    (r".*ffn/fc1/b$", P("tensor")),
    (r".*ffn/fc2/w$", P("tensor", None)),
    (r".*mlp/fc1/w$", P(None, "tensor")),
    (r".*mlp/fc1/b$", P("tensor")),
    (r".*mlp/fc2/w$", P("tensor", None)),
    # vocab projection: shard the vocab dimension
    (r".*fc_out/w$", P(None, "tensor")),
    (r".*fc_out/b$", P("tensor")),
    # embeddings: shard vocab rows (gather is cheap; grads reduce-scatter)
    (r".*embedding/table$", P("tensor", None)),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_spec(path_str: str, shape: Tuple[int, ...],
               tensor_size: int) -> P:
    """PartitionSpec for one parameter under the TP rules; falls back to
    replication when the sharded dim does not divide."""
    for pattern, spec in TP_RULES:
        if re.match(pattern, path_str):
            ok = True
            for dim, axis in enumerate(spec):
                if axis == "tensor":
                    if dim >= len(shape) or shape[dim] % tensor_size != 0:
                        ok = False
            if ok:
                return spec
            return P()
    return P()


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for the model params (TP over 'tensor')."""
    tensor_size = mesh.shape["tensor"]

    def spec_for(path, leaf):
        return NamedSharding(
            mesh, param_spec(_path_str(path), leaf.shape, tensor_size))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh):
    """Leading-axis data parallelism for input batches."""
    return NamedSharding(mesh, P("data"))


def shard_params(params, mesh: Mesh):
    """Place params on the mesh per the TP rules."""
    return jax.device_put(params, param_shardings(params, mesh))


def shard_batch(batch, mesh: Mesh):
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def commit_to_mesh(tree, mesh: Mesh):
    """Replicate onto ``mesh`` every leaf not already committed to it.

    A pytree mixing mesh-committed arrays (sharded params) with
    device-0-committed ones (fresh optimizer scalars like Adam's
    ``count``, the ``step`` counter, BN stats) cannot be fed to one
    jitted computation, and — used as the template for a checkpoint
    restore — bakes the inconsistency into the restore_args shardings.
    Leaves already on ``mesh`` (e.g. TP-sharded weights) are kept as-is.
    """
    rep = replicated(mesh)

    def _place(x):
        sh = getattr(x, "sharding", None)
        if isinstance(sh, NamedSharding) and sh.mesh == mesh:
            return x
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(_place, tree)
