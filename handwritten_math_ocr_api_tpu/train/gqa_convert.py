"""MHA -> GQA/MQA conversion for fine-tuning (`convert-gqa`).

Round 4 measured the quality/capacity endpoints: trained MQA
(``nhead_kv=1``) costs −3.1 exact on handwriting for an 8x self-KV
shrink, while MHA pays full cache HBM (BENCHMARKS.md "Multi-query
attention"). The interesting frontier — GQA at ``nhead_kv`` 2 or 4 —
is cheapest to reach not by retraining from scratch but by MEAN-POOLING
the trained MHA checkpoint's K/V head groups (the GQA paper's uptraining
init: Ainslie et al. 2023, "GQA: Training Generalized Multi-Query
Transformer Models from Multi-Head Checkpoints") and fine-tuning
briefly.

Only decoder SELF-attention K/V projections shrink (models/decoder.py
packs them as ``w_qkv (D, D + 2*kv_dim)``); queries, output projections
and cross-attention keep full heads, exactly matching how
``ModelConfig.nhead_kv`` is consumed at runtime. The EMA shadow, when
present, is pooled identically.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

import jax

from ..core.config import ModelConfig, TrainConfig


def _pool_self_attn(sa: dict, d_model: int, nhead: int, head_dim: int,
                    new_kv: int) -> dict:
    """Mean-pool an MHA self_attn param dict's K/V columns into new_kv
    head groups. Input kv_dim must be nhead*head_dim (full MHA)."""
    w = np.asarray(sa["w_qkv"])
    b = np.asarray(sa["b_qkv"])
    D = d_model
    kv = w.shape[1] - D
    assert kv % 2 == 0
    kvd = kv // 2
    assert kvd == nhead * head_dim, (
        f"source checkpoint is not MHA: kv_dim {kvd} != "
        f"{nhead}*{head_dim}")
    group = nhead // new_kv

    def pool_cols(cols: np.ndarray) -> np.ndarray:
        # (..., nhead*head_dim) -> (..., new_kv, group, head_dim).mean
        h = cols.reshape(*cols.shape[:-1], new_kv, group, head_dim)
        return h.mean(axis=-2).reshape(*cols.shape[:-1],
                                       new_kv * head_dim)

    wq, wk, wv = w[:, :D], w[:, D:D + kvd], w[:, D + kvd:]
    bq, bk, bv = b[:D], b[D:D + kvd], b[D + kvd:]
    out = dict(sa)
    out["w_qkv"] = np.concatenate(
        [wq, pool_cols(wk), pool_cols(wv)], axis=1).astype(w.dtype)
    out["b_qkv"] = np.concatenate(
        [bq, pool_cols(bk), pool_cols(bv)], axis=0).astype(b.dtype)
    return out


def _pool_params(params, cfg: ModelConfig, new_kv: int):
    out = jax.tree_util.tree_map(lambda x: x, params)  # fresh containers
    dec = dict(out["decoder"])
    dec["layers"] = [
        {**layer, "self_attn": _pool_self_attn(
            dict(layer["self_attn"]), cfg.d_model, cfg.nhead,
            cfg.head_dim, new_kv)}
        for layer in dec["layers"]]
    out["decoder"] = dec
    return out


def convert_to_gqa(checkpoint_dir: str, checkpoint: str, out_dir: str,
                   model_cfg: ModelConfig, nhead_kv: int
                   ) -> Tuple[str, ModelConfig]:
    """Write ``out_dir/{vocab.json, <checkpoint>}`` with self-attention
    K/V pooled to ``nhead_kv`` groups, ready for
    ``train --resume-from --model-overrides '{"nhead_kv": G, ...}'``.

    ``model_cfg`` must describe the SOURCE (MHA) checkpoint. Returns
    (checkpoint path, the converted ModelConfig)."""
    import dataclasses
    import shutil

    from .checkpoint import load_checkpoint, save_checkpoint
    from .step import create_train_state

    if model_cfg.nhead % nhead_kv != 0:
        raise ValueError(f"nhead {model_cfg.nhead} not divisible by "
                         f"nhead_kv {nhead_kv}")
    tc = TrainConfig(ema_decay=0.999)  # allocate the EMA slot
    template, _ = create_train_state(jax.random.PRNGKey(0), model_cfg, tc)
    state, _meta = load_checkpoint(checkpoint_dir, checkpoint, template,
                                   params_only=True)

    params = _pool_params(state.params, model_cfg, nhead_kv)
    ema = (_pool_params(state.ema_params, model_cfg, nhead_kv)
           if state.ema_params is not None else None)

    cfg_new = dataclasses.replace(model_cfg, nhead_kv=nhead_kv)
    out_state, _ = create_train_state(jax.random.PRNGKey(0), cfg_new, tc)
    out_state = out_state.replace(params=params, ema_params=ema,
                                  model_state=state.model_state,
                                  step=state.step)
    os.makedirs(out_dir, exist_ok=True)
    src_vocab = os.path.join(checkpoint_dir, "vocab.json")
    if os.path.exists(src_vocab):
        shutil.copy(src_vocab, os.path.join(out_dir, "vocab.json"))
    path = save_checkpoint(out_dir, checkpoint, out_state, epoch=0,
                           metric=float("inf"),
                           extra={"gqa_from": os.path.join(
                               checkpoint_dir, checkpoint),
                               "nhead_kv": nhead_kv})
    return path, cfg_new
