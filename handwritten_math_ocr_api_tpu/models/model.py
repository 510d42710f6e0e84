"""FormulaRecognitionModel: encoder + decoder, one implementation.

The reference shipped three near-duplicate model files (src/model_swin.py,
src/model_res18trans.py, src/model.py plus the app/src copy); here a single
functional model selects its encoder from ``ModelConfig.encoder`` and every
consumer (train, eval, decode engine, serving) goes through this module.

API:
- ``init_model(key, cfg) -> (params, state)``  (state = BN stats; {} for swin)
- ``encode(params, state, cfg, images, ...) -> (memory, new_state)``
- ``forward(...) -> (logits, new_state)`` — teacher-forced on
  captions[:, :-1] like the reference (src/model_swin.py:91-101)
- ``count_params(params) -> int``
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from . import decoder as decoder_mod
from . import layers, resnet, swin
from .layers import Array

State = Dict


def init_model(key, cfg: ModelConfig) -> Tuple[Dict, State]:
    k_enc, k_proj, k_dec, k_trans = jax.random.split(key, 4)
    state: State = {}
    if cfg.encoder == "swin_t":
        enc = swin.init_swin_params(k_enc, cfg.swin)
        proj = layers.linear_init(k_proj, cfg.swin.num_features, cfg.d_model)
    elif cfg.encoder in ("resnet18", "res18trans"):
        enc, bn_state = resnet.init_resnet_params(k_enc, cfg.resnet)
        state["resnet"] = bn_state
        proj = layers.linear_init(k_proj, cfg.resnet.stage_channels[-1],
                                  cfg.d_model)
    else:
        raise ValueError(f"unknown encoder: {cfg.encoder}")
    params = {
        "encoder": enc,
        "projection": proj,
        "decoder": decoder_mod.init_decoder_params(k_dec, cfg),
    }
    if cfg.encoder == "res18trans":
        params["trans_encoder"] = resnet.init_trans_encoder_params(k_trans, cfg)
    if cfg.memory_norm:
        params["memory_norm"] = layers.layer_norm_init(cfg.d_model)
    return params, state


def encode(params, state: State, cfg: ModelConfig, images: Array, *,
           deterministic: bool = True, rng=None, training: bool = False,
           use_pallas: bool = False,
           use_pallas_block: bool = False) -> Tuple[Array, State]:
    """images: (B, H, W, 1) normalized NHWC -> memory (B, L_enc, d_model).

    ``use_pallas_block``: whole-block Swin Pallas megakernel
    (ops/swin_block.py), inference only."""
    dtype = jnp.dtype(cfg.dtype)
    images = images.astype(dtype)
    new_state: State = {}
    if cfg.encoder == "swin_t":
        feats = swin.swin_apply(params["encoder"], images, cfg.swin,
                                deterministic=deterministic, rng=rng,
                                use_pallas=use_pallas,
                                use_pallas_block=use_pallas_block)
        memory = layers.linear(params["projection"], feats)
    else:
        feats, bn_state = resnet.resnet_apply(
            params["encoder"], state["resnet"], images, cfg.resnet,
            training=training)
        new_state["resnet"] = bn_state
        memory = resnet.height_pool_project(params["projection"], feats)
        if cfg.encoder == "res18trans":
            memory = resnet.trans_encoder_apply(
                params["trans_encoder"], memory, cfg,
                deterministic=deterministic, rng=rng)
    if cfg.memory_norm:
        memory = layers.layer_norm(params["memory_norm"], memory)
    return memory, new_state


def forward(params, state: State, cfg: ModelConfig, images: Array,
            captions: Array, *, deterministic: bool = True, rng=None,
            training: bool = False, use_pallas: bool = False,
            remat: bool = False) -> Tuple[Array, State]:
    """Teacher-forced training forward: logits over captions[:, :-1].

    Loss targets are captions[:, 1:] (reference: src/train.py:31-32).
    ``remat``: rematerialize the encoder in the backward pass
    (``jax.checkpoint``) — trades ~1 extra encoder forward for not keeping
    its activations in HBM, enabling larger train batches.
    """
    enc_rng = dec_rng = None
    if rng is not None:
        enc_rng, dec_rng = jax.random.split(rng)
    if remat and training:
        def enc_core(p, s, imgs, r):
            return encode(p, s, cfg, imgs, deterministic=deterministic,
                          rng=r, training=training, use_pallas=use_pallas)

        memory, new_state = jax.checkpoint(
            enc_core,
            policy=jax.checkpoint_policies.nothing_saveable,
        )(params, state, images, enc_rng)
    else:
        memory, new_state = encode(
            params, state, cfg, images, deterministic=deterministic,
            rng=enc_rng, training=training, use_pallas=use_pallas)
    logits = decoder_mod.decoder_forward(
        params["decoder"], cfg, memory, captions[:, :-1],
        deterministic=deterministic, rng=dec_rng)
    return logits, new_state


def count_params(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
