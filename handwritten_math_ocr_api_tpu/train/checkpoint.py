"""Orbax checkpointing: capability parity with the reference's checkpoint
bundles (src/utils.py:61-80: model/optimizer/scaler/scheduler state + epoch
+ best metric), TPU-native storage (sharding-aware, async-safe, atomic).

Layout: ``<dir>/<name>/`` orbax PyTree checkpoint holding
{params, opt_state, model_state, step} plus a small JSON sidecar with
host-side scalars (epoch, metric, scheduler state, lr).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

from .step import TrainState

_META = "train_meta.json"


def _saved_tree(ckptr, path):
    """Top-level tree metadata of a saved checkpoint as a dict, handling
    both older orbax (plain dict) and newer (StepMetadata.item_metadata)."""
    try:
        saved = ckptr.metadata(path)
    except Exception:  # pragma: no cover - unreadable metadata
        return {}
    if isinstance(saved, dict):
        return saved
    tree = getattr(getattr(saved, "item_metadata", None), "tree", None)
    return tree if isinstance(tree, dict) else {}


def save_checkpoint(directory: str, name: str, state: TrainState,
                    epoch: int, metric: float,
                    scheduler_state: Optional[Dict] = None,
                    extra: Optional[Dict] = None) -> str:
    path = os.path.abspath(os.path.join(directory, name))
    ckptr = ocp.PyTreeCheckpointer()
    tree = {
        "params": state.params,
        "opt_state": state.opt_state,
        "model_state": state.model_state,
        "step": state.step,
    }
    if state.ema_params is not None:
        tree["ema_params"] = state.ema_params
    ckptr.save(path, tree, force=True)
    meta = {
        "epoch": epoch,
        "metric_value": metric,
        "scheduler": scheduler_state or {},
        "extra": extra or {},
    }
    with open(os.path.join(path, _META), "w") as f:
        json.dump(meta, f)
    return path


def load_checkpoint(directory: str, name: str, template: TrainState,
                    params_only: bool = False) -> Tuple[TrainState, Dict]:
    """Restore into the structure of ``template`` (shapes/dtypes/shardings).

    ``params_only``: skip the optimizer state — evaluation/serving loads
    must not depend on the training run's optimizer chain structure
    (e.g. whether warmup was enabled)."""
    path = os.path.abspath(os.path.join(directory, name))
    ckptr = ocp.PyTreeCheckpointer()
    target = {
        "params": template.params,
        "model_state": template.model_state,
        "step": template.step,
    }
    if not params_only:
        target["opt_state"] = template.opt_state
    # EMA shadow: restore it only when both the template tracks it and the
    # checkpoint has it (pre-EMA checkpoints resume with ema := params).
    want_ema = template.ema_params is not None
    has_ema = want_ema and "ema_params" in _saved_tree(ckptr, path)
    if has_ema:
        target["ema_params"] = template.ema_params
    partial = params_only or not has_ema
    # Explicit restore_args from the template: without them orbax falls
    # back to the sharding file written at save time, which breaks
    # cross-platform restores (e.g. TPU-saved checkpoint loaded on CPU).
    rargs = ocp.checkpoint_utils.construct_restore_args(target)
    try:
        restored = ckptr.restore(path, item=target, restore_args=rargs,
                                 partial_restore=partial)
    except TypeError:  # older orbax without partial_restore kwarg
        restored = ckptr.restore(path, item=target, restore_args=rargs)
    ema = template.ema_params
    if want_ema:
        if has_ema:
            ema = restored["ema_params"]
        else:
            # pre-EMA checkpoint: seed the shadow from the restored params
            # — as a COPY, never an alias. Aliased leaves share device
            # buffers with params, and the donating jitted train step then
            # frees the same buffer through both names (TPU runtime
            # INVALID_ARGUMENT on next use; found resuming a non-EMA
            # checkpoint with --ema-decay in round 4).
            ema = jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), restored["params"])
    state = template.replace(
        params=restored["params"],
        opt_state=(template.opt_state if params_only
                   else restored["opt_state"]),
        model_state=restored["model_state"], step=restored["step"],
        ema_params=ema)
    meta_path = os.path.join(path, _META)
    meta = json.load(open(meta_path)) if os.path.exists(meta_path) else {}
    return state, meta


def save_params_for_serving(directory: str, params, vocab: Dict[str, int],
                            model_cfg, model_state: Optional[Dict] = None
                            ) -> str:
    """Serving artifact: params (+ BN running stats for resnet encoders) +
    vocab.json + model config (replaces the reference's pickled-whole-module
    .pth: app/src/im2latex.py:7-12 — no arbitrary code execution on load)."""
    import dataclasses

    from ..core.tokenizer import save_vocab

    path = os.path.abspath(directory)
    os.makedirs(path, exist_ok=True)
    tree = {"params": params, "model_state": model_state or {}}
    ocp.PyTreeCheckpointer().save(
        os.path.join(path, "params"), tree, force=True)
    save_vocab(vocab, os.path.join(path, "vocab.json"))
    with open(os.path.join(path, "model_config.json"), "w") as f:
        json.dump(dataclasses.asdict(model_cfg), f, indent=2)
    return path


def _restore_serving_tree(ckpt_path: str, cfg):
    """Restore the serving params tree with restore_args derived from the
    model config, so an artifact exported on one platform (e.g. TPU)
    loads on another (e.g. a CPU host): without explicit shardings orbax
    reads the save-time sharding file, whose device may not exist here.
    Abstract shapes come from ``jax.eval_shape`` — no throwaway init."""
    import jax

    from ..models.model import init_model

    ckptr = ocp.PyTreeCheckpointer()
    try:
        abstract, _ = jax.eval_shape(
            lambda k: init_model(k, cfg), jax.random.PRNGKey(0))
        sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
        params_t = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                           sharding=sharding), abstract)
        # model_state (BN stats) structure is config-dependent; restore it
        # from saved metadata only if present.
        target = {"params": params_t, "model_state": {}}
        saved = _saved_tree(ckptr, ckpt_path)
        if saved.get("model_state"):
            state_t = jax.tree.map(
                lambda m: jax.ShapeDtypeStruct(tuple(m.shape), m.dtype,
                                               sharding=sharding),
                saved["model_state"])
            target["model_state"] = state_t
        rargs = ocp.checkpoint_utils.construct_restore_args(target)
        return ckptr.restore(ckpt_path, item=target, restore_args=rargs)
    except Exception:
        # legacy artifacts (params-only tree) or metadata quirks: the
        # plain restore is correct whenever save/load platforms match
        return ckptr.restore(ckpt_path)


def load_params_for_serving(directory: str):
    """Returns (params, model_state, vocab, idx2char, ModelConfig)."""
    from ..core.config import ModelConfig, ResNetConfig, SwinConfig
    from ..core.tokenizer import load_vocab

    path = os.path.abspath(directory)
    vocab, idx2char = load_vocab(os.path.join(path, "vocab.json"))
    with open(os.path.join(path, "model_config.json")) as f:
        raw = json.load(f)
    raw["swin"] = SwinConfig(**{**raw["swin"],
                                "depths": tuple(raw["swin"]["depths"]),
                                "num_heads": tuple(raw["swin"]["num_heads"])})
    raw["resnet"] = ResNetConfig(**{
        **raw["resnet"],
        "stage_channels": tuple(raw["resnet"]["stage_channels"]),
        "stage_blocks": tuple(raw["resnet"]["stage_blocks"])})
    cfg = ModelConfig(**raw)
    tree = _restore_serving_tree(os.path.join(path, "params"), cfg)
    if isinstance(tree, dict) and "params" in tree:  # current format
        params = tree["params"]
        model_state = tree.get("model_state") or {}
    else:  # legacy params-only artifact
        params, model_state = tree, {}
    return params, model_state, vocab, idx2char, cfg
