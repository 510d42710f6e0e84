"""Vocabulary extension for fine-tuning: append tokens, resize the head.

The reference's vocab is corpus-derived and frozen at training time
(reference: src/utils.py:101-112); teaching its model a construct absent
from the training corpus (e.g. the ``\\begin{matrix}`` environments real
MathWriting contains and the serving cleanup expects,
app/src/utils.py:22-27) would require a full retrain because token ids are
assigned by sorted order — inserting a token renumbers everything.

This module instead APPENDS new tokens after the existing ids (the vocab
JSON is an explicit token->id map, so nothing requires sortedness of an
extended artifact) and grows exactly the three vocab-sized parameter
leaves:

- ``decoder/embedding/table`` (V, d): new rows start at the mean of the
  existing embedding rows plus small noise — in-distribution inputs for
  the frozen decoder stack;
- ``decoder/fc_out/w`` (d, V): new columns start near zero, and
- ``decoder/fc_out/b`` (V,): new biases start at the existing minimum,

so the extended model's logits over OLD tokens are bit-identical to the
source checkpoint (softmax changes only by the tiny new-token mass) and
fine-tuning starts from the original model's quality instead of from
noise. The EMA shadow, when present, is resized the same way so
``--ema-decay`` fine-tunes resume cleanly.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import ModelConfig, TrainConfig
from ..core.tokenizer import load_vocab, save_vocab


def extend_vocab_map(vocab: Dict[str, int],
                     new_tokens: Sequence[str]) -> Dict[str, int]:
    """Append ``new_tokens`` (deduplicated, sorted) after the last id."""
    out = dict(vocab)
    nxt = max(out.values()) + 1
    for tok in sorted(set(new_tokens) - set(out)):
        out[tok] = nxt
        nxt += 1
    return out


def _grow(params, old_v: int, new_v: int, rng: np.random.Generator):
    """Return a copy of ``params`` with the three vocab-sized decoder
    leaves grown from ``old_v`` to ``new_v`` (see module docstring)."""
    dec = params["decoder"]
    emb = np.asarray(dec["embedding"]["table"])
    assert emb.shape[0] == old_v, (emb.shape, old_v)
    d_model = emb.shape[1]
    n_new = new_v - old_v
    mean_row = emb.mean(axis=0, keepdims=True)
    new_rows = (mean_row
                + rng.normal(0.0, 0.02, (n_new, d_model))).astype(emb.dtype)
    w = np.asarray(dec["fc_out"]["w"])
    b = np.asarray(dec["fc_out"]["b"])
    new_w = rng.normal(0.0, 0.02, (d_model, n_new)).astype(w.dtype)
    new_b = np.full((n_new,), float(b.min()), dtype=b.dtype)

    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    out["decoder"] = dict(dec)
    out["decoder"]["embedding"] = dict(dec["embedding"])
    out["decoder"]["embedding"]["table"] = jnp.asarray(
        np.concatenate([emb, new_rows], axis=0))
    out["decoder"]["fc_out"] = dict(dec["fc_out"])
    out["decoder"]["fc_out"]["w"] = jnp.asarray(
        np.concatenate([w, new_w], axis=1))
    out["decoder"]["fc_out"]["b"] = jnp.asarray(
        np.concatenate([b, new_b], axis=0))
    return out


def extend_checkpoint(checkpoint_dir: str, checkpoint: str, out_dir: str,
                      model_cfg: ModelConfig,
                      new_tokens: Optional[Sequence[str]] = None,
                      seed: int = 0) -> Tuple[str, List[str]]:
    """Write ``out_dir/{vocab.json, <checkpoint>}``: the extended vocab
    and a resized checkpoint ready for ``train --resume-from``.

    ``model_cfg`` must describe the SOURCE checkpoint (its vocab_size is
    overwritten from the source vocab). Returns (out path, added tokens).
    """
    import dataclasses

    from .checkpoint import load_checkpoint, save_checkpoint
    from .step import create_train_state

    if new_tokens is None:
        from ..data.synthetic import ENV_TOKENS
        new_tokens = ENV_TOKENS

    vocab, _ = load_vocab(os.path.join(checkpoint_dir, "vocab.json"))
    old_v = max(vocab.values()) + 1
    new_vocab = extend_vocab_map(vocab, new_tokens)
    added = [t for t in new_vocab if t not in vocab]
    new_v = max(new_vocab.values()) + 1

    mc_old = dataclasses.replace(model_cfg, vocab_size=old_v)
    tc = TrainConfig(ema_decay=0.999)  # allocate the EMA slot; restore
    # fills it from the checkpoint when present, else copies params
    template, _ = create_train_state(jax.random.PRNGKey(0), mc_old, tc)
    state, _meta = load_checkpoint(checkpoint_dir, checkpoint, template,
                                   params_only=True)

    rng = np.random.default_rng(seed)
    params = _grow(state.params, old_v, new_v, rng)
    # identical noise for the shadow: EMA(new rows) == new rows at t=0
    ema = (_grow(state.ema_params, old_v, new_v,
                 np.random.default_rng(seed))
           if state.ema_params is not None else None)

    mc_new = dataclasses.replace(model_cfg, vocab_size=new_v)
    out_state, _ = create_train_state(jax.random.PRNGKey(0), mc_new, tc)
    out_state = out_state.replace(params=params, ema_params=ema,
                                  model_state=state.model_state,
                                  step=state.step)

    os.makedirs(out_dir, exist_ok=True)
    save_vocab(new_vocab, os.path.join(out_dir, "vocab.json"))
    # fresh fine-tune bookkeeping: epoch 0, no best metric, no scheduler
    path = save_checkpoint(out_dir, checkpoint, out_state, epoch=0,
                           metric=float("inf"),
                           extra={"extended_from": os.path.join(
                               checkpoint_dir, checkpoint),
                               "added_tokens": added})
    return path, added
