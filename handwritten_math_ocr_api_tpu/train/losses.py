"""Training loss: label-smoothed cross-entropy with pad masking.

Matches ``torch.nn.CrossEntropyLoss(ignore_index=pad, label_smoothing=0.1)``
(reference: src/train.py:16): smoothing mass is spread uniformly over ALL
classes (including the pad class), ignored positions are excluded from the
mean. Verified against torch in tests/test_train.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.layers import Array


def smoothed_cross_entropy(
    logits: Array,
    targets: Array,
    pad_id: int,
    label_smoothing: float = 0.1,
) -> Array:
    """logits: (..., V) f32; targets: (...) int. Returns scalar mean loss
    over non-pad targets."""
    V = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    smooth = -jnp.mean(logp, axis=-1)  # uniform over all V classes
    eps = label_smoothing
    per_token = (1.0 - eps) * nll + eps * smooth
    mask = (targets != pad_id).astype(jnp.float32)
    total = jnp.sum(per_token * mask)
    count = jnp.maximum(jnp.sum(mask), 1.0)
    return total / count


def token_accuracy(logits: Array, targets: Array, pad_id: int) -> Array:
    """Teacher-forced next-token accuracy over non-pad positions."""
    pred = jnp.argmax(logits, axis=-1)
    mask = targets != pad_id
    correct = jnp.sum((pred == targets) & mask)
    return correct / jnp.maximum(jnp.sum(mask), 1)
