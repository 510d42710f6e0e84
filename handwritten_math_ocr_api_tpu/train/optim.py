"""Optimizer assembly + ReduceLROnPlateau-equivalent scheduling.

The reference trains with Adam(3e-4), grad-clip 1.0 and
``ReduceLROnPlateau(mode='min', factor=0.5, patience=3)`` stepped on val
loss once per epoch (reference: src/train.py:15-18,37,62). Torch's plateau
scheduler is host-side epoch-level logic, so we mirror it as a small host
class driving ``optax.inject_hyperparams`` — the learning rate lives in the
optimizer state and can be updated without recompiling the train step.

bf16 note: the reference needed AMP GradScaler on CUDA fp16
(src/train.py:17); bf16 on TPU has fp32-range exponents, so no loss
scaling is required — the scaler is intentionally absent.
"""

from __future__ import annotations

import dataclasses

import optax

from ..core.config import TrainConfig


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """clip-by-global-norm 1.0 -> Adam, with injectable learning rate.

    Optional linear LR warmup (``cfg.warmup_steps``) is applied as a
    multiplicative stage *after* Adam so it composes with the injected
    plateau-scheduled learning rate (post-norm transformer decoders stall
    at the uniform-logits plateau without warmup at lr 3e-4; the reference
    avoided this only by its 220k-sample epoch length)."""
    adam = optax.inject_hyperparams(optax.adam)(
        learning_rate=cfg.learning_rate)
    stages = [optax.clip_by_global_norm(cfg.grad_clip_norm), adam]
    if cfg.warmup_steps > 0:
        import jax.numpy as jnp

        w = float(cfg.warmup_steps)
        stages.append(optax.scale_by_schedule(
            lambda step: jnp.minimum(1.0, (step + 1.0) / w)))
    return optax.chain(*stages)


def get_learning_rate(opt_state) -> float:
    """Read the injected learning rate out of a chained optimizer state."""
    return float(opt_state[1].hyperparams["learning_rate"])


def set_learning_rate(opt_state, lr: float):
    """Return a new opt_state with the injected learning rate replaced."""
    import jax.numpy as jnp

    inner = opt_state[1]
    hp = dict(inner.hyperparams)
    old = jnp.asarray(hp["learning_rate"])
    hp["learning_rate"] = jnp.asarray(lr, dtype=old.dtype)
    return (opt_state[0], inner._replace(hyperparams=hp)) + tuple(opt_state[2:])


@dataclasses.dataclass
class PlateauScheduler:
    """torch ReduceLROnPlateau(mode='min') semantics, epoch-level."""

    factor: float = 0.5
    patience: int = 3
    min_lr: float = 0.0
    best: float = float("inf")
    num_bad_epochs: int = 0

    def step(self, metric: float, lr: float) -> float:
        """Feed the epoch's val metric; returns the (possibly reduced) lr."""
        if metric < self.best:
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.num_bad_epochs = 0
            return max(lr * self.factor, self.min_lr)
        return lr

    def state_dict(self) -> dict:
        return {"factor": self.factor, "patience": self.patience,
                "min_lr": self.min_lr, "best": self.best,
                "num_bad_epochs": self.num_bad_epochs}

    @classmethod
    def from_state_dict(cls, d: dict) -> "PlateauScheduler":
        return cls(**d)
