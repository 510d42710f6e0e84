"""Train/eval steps: pure jitted functions over a TrainState pytree.

Semantics mirror the reference loop body (src/train.py:28-57): teacher-
forced forward on captions[:, :-1], label-smoothed CE against
captions[:, 1:] ignoring pad, global-norm grad clip 1.0, Adam update.
AMP autocast/GradScaler are replaced by straight bf16 compute (no loss
scaling needed — see train/optim.py).

Parallelism: the step is written sharding-agnostically; placing params
(parallel/mesh.py TP rules) and batches (P('data')) on a mesh makes
``jax.jit`` emit the psum/all-gather collectives automatically. Gradients
for replicated params are reduced over 'data' by GSPMD.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..core.config import PAD_ID, DataConfig, ModelConfig, TrainConfig
from ..data.augment import augment_and_normalize
from ..data.preprocess import device_normalize
from ..models import model as model_mod
from .losses import smoothed_cross_entropy, token_accuracy
from .optim import make_optimizer


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    model_state: Any  # BN running stats ({} for swin)
    step: jnp.ndarray
    # EMA shadow of params (None when TrainConfig.ema_decay == 0).
    ema_params: Any = None

    @property
    def eval_params(self):
        """Params the val pass / serving export should use: EMA when
        tracked, the raw iterate otherwise."""
        return self.params if self.ema_params is None else self.ema_params


def create_train_state(key, model_cfg: ModelConfig,
                       train_cfg: TrainConfig) -> Tuple[TrainState, optax.GradientTransformation]:
    params, model_state = model_mod.init_model(key, model_cfg)
    optimizer = make_optimizer(train_cfg)
    opt_state = optimizer.init(params)
    ema = (jax.tree_util.tree_map(jnp.copy, params)
           if train_cfg.ema_decay > 0 else None)
    return TrainState(params=params, opt_state=opt_state,
                      model_state=model_state,
                      step=jnp.zeros((), jnp.int32),
                      ema_params=ema), optimizer


def make_train_step(model_cfg: ModelConfig, train_cfg: TrainConfig,
                    optimizer: optax.GradientTransformation,
                    use_pallas: bool = False,
                    data_cfg: DataConfig | None = None,
                    encoder_update_scale: float = 1.0) -> Callable:
    """``images`` may be uint8 straight from the loader — normalization and
    the RandomAffine-equivalent augmentation (reference:
    src/data_loader.py:51) then run ON DEVICE, fused into the step. Float
    inputs are assumed pre-normalized (tests, custom pipelines).

    ``encoder_update_scale``: multiplier on the encoder subtree's *post-
    optimizer* updates — an exact per-subtree learning-rate split under
    Adam (whose updates are invariant to plain gradient scaling). 0.0
    freezes the encoder; <1.0 fine-tunes it gently (pretrained-encoder
    flow, reference posture: src/model_swin.py:17-34)."""
    aug_cfg = data_cfg or DataConfig()

    def train_step(state: TrainState, images, captions, rng
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        rng = jax.random.fold_in(rng, state.step)
        if images.dtype == jnp.uint8:
            rng, aug_rng = jax.random.split(rng)
            images = augment_and_normalize(aug_rng, images, aug_cfg)

        def loss_fn(params):
            logits, new_ms = model_mod.forward(
                params, state.model_state, model_cfg, images, captions,
                deterministic=False, rng=rng, training=True,
                use_pallas=use_pallas, remat=train_cfg.remat)
            loss = smoothed_cross_entropy(
                logits, captions[:, 1:], PAD_ID, train_cfg.label_smoothing)
            return loss, (new_ms, logits)

        (loss, (new_ms, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        if encoder_update_scale != 1.0:
            updates = dict(updates)
            updates["encoder"] = jax.tree_util.tree_map(
                lambda u: u * encoder_update_scale, updates["encoder"])
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if new_ema is not None:
            d = train_cfg.ema_decay
            # bias-corrected effective decay: ramps from 0 so the shadow
            # tracks early training instead of the random init
            d = jnp.minimum(d, (1.0 + state.step) / (10.0 + state.step))
            new_ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p.astype(e.dtype),
                new_ema, new_params)
        metrics = {
            "loss": loss,
            "accuracy": token_accuracy(logits, captions[:, 1:], PAD_ID),
            "grad_norm": optax.global_norm(grads),
        }
        new_state = state.replace(
            params=new_params, opt_state=new_opt,
            model_state=new_ms if new_ms else state.model_state,
            step=state.step + 1, ema_params=new_ema)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(model_cfg: ModelConfig, train_cfg: TrainConfig,
                   use_pallas: bool = False) -> Callable:
    def eval_step(state: TrainState, images, captions):
        if images.dtype == jnp.uint8:
            images = device_normalize(images)
        logits, _ = model_mod.forward(
            state.eval_params, state.model_state, model_cfg, images,
            captions, deterministic=True, use_pallas=use_pallas)
        loss = smoothed_cross_entropy(
            logits, captions[:, 1:], PAD_ID, train_cfg.label_smoothing)
        preds = jnp.argmax(logits, axis=-1)
        return loss, preds

    return jax.jit(eval_step)
