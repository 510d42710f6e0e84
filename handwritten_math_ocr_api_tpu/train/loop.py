"""Training loop: epoch driver with val metrics, plateau LR, early stop,
periodic + best checkpointing, optional MLflow logging.

Control flow mirrors the reference (src/train.py:13-81 /
src/train_mlflow.py): per-epoch val pass computes edit-distance/CER/BLEU
from the argmax of teacher-forced logits (not a full decode — same as
src/train.py:50-57), scheduler steps on val loss, checkpoints land every
``checkpoint_every`` epochs plus a best-by-edit-distance copy, and training
stops after ``early_stop_patience`` epochs without improvement. Resuming
(``resume_from``) continues epochs/optimizer/scheduler where they left off
(reference: src/train.py:83-149).

MLflow is optional (not installed in this image): when importable and
``mlflow_experiment`` is set, params/metrics/checkpoints are logged like
src/train_mlflow.py:34-109 did.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Iterable, Optional

import jax
import numpy as np

from ..core.config import Config
from ..core.tokenizer import Tokenizer
from ..eval.metrics import compute_metrics
from ..parallel import mesh as mesh_lib
from . import checkpoint as ckpt_lib
from .optim import PlateauScheduler, get_learning_rate, set_learning_rate
from .plots import MetricHistory
from .step import TrainState, create_train_state, make_eval_step, make_train_step

log = logging.getLogger(__name__)


def _try_mlflow(experiment: Optional[str]):
    if not experiment:
        return None
    try:
        import mlflow

        mlflow.set_experiment(experiment)
        return mlflow
    except ImportError:
        log.warning("mlflow not installed; skipping experiment logging")
        return None


def _mlflow_log_dir(mlflow, checkpoint_dir: str, name: str,
                    artifact_path: str) -> None:
    """Log an orbax checkpoint DIRECTORY as an MLflow artifact tree
    (reference logged torch .pth files, src/train_mlflow.py:100-109; orbax
    checkpoints are directories so ``log_artifacts`` is the equivalent).
    Best-effort: artifact-store failures must never kill training."""
    path = os.path.join(checkpoint_dir, name)
    try:
        mlflow.log_artifacts(path, artifact_path=artifact_path)
    except Exception as exc:  # pragma: no cover - store-dependent
        log.warning("mlflow artifact logging failed for %s: %s", path, exc)


def _graft_init(state: TrainState, artifact_dir: str) -> TrainState:
    """Graft shape-compatible param subtrees from a serving artifact
    (converted torchvision/reference checkpoint, train.checkpoint format)
    into a fresh TrainState; re-init optimizer state afterwards.

    Subtrees whose structure or shapes mismatch (e.g. a decoder with a
    different vocab) are skipped with a warning, so an encoder-only
    artifact fine-tunes the encoder while the decoder trains fresh."""
    import jax.numpy as jnp

    src_params, src_ms, _, _, _ = ckpt_lib.load_params_for_serving(
        artifact_dir)
    params = dict(state.params)
    grafted = []
    for key, sub in src_params.items():
        if key not in params:
            log.warning("init-from: unknown subtree %r skipped", key)
            continue
        want = jax.tree_util.tree_map(lambda x: tuple(x.shape), params[key])
        try:
            got = jax.tree_util.tree_map(lambda x: tuple(x.shape), sub)
        except Exception:
            got = None
        if got != want:
            log.warning("init-from: subtree %r shape mismatch, skipped "
                        "(training it fresh)", key)
            continue
        params[key] = jax.tree_util.tree_map(jnp.asarray, sub)
        grafted.append(key)
    if not grafted:
        raise ValueError(f"init-from: nothing shape-compatible in "
                         f"{artifact_dir}")
    log.info("init-from %s: grafted %s", artifact_dir, grafted)
    model_state = state.model_state
    if src_ms:
        model_state = jax.tree_util.tree_map(jnp.asarray, src_ms)
    ema = state.ema_params
    if ema is not None:  # restart the shadow from the grafted weights
        ema = jax.tree_util.tree_map(jnp.copy, params)
    # opt_state is re-initialized by the caller AFTER any mesh sharding,
    # so its placement matches the (possibly sharded) params
    return state.replace(params=params, model_state=model_state,
                         ema_params=ema)


def train_model(
    cfg: Config,
    train_loader: Iterable,
    val_loader: Iterable,
    tokenizer: Tokenizer,
    *,
    mesh=None,
    resume_from: Optional[str] = None,
    mlflow_experiment: Optional[str] = None,
    use_pallas: bool = False,
    init_from: Optional[str] = None,
    freeze_encoder_epochs: int = 0,
    encoder_lr_mult: float = 1.0,
) -> TrainState:
    """Returns the final TrainState. Loaders yield dicts with
    ``image`` (B, H, W, 1) float32 and ``caption`` (B, max_seq_len) int32.

    ``init_from``: serving-artifact directory (e.g. a converted
    torchvision/reference checkpoint) whose shape-compatible param
    subtrees are grafted into the fresh model before training — the
    reference's fine-tune-a-pretrained-encoder posture
    (src/model_swin.py:17-34). ``freeze_encoder_epochs`` holds the
    encoder fixed for the first N epochs; ``encoder_lr_mult`` scales its
    updates afterwards (1.0 = shared LR, the reference behavior)."""
    tc, mc = cfg.train, cfg.model
    rng = jax.random.PRNGKey(tc.seed)
    state, optimizer = create_train_state(rng, mc, tc)
    if init_from:
        state = _graft_init(state, init_from)
    train_step = make_train_step(mc, tc, optimizer, use_pallas=use_pallas,
                                 data_cfg=cfg.data,
                                 encoder_update_scale=encoder_lr_mult)
    frozen_step = None
    if freeze_encoder_epochs > 0:
        frozen_step = make_train_step(mc, tc, optimizer,
                                      use_pallas=use_pallas,
                                      data_cfg=cfg.data,
                                      encoder_update_scale=0.0)
    eval_step = make_eval_step(mc, tc, use_pallas=use_pallas)
    scheduler = PlateauScheduler(factor=tc.plateau_factor,
                                 patience=tc.plateau_patience)
    start_epoch = 0
    best_edit_dist = float("inf")

    if mesh is None and len(jax.devices()) > 1:
        mesh = mesh_lib.make_mesh(data=-1, tensor=tc.tensor_axis)
    if mesh is not None:
        state = state.replace(
            params=mesh_lib.shard_params(state.params, mesh),
            ema_params=(None if state.ema_params is None else
                        mesh_lib.shard_params(state.ema_params, mesh)))
    if init_from or mesh is not None:
        # fresh optimizer state over the grafted and/or sharded params,
        # so moments/placement match (zeros_like inherits shardings)
        state = state.replace(opt_state=optimizer.init(state.params))
    if mesh is not None:
        # commit the scalar leaves (Adam count, step, BN stats) to the
        # mesh too: a mixed-placement TrainState is rejected by jit and,
        # as the resume template, poisons the restore_args shardings
        state = mesh_lib.commit_to_mesh(state, mesh)

    if resume_from:
        try:
            state, meta = ckpt_lib.load_checkpoint(tc.checkpoint_dir,
                                                   resume_from, state)
        except ValueError as e:
            # optimizer-chain structure changed between the checkpoint
            # and this run (e.g. warmup toggled, or an extend-vocab /
            # convert-gqa artifact saved with the default chain):
            # restore params+EMA only and start a fresh optimizer —
            # standard fine-tune semantics, losing only Adam moments
            log.warning("resume: checkpoint optimizer state does not "
                        "match this run's optimizer chain (%s); "
                        "restoring params only with a fresh optimizer",
                        str(e).splitlines()[0])
            state, meta = ckpt_lib.load_checkpoint(
                tc.checkpoint_dir, resume_from, state, params_only=True)
            state = state.replace(opt_state=optimizer.init(state.params))
        start_epoch = int(meta.get("epoch", 0))
        best_edit_dist = float(meta.get("metric_value", float("inf")))
        if meta.get("scheduler"):
            scheduler = PlateauScheduler.from_state_dict(meta["scheduler"])
        log.info("resumed from %s at epoch %d", resume_from, start_epoch)

    mlflow = _try_mlflow(mlflow_experiment)
    if mlflow:
        mlflow.start_run()
        mlflow.log_params({
            "learning_rate": tc.learning_rate, "epochs": tc.epochs,
            "label_smoothing": tc.label_smoothing,
            "encoder": mc.encoder, "d_model": mc.d_model,
        })

    data_rng = jax.random.PRNGKey(tc.seed + 1)
    no_improvement = 0
    history = MetricHistory()
    try:
        for epoch in range(start_epoch, tc.epochs):
            t0 = time.time()
            # ---- train pass ----
            step_fn = (frozen_step if frozen_step is not None
                       and epoch < freeze_encoder_epochs else train_step)
            train_losses = []
            for batch in train_loader:
                images, captions = batch["image"], batch["caption"]
                if mesh is not None:
                    images, captions = mesh_lib.shard_batch(
                        (images, captions), mesh)
                state, metrics = step_fn(state, images, captions, data_rng)
                train_losses.append(metrics["loss"])
            train_loss = float(np.mean(jax.device_get(train_losses)))

            # ---- val pass: loss + argmax metrics (src/train.py:42-57) ----
            val_losses, all_preds, all_tgts = [], [], []
            for batch in val_loader:
                images, captions = batch["image"], batch["caption"]
                if mesh is not None:
                    images, captions = mesh_lib.shard_batch(
                        (images, captions), mesh)
                loss, preds = eval_step(state, images, captions)
                val_losses.append(float(loss))
                preds = np.asarray(jax.device_get(preds))
                tgts = np.asarray(jax.device_get(captions))[:, 1:]
                all_preds.extend(tokenizer.decode_batch(preds))
                all_tgts.extend(tokenizer.decode_batch(tgts))
            val_loss = float(np.mean(val_losses)) if val_losses else 0.0
            metrics = compute_metrics(all_preds, all_tgts)

            # ---- schedule + logging ----
            lr = get_learning_rate(state.opt_state)
            new_lr = scheduler.step(val_loss, lr)
            if new_lr != lr:
                state = state.replace(opt_state=set_learning_rate(
                    state.opt_state, new_lr))
                log.info("plateau: lr %.2e -> %.2e", lr, new_lr)

            log.info(
                "epoch %d/%d | train %.4f | val %.4f | edit %.2f | cer %.4f "
                "| bleu %.4f | %.1fs",
                epoch + 1, tc.epochs, train_loss, val_loss,
                metrics["edit_distance"], metrics["cer"], metrics["bleu"],
                time.time() - t0)
            history.append(train_loss=train_loss, val_loss=val_loss,
                           edit_distance=metrics["edit_distance"],
                           cer=metrics["cer"], bleu=metrics["bleu"])
            if mlflow:
                mlflow.log_metrics({
                    "train_loss": train_loss, "val_loss": val_loss,
                    "edit_distance": metrics["edit_distance"],
                    "cer": metrics["cer"], "bleu": metrics["bleu"],
                    "lr": new_lr,
                }, step=epoch + 1)

            # ---- checkpointing (src/train.py:64-72) ----
            sched_sd = scheduler.state_dict()
            if (epoch + 1) % tc.checkpoint_every == 0:
                name = f"checkpoint_epoch_{epoch + 1}"
                ckpt_lib.save_checkpoint(
                    tc.checkpoint_dir, name,
                    state, epoch + 1, metrics["edit_distance"], sched_sd)
                if mlflow:  # per-epoch ckpt artifact (train_mlflow.py:103)
                    _mlflow_log_dir(mlflow, tc.checkpoint_dir, name,
                                    f"checkpoints/{name}")
            if metrics["edit_distance"] < best_edit_dist:
                best_edit_dist = metrics["edit_distance"]
                no_improvement = 0
                ckpt_lib.save_checkpoint(
                    tc.checkpoint_dir, "best_model", state, epoch + 1,
                    best_edit_dist, sched_sd)
                log.info("new best edit distance: %.2f", best_edit_dist)
                if mlflow:  # best-model artifact (train_mlflow.py:109's
                    #         log_model; orbax dir stands in for the
                    #         framework-specific model flavor)
                    _mlflow_log_dir(mlflow, tc.checkpoint_dir,
                                    "best_model", "model")
            else:
                no_improvement += 1
                log.info("no improvement %d/%d", no_improvement,
                         tc.early_stop_patience)
            if no_improvement >= tc.early_stop_patience:
                log.info("early stopping at epoch %d", epoch + 1)
                break
    finally:
        # training-curve artifact (reference: src/train_mlflow.py:124-141)
        plot_path = os.path.join(tc.checkpoint_dir, "training_curves.png")
        if history.save_plot(plot_path) and mlflow:
            mlflow.log_artifact(plot_path)
        if mlflow:
            mlflow.end_run()
    return state
