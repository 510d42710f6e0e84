"""Pretrained-encoder fine-tune flow (round-2 verdict missing #2):
convert a torchvision-format swin_t state_dict -> encoder artifact ->
initialize training from it (`train --init-from`), with optional encoder
freeze epochs / LR multiplier. Mirrors the reference's quality recipe —
fine-tuning an ImageNet-pretrained swin_t with 1-channel patch surgery
(/root/reference/src/model_swin.py:17-34)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handwritten_math_ocr_api_tpu.compat import torch_convert as tc
from handwritten_math_ocr_api_tpu.core.config import (
    Config, DataConfig, ModelConfig, SwinConfig, TrainConfig,
)
from handwritten_math_ocr_api_tpu.core.tokenizer import Tokenizer
from handwritten_math_ocr_api_tpu.models import swin as swin_mod
from handwritten_math_ocr_api_tpu.train.checkpoint import (
    save_params_for_serving,
)
from handwritten_math_ocr_api_tpu.train.loop import train_model

TINY_SWIN = SwinConfig(embed_dim=8, depths=(1, 1), num_heads=(2, 2),
                       window_size=4, stochastic_depth=0.0)
TINY = ModelConfig(
    d_model=32, nhead=4, dim_feedforward=64, dropout=0.0,
    num_decoder_layers=2, max_seq_len=10, vocab_size=20, dtype="float32",
    swin=TINY_SWIN,
)


pytestmark = pytest.mark.slow  # compile-heavy


def _fake_torchvision_sd(cfg: SwinConfig, in_channels: int = 3):
    """Raw torchvision swin_t naming (no 'encoder.swin.' prefix), RGB
    patch embed — what an ImageNet .pth actually contains."""
    from test_compat import _fake_swin_sd

    sd = _fake_swin_sd(cfg)
    out = {k[len("encoder.swin."):]: v for k, v in sd.items()}
    rng = np.random.default_rng(7)
    out["features.0.0.weight"] = rng.standard_normal(
        (cfg.embed_dim, in_channels, cfg.patch_size, cfg.patch_size)
    ).astype(np.float32)
    return out


def _vocab():
    vocab = {"<pad>": 0, "<sos>": 1, "<eos>": 2, "<unk>": 3}
    for i in range(4, TINY.vocab_size):
        vocab[f"t{i}"] = i
    return vocab


def _batches(rng, n=2):
    out = []
    for _ in range(n):
        caps = rng.integers(4, TINY.vocab_size,
                            (8, TINY.max_seq_len)).astype(np.int32)
        caps[:, 0] = 1
        caps[:, -1] = 2
        out.append({
            "image": rng.standard_normal((8, 96, 320, 1)).astype(np.float32),
            "caption": caps,
        })
    return out


def test_convert_torchvision_swin_averages_rgb():
    sd = _fake_torchvision_sd(TINY_SWIN)
    params = tc.convert_torchvision_swin(sd, TINY)
    # 1-channel surgery: converted conv == RGB mean (src/model_swin.py:29-32)
    want = sd["features.0.0.weight"].mean(axis=1, keepdims=True)
    got = params["patch_embed"]["conv"]["w"]
    np.testing.assert_allclose(np.asarray(got),
                               want.transpose(2, 3, 1, 0), atol=1e-6)
    # tree matches a fresh init and the encoder runs
    init = swin_mod.init_swin_params(jax.random.PRNGKey(0), TINY_SWIN)
    got_shapes = jax.tree_util.tree_map(
        lambda x: tuple(np.shape(x)), params)
    want_shapes = jax.tree_util.tree_map(lambda x: tuple(x.shape), init)
    assert got_shapes == want_shapes
    out = swin_mod.swin_apply(
        jax.tree_util.tree_map(jnp.asarray, params),
        jnp.zeros((1, 96, 320, 1), jnp.float32), TINY_SWIN)
    assert out.shape[0] == 1


def _encoder_artifact(tmp_path):
    sd = _fake_torchvision_sd(TINY_SWIN)
    enc = jax.tree_util.tree_map(
        jnp.asarray, tc.convert_torchvision_swin(sd, TINY))
    art = str(tmp_path / "enc_artifact")
    save_params_for_serving(art, {"encoder": enc},
                            {"<pad>": 0, "<sos>": 1, "<eos>": 2, "<unk>": 3},
                            TINY)
    return art, enc


def _train(tmp_path, art, **kw):
    rng = np.random.default_rng(0)
    cfg = Config(model=TINY, data=DataConfig(batch_size=8, num_workers=0),
                 train=TrainConfig(checkpoint_dir=str(tmp_path / "ckpt"),
                                   epochs=2, checkpoint_every=100))
    return train_model(cfg, _batches(rng), _batches(rng),
                       Tokenizer(_vocab()), init_from=art, **kw)


def test_init_from_grafts_and_finetunes(tmp_path):
    """convert -> init -> 2 epochs: encoder starts at the converted
    weights and trains away from them; loss is finite."""
    art, enc = _encoder_artifact(tmp_path)
    state = _train(tmp_path, art)
    leaf = np.asarray(jax.device_get(
        state.params["encoder"]["patch_embed"]["conv"]["w"]))
    start = np.asarray(enc["patch_embed"]["conv"]["w"])
    assert leaf.shape == start.shape
    assert not np.allclose(leaf, start)          # it fine-tuned
    assert np.abs(leaf - start).max() < 0.2      # ... from that init


def test_freeze_encoder_epochs_pins_encoder(tmp_path):
    art, enc = _encoder_artifact(tmp_path)
    state = _train(tmp_path, art, freeze_encoder_epochs=2)
    leaf = np.asarray(jax.device_get(
        state.params["encoder"]["patch_embed"]["conv"]["w"]))
    np.testing.assert_allclose(leaf, np.asarray(
        enc["patch_embed"]["conv"]["w"]), atol=1e-7)  # frozen
    # the decoder trained meanwhile
    dec = np.asarray(jax.device_get(
        state.params["decoder"]["fc_out"]["b"]))
    assert np.abs(dec).max() > 0


def test_encoder_lr_mult_runs(tmp_path):
    art, _ = _encoder_artifact(tmp_path)
    state = _train(tmp_path, art, encoder_lr_mult=0.1)
    assert int(state.step) == 4  # 2 epochs x 2 batches


def test_graft_skips_incompatible_subtrees(tmp_path, caplog):
    """An artifact whose decoder has a different vocab grafts only the
    encoder; a fully incompatible artifact raises."""
    import logging

    from handwritten_math_ocr_api_tpu.models.model import init_model

    other = ModelConfig(**{**TINY.__dict__, "vocab_size": 33})
    params_other, _ = init_model(jax.random.PRNGKey(1), other)
    art = str(tmp_path / "mixed")
    save_params_for_serving(
        art, {"encoder": params_other["encoder"],
              "decoder": params_other["decoder"]},
        {"<pad>": 0, "<sos>": 1, "<eos>": 2, "<unk>": 3}, other)
    with caplog.at_level(logging.WARNING):
        state = _train(tmp_path, art)
    assert any("decoder" in r.message and "skipped" in r.message
               for r in caplog.records)
    assert state.params["decoder"]["fc_out"]["b"].shape[-1] == 20


def test_resume_across_optimizer_chain_change(tmp_path):
    """A checkpoint saved under one optimizer chain (no warmup — what
    extend-vocab / convert-gqa artifacts carry) must resume into a run
    whose chain differs (warmup on): params+EMA restore, the optimizer
    starts fresh, training proceeds (train/loop.py resume fallback)."""
    from handwritten_math_ocr_api_tpu.train.checkpoint import (
        save_checkpoint,
    )
    from handwritten_math_ocr_api_tpu.train.step import create_train_state

    rng = np.random.default_rng(0)
    ckdir = str(tmp_path / "ck")
    src, _ = create_train_state(jax.random.PRNGKey(5), TINY,
                                TrainConfig(ema_decay=0.999))  # no warmup
    save_checkpoint(ckdir, "best_model", src, epoch=0,
                    metric=float("inf"))
    marker = np.asarray(jax.device_get(
        src.params["decoder"]["embedding"]["table"]))

    cfg = Config(model=TINY, data=DataConfig(batch_size=8, num_workers=0),
                 train=TrainConfig(checkpoint_dir=ckdir, epochs=1,
                                   warmup_steps=100,  # different chain
                                   ema_decay=0.999, checkpoint_every=100))
    state = train_model(cfg, _batches(rng), _batches(rng),
                        Tokenizer(_vocab()), resume_from="best_model")
    got = np.asarray(jax.device_get(
        state.params["decoder"]["embedding"]["table"]))
    assert got.shape == marker.shape
    assert not np.allclose(got, marker)  # it actually trained from there
