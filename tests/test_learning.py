"""Learnability test: the full train -> decode pipeline must actually
learn. A tiny model overfits a small dataset whose images depict their
labels (PIL-rendered formulas); greedy decode must then reproduce most
training labels exactly. This guards against silent train-path breakage
that loss-goes-down tests miss (wrong targets, broken masks, dead
augmentation, tokenizer drift)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handwritten_math_ocr_api_tpu.core.config import (
    DataConfig, DecodeConfig, ModelConfig, SwinConfig, TrainConfig,
)
from handwritten_math_ocr_api_tpu.core.tokenizer import (
    Tokenizer, create_vocab_from_csvs,
)
from handwritten_math_ocr_api_tpu.data.dataset import (
    DataLoader, MathFormulaDataset,
)
from handwritten_math_ocr_api_tpu.data.synthetic import make_learnable_dataset
from handwritten_math_ocr_api_tpu.decode.api import DecodeEngine
from handwritten_math_ocr_api_tpu.train.step import (
    create_train_state, make_train_step,
)


pytestmark = pytest.mark.slow  # compile-heavy


@pytest.mark.slow
def test_pipeline_learns_to_read(tmp_path):
    root = str(tmp_path)
    make_learnable_dataset(root, splits=(("train", 8),), n_distinct=4)
    vocab = create_vocab_from_csvs([f"{root}/train_labels.csv"])
    tok = Tokenizer(vocab)

    cfg = ModelConfig(
        d_model=64, nhead=4, dim_feedforward=128, dropout=0.0,
        num_decoder_layers=2, max_seq_len=20, vocab_size=len(vocab),
        dtype="float32",
        swin=SwinConfig(embed_dim=16, depths=(1, 1), num_heads=(2, 2),
                        window_size=4, stochastic_depth=0.0),
    )
    tc = TrainConfig(learning_rate=2e-3)
    ds = MathFormulaDataset(f"{root}/train_formulas",
                            f"{root}/train_labels.csv", tok,
                            max_seq_len=cfg.max_seq_len)
    loader = DataLoader(ds, batch_size=8, shuffle=False, num_workers=2)
    batch = next(iter(loader))
    images = jnp.asarray(batch["image"])
    captions = jnp.asarray(batch["caption"])

    state, opt = create_train_state(jax.random.PRNGKey(0), cfg, tc)
    # disable augmentation so the 8 images are perfectly memorizable
    step = make_train_step(cfg, tc, opt,
                           data_cfg=DataConfig(aug_degrees=0.0,
                                               aug_shear=0.0,
                                               aug_scale=(1.0, 1.0)))
    key = jax.random.PRNGKey(1)
    loss = None
    for i in range(120):
        state, m = step(state, images, captions, key)
        loss = float(m["loss"])
        if loss < 0.8:
            break
    assert loss is not None and loss < 1.5, f"did not overfit: loss={loss}"

    engine = DecodeEngine(state.params, state.model_state, cfg,
                          DecodeConfig(max_seq_len=20, batch_buckets=(8,)),
                          tok)
    preds = engine.predict_batch(np.asarray(batch["image"]))
    targets = tok.decode_batch(np.asarray(captions))
    exact = sum(p == t for p, t in zip(preds, targets))
    assert exact >= 6, list(zip(preds, targets))
