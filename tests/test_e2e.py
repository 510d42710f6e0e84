"""End-to-end pipeline test through the CLI: synthetic data -> vocab ->
train (2 epochs, tiny model) -> evaluate -> predict. This is the
minimum-viable-slice guarantee: every stage of the framework runs against
the same artifacts a real user would produce."""

import json
import os

import pytest

from handwritten_math_ocr_api_tpu.cli import main

TINY_OVERRIDES = json.dumps({
    "d_model": 32, "nhead": 4, "dim_feedforward": 64,
    "num_decoder_layers": 2, "max_seq_len": 24, "dtype": "float32",
    "swin": {"embed_dim": 8, "depths": [1, 1], "num_heads": [2, 2],
             "window_size": 4, "stochastic_depth": 0.0},
})


pytestmark = pytest.mark.slow  # compile-heavy


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("e2e"))


def test_01_make_synthetic(workdir):
    assert main(["make-synthetic", "--data-root", f"{workdir}/data",
                 "--train", "16", "--val", "8", "--test", "8"]) == 0
    assert os.path.exists(f"{workdir}/data/train_labels.csv")


def test_02_build_vocab(workdir):
    assert main(["build-vocab", "--data-root", f"{workdir}/data",
                 "--checkpoint-dir", f"{workdir}/ckpt",
                 "--include-val"]) == 0
    vocab = json.load(open(f"{workdir}/ckpt/vocab.json"))
    assert vocab["vocab"]["<pad>"] == 0
    assert len(vocab["vocab"]) > 10


def test_03_train(workdir):
    assert main(["train", "--data-root", f"{workdir}/data",
                 "--checkpoint-dir", f"{workdir}/ckpt",
                 "--batch-size", "8", "--epochs", "2",
                 "--model-overrides", TINY_OVERRIDES]) == 0
    assert os.path.exists(f"{workdir}/ckpt/best_model")


def test_04_resume_training(workdir):
    assert main(["train", "--data-root", f"{workdir}/data",
                 "--checkpoint-dir", f"{workdir}/ckpt",
                 "--batch-size", "8", "--epochs", "3",
                 "--resume-from", "best_model",
                 "--model-overrides", TINY_OVERRIDES]) == 0


def test_05_evaluate_greedy_and_beam(workdir):
    assert main(["evaluate", "--data-root", f"{workdir}/data",
                 "--checkpoint-dir", f"{workdir}/ckpt",
                 "--batch-size", "8",
                 "--out-dir", f"{workdir}/results",
                 "--model-overrides", TINY_OVERRIDES]) == 0
    assert os.path.exists(f"{workdir}/results/test_results.csv")
    summary = open(f"{workdir}/results/summary.txt").read()
    assert "Exact-match acc" in summary and "Corpus CER" in summary

    assert main(["evaluate", "--data-root", f"{workdir}/data",
                 "--checkpoint-dir", f"{workdir}/ckpt",
                 "--batch-size", "8", "--beam-size", "3",
                 "--out-dir", f"{workdir}/results_beam",
                 "--model-overrides", TINY_OVERRIDES]) == 0
    assert "beam-3" in open(f"{workdir}/results_beam/summary.txt").read()


def test_06_predict_single(workdir, capsys):
    img = f"{workdir}/data/test_formulas/test_00000.png"
    assert main(["predict", img,
                 "--checkpoint-dir", f"{workdir}/ckpt",
                 "--model-overrides", TINY_OVERRIDES]) == 0
    out = capsys.readouterr().out
    assert "Predicted LaTeX:" in out and "Confidence:" in out


def test_07_serving_artifact_export(workdir):
    """Train ckpt -> serving artifact -> DecodeEngine load."""
    import jax

    from handwritten_math_ocr_api_tpu.core.config import Config
    from handwritten_math_ocr_api_tpu.core.tokenizer import load_vocab
    from handwritten_math_ocr_api_tpu.decode.api import DecodeEngine
    from handwritten_math_ocr_api_tpu.core.tokenizer import Tokenizer
    from handwritten_math_ocr_api_tpu.cli import _model_config
    from handwritten_math_ocr_api_tpu.train.checkpoint import (
        load_checkpoint, load_params_for_serving, save_params_for_serving,
    )
    from handwritten_math_ocr_api_tpu.train.step import create_train_state

    class A:
        encoder = "swin_t"
        model_overrides = TINY_OVERRIDES

    vocab, idx2char = load_vocab(f"{workdir}/ckpt/vocab.json")
    mc = _model_config(A, len(vocab))
    state, _ = create_train_state(jax.random.PRNGKey(0), mc, Config().train)
    state, _ = load_checkpoint(f"{workdir}/ckpt", "best_model", state)
    out = save_params_for_serving(f"{workdir}/trained-model", state.params,
                                  vocab, mc, model_state=state.model_state)
    params, mstate2, vocab2, idx2char2, mc2 = load_params_for_serving(out)
    assert vocab2 == vocab and mc2.d_model == mc.d_model

    import numpy as np

    eng = DecodeEngine(params, {}, mc2, tokenizer=Tokenizer(vocab2, idx2char2))
    latex, conf = eng.predict_single(
        np.zeros((96, 320, 1), np.float32))
    assert isinstance(latex, str) and 0 <= conf <= 1
