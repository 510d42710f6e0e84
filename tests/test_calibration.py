"""Confidence calibration: PAV/Platt math, harness CSV plumbing, CLI, and
serving application of calibration.json.

The reference served confidence = exp(mean log-prob) and documented it as
a probability (app/src/im2latex.py:50,55; app/src/models.py:10-16) without
ever measuring it; eval/calibration.py makes it a measured, correctable
quantity.
"""

import json
import os

import numpy as np
import pytest

from handwritten_math_ocr_api_tpu.eval import calibration as calib


def test_isotonic_pav_known_result():
    # classic PAV example: decreasing pair gets pooled
    x = [0.1, 0.2, 0.3, 0.4]
    y = [0, 1, 0, 1]  # violation between 0.2 (1) and 0.3 (0)
    xs, ys = calib.fit_isotonic(x, y)
    # fitted values must be non-decreasing and respect the data means
    assert all(b >= a - 1e-12 for a, b in zip(ys, ys[1:]))
    out = calib.apply({"method": "isotonic", "x": xs, "y": ys},
                      np.asarray(x))
    assert all(b >= a - 1e-12 for a, b in zip(out, out[1:]))
    # overall mean is preserved by isotonic regression
    assert abs(float(np.mean(out)) - np.mean(y)) < 1e-9


def test_isotonic_ties_single_valued():
    xs, ys = calib.fit_isotonic([0.5, 0.5, 0.5, 0.9], [0, 1, 1, 1])
    # one x value -> one fitted value
    assert len(xs) == len(set(xs))


def test_platt_recovers_distortion():
    rng = np.random.default_rng(0)
    n = 4000
    conf = rng.uniform(0.02, 0.99, n)
    # true correctness probability is a logistic in log-conf with a=2, b=1
    z = 2.0 * np.log(conf) + 1.0
    p = 1.0 / (1.0 + np.exp(-z))
    correct = rng.uniform(size=n) < p
    a, b = calib.fit_platt(conf, correct)
    assert abs(a - 2.0) < 0.3 and abs(b - 1.0) < 0.3
    art = calib.fit(conf, correct, method="platt")
    assert art["ece_calibrated"] < art["ece_raw"]


def test_reliability_and_ece_arithmetic():
    # two bins: [0.0-0.5) holds conf .25 acc 1.0; [0.5-1.0) conf .75 acc .5
    conf = [0.25, 0.25, 0.75, 0.75, 0.75, 0.75]
    correct = [True, True, True, True, False, False]
    rows = calib.reliability_table(conf, correct, n_bins=2)
    assert rows[0]["count"] == 2 and rows[0]["accuracy"] == 1.0
    assert rows[1]["count"] == 4 and rows[1]["accuracy"] == 0.5
    # ECE = (2*|1-.25| + 4*|.5-.75|)/6
    want = (2 * 0.75 + 4 * 0.25) / 6
    assert abs(calib.expected_calibration_error(conf, correct, 2)
               - want) < 1e-12


def test_artifact_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    conf = rng.uniform(0.05, 0.95, 200)
    correct = rng.uniform(size=200) < conf
    for method in ("platt", "isotonic"):
        art = calib.fit(conf, correct, method=method)
        p = tmp_path / f"{method}.json"
        calib.save(art, str(p))
        loaded = calib.load(str(p))
        assert loaded is not None and loaded["method"] == method
        s = calib.apply(loaded, 0.7)
        assert isinstance(s, float) and 0.0 <= s <= 1.0
        arr = calib.apply(loaded, conf)
        assert arr.shape == conf.shape
        np.testing.assert_allclose(calib.apply(art, conf), arr)
    assert calib.load(str(tmp_path / "missing.json")) is None
    (tmp_path / "bad.json").write_text("{}")
    assert calib.load(str(tmp_path / "bad.json")) is None


def test_cli_calibrate(tmp_path, capsys):
    import csv

    from handwritten_math_ocr_api_tpu.cli import main

    rng = np.random.default_rng(2)
    rows = []
    for i in range(300):
        c = float(rng.uniform(0.05, 0.99))
        rows.append({"index": i, "prediction": "x", "ground_truth": "x",
                     "exact_match": bool(rng.uniform() < c ** 2),
                     "cer": 0.0, "edit_distance": 0, "confidence": c})
    csv_path = tmp_path / "test_results.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    out = tmp_path / "calibration.json"
    rc = main(["calibrate", "--results", str(csv_path), "--out", str(out),
               "--method", "platt"])
    assert rc == 0
    art = json.load(open(out))
    assert art["method"] == "platt" and art["n_samples"] == 300
    assert art["ece_calibrated"] <= art["ece_raw"] + 1e-9
    assert "->" in capsys.readouterr().out


TINY = None


def _tiny_cfg():
    from handwritten_math_ocr_api_tpu.core.config import (
        ModelConfig, SwinConfig,
    )

    return ModelConfig(
        d_model=32, nhead=4, dim_feedforward=64, dropout=0.0,
        num_decoder_layers=2, max_seq_len=8, vocab_size=20,
        dtype="float32",
        swin=SwinConfig(embed_dim=8, depths=(1, 1), num_heads=(2, 2),
                        window_size=4, stochastic_depth=0.0))


def test_harness_records_confidence():
    import jax

    from handwritten_math_ocr_api_tpu.core.tokenizer import Tokenizer
    from handwritten_math_ocr_api_tpu.decode.api import DecodeEngine
    from handwritten_math_ocr_api_tpu.eval.harness import evaluate_model
    from handwritten_math_ocr_api_tpu.models.model import init_model

    cfg = _tiny_cfg()
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    vocab = {"<pad>": 0, "<sos>": 1, "<eos>": 2, "<unk>": 3}
    for i in range(4, cfg.vocab_size):
        vocab[f"t{i}"] = i
    tok = Tokenizer(vocab)
    engine = DecodeEngine(params, state, cfg, tokenizer=tok)
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.standard_normal((3, 96, 320, 1)).astype(np.float32),
        "caption": np.full((3, cfg.max_seq_len), 2, np.int32),
    }
    res = evaluate_model(engine, [batch], tok)
    assert len(res["records"]) == 3
    for r in res["records"]:
        assert r["confidence"] is not None
        assert 0.0 <= r["confidence"] <= 1.0
    assert "ece" in res["summary"]
    # beam rows carry no confidence (beam scores are a different quantity)
    res_b = evaluate_model(engine, [batch], tok, beam_size=2)
    assert all(r["confidence"] is None for r in res_b["records"])
    assert "ece" not in res_b["summary"]


def test_serving_applies_calibration(tmp_path):
    aiohttp = pytest.importorskip("aiohttp")  # noqa: F841
    import asyncio
    import io

    import jax
    from aiohttp.test_utils import TestClient, TestServer

    from handwritten_math_ocr_api_tpu.core.config import ServeConfig
    from handwritten_math_ocr_api_tpu.models.model import init_model
    from handwritten_math_ocr_api_tpu.serve.app import create_app
    from handwritten_math_ocr_api_tpu.train.checkpoint import (
        save_params_for_serving,
    )

    cfg = _tiny_cfg()
    params, _ = init_model(jax.random.PRNGKey(0), cfg)
    vocab = {"<pad>": 0, "<sos>": 1, "<eos>": 2, "<unk>": 3}
    for i in range(4, cfg.vocab_size):
        vocab[f"t{i}"] = i
    d = str(tmp_path / "trained-model")
    save_params_for_serving(d, params, vocab, cfg)

    from PIL import Image

    rng = np.random.default_rng(0)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (50, 120), np.uint8), "L").save(
        buf, "PNG")
    png = buf.getvalue()

    async def post_conf(client):
        form = aiohttp.FormData()
        form.add_field("file", png, filename="x.png",
                       content_type="image/png")
        async with client.post("/predict", data=form) as r:
            assert r.status == 200
            return (await r.json())["confidence"]

    def run_with(cfg_serve):
        async def go():
            app = create_app(cfg_serve)
            client = TestClient(TestServer(app))
            await client.start_server()
            try:
                return await post_conf(client)
            finally:
                await client.close()

        return asyncio.new_event_loop().run_until_complete(go())

    raw = run_with(ServeConfig(model_dir=d, calibration="off"))

    # identity-breaking platt artifact: sigmoid(0*log(c) + 2) = const
    art = {"method": "platt", "a": 0.0, "b": 2.0}
    with open(os.path.join(d, "calibration.json"), "w") as f:
        json.dump(art, f)
    cal = run_with(ServeConfig(model_dir=d))  # calibration="auto"
    assert abs(cal - 1.0 / (1.0 + np.exp(-2.0))) < 1e-6
    assert abs(cal - raw) > 1e-3  # actually changed the reported value
