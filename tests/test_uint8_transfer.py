"""uint8 device transfer path: serving ships raw resized pixels and
normalizes on-device (data/preprocess.py:device_normalize) instead of
transferring float32 — 4x less host->device traffic per request (and 4x
less RSS growth from the remote-TPU runtime's per-transfer host-buffer
retention; BENCHMARKS.md "Serving memory under sustained load").

These tests pin that the uint8 path is numerically identical to the
float32 path (same x/255*2-1 arithmetic) through every decode surface:
the bucketed DecodeEngine (greedy + beam), the continuous slot decoder,
and the HTTP app (reference preprocess contract: app/src/preprocess.py:6-16).
"""

import io

import numpy as np
import pytest

import jax

from handwritten_math_ocr_api_tpu.core.config import (
    ModelConfig, ServeConfig, SwinConfig,
)
from handwritten_math_ocr_api_tpu.core.tokenizer import Tokenizer
from handwritten_math_ocr_api_tpu.data.preprocess import (
    device_normalize, normalize, resize_pil_u8,
)
from handwritten_math_ocr_api_tpu.decode.api import DecodeEngine
from handwritten_math_ocr_api_tpu.models.model import init_model

CFG = ModelConfig(
    d_model=32, nhead=4, dim_feedforward=64, dropout=0.0,
    num_decoder_layers=2, max_seq_len=12, vocab_size=20, dtype="float32",
    swin=SwinConfig(embed_dim=8, depths=(1, 1), num_heads=(2, 2),
                    window_size=4, stochastic_depth=0.0),
)


def _vocab():
    vocab = {"<pad>": 0, "<sos>": 1, "<eos>": 2, "<unk>": 3}
    for i in range(4, CFG.vocab_size):
        vocab[f"t{i}"] = i
    return vocab


@pytest.fixture(scope="module")
def setup():
    params, state = init_model(jax.random.PRNGKey(0), CFG)
    return params, state, Tokenizer(_vocab())


def _u8_images(n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, CFG.img_h, CFG.img_w, 1), np.uint8)


def _assert_same(a, b, tol=1e-5):
    """Formulas must match exactly; confidences to ~1e-5 relative (XLA
    fuses the on-device normalize into the surrounding graph, so the
    float32 rounding differs from the host path at the ~1e-8 level)."""
    assert [f for f, _ in a] == [f for f, _ in b]
    np.testing.assert_allclose([c for _, c in a], [c for _, c in b],
                               rtol=tol, atol=tol)


def test_device_normalize_matches_host():
    u8 = _u8_images(2)
    host = normalize(u8[..., 0])[..., None]
    dev = np.asarray(device_normalize(u8))
    np.testing.assert_array_equal(host, dev)


def test_engine_uint8_equals_float32(setup):
    params, state, tok = setup
    eng = DecodeEngine(params, state, CFG, tokenizer=tok)
    u8 = _u8_images(2)
    f32 = normalize(u8[..., 0])[..., None]
    _assert_same(eng.predict_with_confidence(u8),
                 eng.predict_with_confidence(f32))
    beam_u8 = eng.predict_batch(u8, beam_size=2)
    beam_f32 = eng.predict_batch(f32, beam_size=2)
    assert beam_u8 == beam_f32


def test_continuous_uint8_equals_float32(setup):
    from handwritten_math_ocr_api_tpu.decode.continuous import (
        ContinuousDecoder,
    )

    params, state, tok = setup
    u8 = _u8_images(3, seed=1)
    f32 = normalize(u8[..., 0])[..., None]

    def run(images):
        dec = ContinuousDecoder(params, state, CFG, tok, num_slots=4,
                                segment_steps=4)
        try:
            return dec.run_all(list(images))
        finally:
            dec.close()

    _assert_same(run(u8), run(f32))


def test_http_uint8_transfer_matches_float32():
    """Same PNG through the app with uint8_transfer on and off -> the
    same formula (the flag only moves WHERE normalize runs)."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer
    from PIL import Image

    from handwritten_math_ocr_api_tpu.serve.app import create_app
    from handwritten_math_ocr_api_tpu.train.checkpoint import (
        save_params_for_serving,
    )
    import tempfile

    params, _ = init_model(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(3)
    png = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (50, 120), np.uint8), "L").save(
        png, "PNG")
    payload = png.getvalue()

    with tempfile.TemporaryDirectory() as tmp:
        save_params_for_serving(tmp, params, _vocab(), CFG)

        def serve(uint8_transfer: bool) -> str:
            cfg = ServeConfig(model_dir=tmp, uint8_transfer=uint8_transfer)

            async def go():
                client = TestClient(TestServer(create_app(cfg)))
                await client.start_server()
                try:
                    import base64

                    r = await client.post(
                        "/predict",
                        json={"image_data":
                              base64.b64encode(payload).decode()})
                    body = await r.json()
                    assert r.status == 200, body
                    return body["formula"], body["confidence"]
                finally:
                    await client.close()

            return asyncio.new_event_loop().run_until_complete(go())

        _assert_same([serve(True)], [serve(False)])


def test_resize_pil_u8_is_preprocess_pil_before_normalize():
    from PIL import Image

    from handwritten_math_ocr_api_tpu.data.preprocess import preprocess_pil

    rng = np.random.default_rng(5)
    img = Image.fromarray(rng.integers(0, 255, (40, 100), np.uint8), "L")
    u8 = resize_pil_u8(img, 96, 320)
    assert u8.dtype == np.uint8 and u8.shape == (96, 320)
    np.testing.assert_array_equal(
        normalize(u8), preprocess_pil(img, 96, 320))
