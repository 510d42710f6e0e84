"""Data pipeline tests: dataset/loader over a synthetic corpus, on-device
augmentation properties, InkML parse + rasterize, preprocessing numerics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handwritten_math_ocr_api_tpu.core.config import (
    EOS_ID, SOS_ID, DataConfig, ModelConfig,
)
from handwritten_math_ocr_api_tpu.core.tokenizer import (
    Tokenizer, create_vocab_from_csvs,
)
from handwritten_math_ocr_api_tpu.data import inkml, synthetic
from handwritten_math_ocr_api_tpu.data.augment import (
    augment_and_normalize, random_affine_batch,
)
from handwritten_math_ocr_api_tpu.data.dataset import (
    DataLoader, MathFormulaDataset, get_data_loaders, get_test_loader,
)
from handwritten_math_ocr_api_tpu.data.preprocess import (
    device_normalize, normalize, preprocess_pil,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    synthetic.make_synthetic_dataset(root)
    vocab = create_vocab_from_csvs(
        [f"{root}/train_labels.csv", f"{root}/validate_labels.csv"])
    return root, Tokenizer(vocab)


def test_dataset_sample_contract(corpus):
    root, tok = corpus
    ds = MathFormulaDataset(f"{root}/train_formulas",
                            f"{root}/train_labels.csv", tok)
    img, ids, length = ds[0]
    assert img.shape == (96, 320) and img.dtype == np.uint8
    assert ids.shape == (150,) and ids.dtype == np.int32
    assert ids[0] == SOS_ID and EOS_ID in ids
    assert 2 <= length <= 150


def test_loader_batches_and_shuffle(corpus):
    root, tok = corpus
    ds = MathFormulaDataset(f"{root}/train_formulas",
                            f"{root}/train_labels.csv", tok)
    loader = DataLoader(ds, batch_size=8, shuffle=True, seed=0,
                        num_workers=2, drop_remainder=True)
    assert len(loader) == 4  # 32 samples / 8
    batches = list(loader)
    assert len(batches) == 4
    b = batches[0]
    assert b["image"].shape == (8, 96, 320, 1)
    assert b["caption"].shape == (8, 150)
    assert b["valid"].all()
    # different epoch -> different order
    batches2 = list(loader)
    assert not all(
        np.array_equal(a["caption"], b["caption"])
        for a, b in zip(batches, batches2))


def test_loader_remainder_padding(corpus):
    root, tok = corpus
    ds = MathFormulaDataset(f"{root}/test_formulas",
                            f"{root}/test_labels.csv", tok)
    loader = DataLoader(ds, batch_size=5, shuffle=False)  # 8 = 5 + 3
    batches = list(loader)
    assert len(batches) == 2
    last = batches[1]
    assert last["image"].shape[0] == 5  # padded to batch size
    assert last["valid"].sum() == 3
    assert not last["valid"][3:].any()


def test_get_loaders_api(corpus):
    root, tok = corpus
    dc = DataConfig(data_root=root, batch_size=8, num_workers=2)
    mc = ModelConfig()
    train, val = get_data_loaders(tok, dc, mc)
    test = get_test_loader(tok, dc, mc)
    assert len(train) == 4 and len(val) == 1 and len(test) == 1


def test_normalize_range():
    u8 = np.array([[0, 128, 255]], np.uint8)
    f = normalize(u8)
    assert f[0, 0] == -1.0 and f[0, 2] == 1.0
    dv = np.asarray(device_normalize(u8[None, ..., None]))
    np.testing.assert_allclose(dv[0, ..., 0], f, atol=1e-6)


def test_preprocess_pil_matches_reference_semantics():
    from PIL import Image

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 255, (50, 100, 3), np.uint8)
    img = Image.fromarray(raw, "RGB")
    out = preprocess_pil(img)
    assert out.shape == (96, 320)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_augment_identity_when_params_zero():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 64, 1)).astype(np.float32))
    out = random_affine_batch(jax.random.PRNGKey(0), x, degrees=0.0,
                              shear=0.0, scale_range=(1.0, 1.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_augment_changes_image_and_preserves_shape():
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 255, (4, 96, 320, 1), np.uint8)
    out = augment_and_normalize(jax.random.PRNGKey(1), jnp.asarray(u8),
                                DataConfig())
    assert out.shape == (4, 96, 320, 1)
    assert float(out.min()) >= -1.0 - 1e-6 and float(out.max()) <= 1.0 + 1e-6
    base = np.asarray(device_normalize(u8))
    assert not np.allclose(np.asarray(out), base)


def test_augment_is_jittable():
    fn = jax.jit(lambda k, x: random_affine_batch(k, x))
    x = jnp.zeros((1, 32, 32, 1))
    assert fn(jax.random.PRNGKey(0), x).shape == (1, 32, 32, 1)


def test_inkml_parse_and_rasterize():
    ink = inkml.parse_inkml(synthetic.SAMPLE_INKML)
    assert ink.best_label == "x ^ { 2 }"
    assert len(ink.strokes) == 2
    assert ink.strokes[0].shape == (4, 2)
    img = inkml.rasterize(ink, 96, 320)
    assert img.shape == (96, 320) and img.dtype == np.uint8
    assert (img < 250).any()  # something was drawn
    assert img[0, 0] == 255   # margins stay white


def test_inkml_empty_renders_blank():
    img = inkml.rasterize(inkml.Ink(strokes=[]), 96, 320)
    assert (img == 255).all()


def test_render_inkml_cli(tmp_path):
    from handwritten_math_ocr_api_tpu.cli import main

    d = tmp_path / "ink"
    d.mkdir()
    for i in range(2):
        (d / f"s{i}.inkml").write_text(synthetic.SAMPLE_INKML)
    assert main(["render-inkml", str(d), str(tmp_path / "imgs"),
                 str(tmp_path / "labels.csv")]) == 0
    import pandas as pd

    df = pd.read_csv(tmp_path / "labels.csv")
    assert len(df) == 2
    assert (tmp_path / "imgs" / "s0.png").exists()


def test_render_inkml_dir(tmp_path):
    d = tmp_path / "ink"
    d.mkdir()
    for i in range(3):
        (d / f"s{i}.inkml").write_text(synthetic.SAMPLE_INKML)
    n = inkml.render_inkml_dir(str(d), str(tmp_path / "imgs"),
                               str(tmp_path / "labels.csv"))
    assert n == 3
    import pandas as pd

    df = pd.read_csv(tmp_path / "labels.csv")
    assert list(df.columns) == ["image_filename", "latex_label"]
    assert len(df) == 3


def test_synthetic_stream_dataset():
    """Streaming corpus: fresh formulas per epoch, frozen streams pinned,
    grammar vocab covers every generated token (no <unk>)."""
    from handwritten_math_ocr_api_tpu.core.tokenizer import Tokenizer
    from handwritten_math_ocr_api_tpu.data.dataset import DataLoader
    from handwritten_math_ocr_api_tpu.data.synthetic import (
        SyntheticStreamDataset, grammar_vocab,
    )

    v = grammar_vocab()
    tok = Tokenizer(v, {i: t for t, i in v.items()})
    ds = SyntheticStreamDataset(tok, 8, seed=0)
    f0 = [ds.formula_at(i) for i in range(4)]
    ds.set_epoch(1)
    assert [ds.formula_at(i) for i in range(4)] != f0

    frozen = SyntheticStreamDataset(tok, 8, seed=0, freeze=True)
    frozen.set_epoch(5)
    assert [frozen.formula_at(i) for i in range(4)] == f0

    img, ids, ln = ds[0]
    assert img.shape == (96, 320) and img.dtype == np.uint8
    assert ids.shape == (150,) and 0 < ln <= 28 + 2

    unk = v["<unk>"]
    for i in range(300):
        assert unk not in tok.encode(ds.formula_at(i))

    loader = DataLoader(ds, batch_size=4, num_workers=2,
                        drop_remainder=True)
    e1 = [b["image"].sum() for b in loader]
    e2 = [b["image"].sum() for b in loader]
    assert e1 != e2  # set_epoch hook advances the stream
