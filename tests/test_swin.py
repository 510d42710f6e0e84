"""Swin encoder component tests: static index/mask construction vs brute
force, shape pipeline for the 96x320 input, and invariance properties."""

import pytest

import numpy as np

import jax
import jax.numpy as jnp

from handwritten_math_ocr_api_tpu.core.config import ModelConfig, SwinConfig
from handwritten_math_ocr_api_tpu.models import swin
from handwritten_math_ocr_api_tpu.models.model import encode, forward, init_model

TINY = SwinConfig(embed_dim=8, depths=(1, 1), num_heads=(2, 2), window_size=4,
                  stochastic_depth=0.0)


def test_relative_position_index_bruteforce():
    ws = 3
    idx = swin.relative_position_index(ws)
    # brute force over coordinate pairs
    coords = [(i, j) for i in range(ws) for j in range(ws)]
    for a, (ia, ja) in enumerate(coords):
        for b, (ib, jb) in enumerate(coords):
            expected = (ia - ib + ws - 1) * (2 * ws - 1) + (ja - jb + ws - 1)
            assert idx[a, b] == expected
    assert idx.max() == (2 * ws - 1) ** 2 - 1


def test_shift_mask_structure():
    # 8x8 map, window 4, shift 2 -> 4 windows; only windows touching the
    # wrap-around regions get nonzero entries
    mask = swin.shift_attention_mask(8, 8, 4, 2, 2)
    assert mask.shape == (4, 16, 16)
    assert np.all((mask == 0) | (mask == -100.0))
    assert np.all(mask[0] == 0)  # top-left window: single region
    assert (mask[1:] == -100.0).any()
    # symmetric blocking
    assert np.allclose(mask, np.transpose(mask, (0, 2, 1)))


def test_no_shift_mask_is_none():
    assert swin.shift_attention_mask(8, 8, 4, 0, 0) is None


def test_window_partition_roundtrip():
    x = jnp.arange(2 * 8 * 12 * 5, dtype=jnp.float32).reshape(2, 8, 12, 5)
    w = swin.window_partition(x, 4)
    assert w.shape == (2 * 2 * 3, 16, 5)
    back = swin.window_unpartition(w, 4, 2, 8, 12)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_swin_output_shape_96x320():
    cfg = ModelConfig(dtype="float32")
    key = jax.random.PRNGKey(0)
    params = swin.init_swin_params(key, cfg.swin)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 96, 320, 1))
    out = swin.swin_apply(params, x, cfg.swin)
    # stride-32 trunk: 3*10 tokens of 768 features (src/model_swin.py:40-44)
    assert out.shape == (1, 30, 768)


@pytest.mark.slow
def test_full_model_forward_shapes_all_encoders():
    for enc in ["swin_t", "resnet18", "res18trans"]:
        cfg = ModelConfig(
            encoder=enc, vocab_size=40, dtype="float32",
            num_decoder_layers=2, num_encoder_layers=2,
            swin=TINY, max_seq_len=16,
        )
        params, state = init_model(jax.random.PRNGKey(0), cfg)
        images = jax.random.normal(jax.random.PRNGKey(1), (2, 96, 320, 1))
        captions = jnp.ones((2, 12), jnp.int32)
        logits, _ = forward(params, state, cfg, images, captions)
        assert logits.shape == (2, 11, 40)  # teacher-forced on captions[:, :-1]

        memory, _ = encode(params, state, cfg, images)
        assert memory.shape[0] == 2 and memory.shape[2] == cfg.d_model
        expected_len = 30 if enc == "swin_t" else 10
        if enc == "swin_t":
            # tiny swin has 2 stages -> stride 8: (96/8)*(320/8)
            expected_len = (96 // 8) * (320 // 8)
        assert memory.shape[1] == expected_len


def test_shifted_window_attention_differs_from_unshifted():
    cfg = SwinConfig(embed_dim=8, depths=(1,), num_heads=(2,), window_size=4)
    key = jax.random.PRNGKey(0)
    p = swin._block_init(key, 8, 2, 4, 4.0)["attn"]
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 8))
    a = swin.window_attention(p, x, 4, 0, 2)
    b = swin.window_attention(p, x, 4, 2, 2)
    assert a.shape == b.shape == x.shape
    assert not np.allclose(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_flagship_param_count():
    """~34.4M params at vocab 544: torchvision swin_t trunk (27.5M; the
    reference's published 37.45M additionally counts the *unused* ImageNet
    classification head + final norm it never applies — src/model_swin.py:40
    — and a larger vocab) + 0.2M projection + 6.6M decoder."""
    from handwritten_math_ocr_api_tpu.models.model import (
        count_params, init_model,
    )

    cfg = ModelConfig(vocab_size=544, dtype="float32")
    params, _ = init_model(jax.random.PRNGKey(0), cfg)
    total = count_params(params)
    assert 33e6 < total < 36e6
    assert 27e6 < count_params(params["encoder"]) < 28.5e6
    assert 6e6 < count_params(params["decoder"]) < 7e6


@pytest.mark.slow
def test_patch_merging_gather_order():
    """2x2 gather must be [ee, oe, eo, oo] over (H, W) — torchvision order."""
    C = 4
    x = jnp.arange(1 * 4 * 4 * C, dtype=jnp.float32).reshape(1, 4, 4, C)
    p = {
        "norm": {"scale": jnp.ones(4 * C), "bias": jnp.zeros(4 * C)},
        # identity-ish reduction: pick out each quadrant's first channel
        "reduction": {"w": jnp.eye(4 * C, 2 * C)},
    }
    out = swin.patch_merging(p, x)
    assert out.shape == (1, 2, 2, 2 * C)
    # manual: position (0,0) gathers x[0,0], x[1,0], x[0,1], x[1,1]
    gathered = jnp.concatenate(
        [x[0, 0, 0], x[0, 1, 0], x[0, 0, 1], x[0, 1, 1]])
    mean = gathered.mean()
    var = gathered.var()
    normed = (gathered - mean) / np.sqrt(var + 1e-5)
    expected = normed @ np.eye(4 * C, 2 * C)
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), expected, atol=1e-5)


# ---------------------------------------------------------------------------
# Hand-derived ws=7 pins (VERDICT r3 item 5): the two highest-risk static
# constructs — rel-pos-bias indexing and shift-mask regions — checked at the
# PRODUCTION window size against literal hand-computed values and an
# independently-coded reconstruction of the written torchvision algorithm
# (band functions, not the helper's slice loops), so a shared misreading in
# the helper and the torch oracle cannot pass silently.
# ---------------------------------------------------------------------------

def test_relative_position_index_ws7_hand_values():
    idx = swin.relative_position_index(7)
    assert idx.shape == (49, 49)
    assert idx.min() == 0 and idx.max() == 168  # 13*13 - 1
    # literal hand-computed entries: cell a=(ra,ca) flattens to ra*7+ca,
    # index = (ra-rb+6)*13 + (ca-cb+6)
    assert idx[0, 0] == 84        # (0,0)->(0,0): 6*13+6
    assert idx[0, 48] == 0        # (0,0)->(6,6): 0*13+0
    assert idx[48, 0] == 168      # (6,6)->(0,0): 12*13+12
    assert idx[6, 42] == 12       # (0,6)->(6,0): 0*13+12
    assert idx[42, 6] == 156      # (6,0)->(0,6): 12*13+0
    assert idx[10, 30] == 46      # (1,3)->(4,2): 3*13+7
    # every diagonal entry is the center of the table
    assert np.all(np.diag(idx) == 84)
    # independent reconstruction from the written formula
    for a in range(49):
        for b in range(49):
            ra, ca = divmod(a, 7)
            rb, cb = divmod(b, 7)
            assert idx[a, b] == (ra - rb + 6) * 13 + (ca - cb + 6)


def _band(v, size, ws, shift):
    """Region band per the torchvision algorithm: [0, size-ws) main,
    [size-ws, size-shift) middle, [size-shift, size) wrapped."""
    if v < size - ws:
        return 0
    if v < size - shift:
        return 1
    return 2


def test_shift_mask_ws7_production_stage1_hand_regions():
    """Stage-1 production geometry for 96x320 input: 24x80 tokens padded
    to 28x84, ws 7 shift 3. Checked against an independently-coded band
    labeling plus literal hand-computed -100 counts."""
    pH, pW, ws, sh = 28, 84, 7, 3
    mask = swin.shift_attention_mask(pH, pW, ws, sh, sh)
    nwh, nww = pH // ws, pW // ws  # 4 x 12 windows
    assert mask.shape == (nwh * nww, 49, 49)

    # independent reconstruction: label(r, c) = 3*row_band + col_band
    for wh in range(nwh):
        for ww in range(nww):
            w = wh * nww + ww
            labels = [
                3 * _band(wh * ws + i, pH, ws, sh)
                + _band(ww * ws + j, pW, ws, sh)
                for i in range(ws) for j in range(ws)
            ]
            want = np.where(
                np.asarray(labels)[None, :] != np.asarray(labels)[:, None],
                -100.0, 0.0)
            np.testing.assert_array_equal(mask[w], want), (wh, ww)

    # literal hand-derived counts
    interior = mask[:3 * nww].reshape(-1, 49, 49)[
        [wh * nww + ww for wh in range(3) for ww in range(11)]]
    assert np.all(interior == 0)  # windows fully in the main bands
    # bottom-right window: 4x4/4x3/3x4/3x3 label blocks ->
    # 49^2 - (16^2 + 12^2 + 12^2 + 9^2) = 1776 blocked pairs
    assert int((mask[-1] == -100.0).sum()) == 1776
    # bottom-row (not last col): 28/21 row split -> 2*28*21 = 1176
    assert int((mask[3 * nww] == -100.0).sum()) == 1176
    # last-col (not bottom row): same by symmetry
    assert int((mask[nww - 1] == -100.0).sum()) == 1176


def test_shift_mask_ws7_production_stage4_clamped_hand_regions():
    """Stage-4 geometry: 3x10 tokens pad to 7x14; the h dim fits one
    window so the h shift clamps to 0 — rows are a single band and only
    column bands block. Window 0 is maskless; window 1 splits 4/3 cols:
    2*28*21 = 1176 blocked pairs."""
    mask = swin.shift_attention_mask(7, 14, 7, 0, 3)
    assert mask.shape == (2, 49, 49)
    assert np.all(mask[0] == 0)
    labels = [3 * 1 + _band(7 + j, 14, 7, 3) for _i in range(7)
              for j in range(7)]
    want = np.where(
        np.asarray(labels)[None, :] != np.asarray(labels)[:, None],
        -100.0, 0.0)
    np.testing.assert_array_equal(mask[1], want)
    assert int((mask[1] == -100.0).sum()) == 1176
