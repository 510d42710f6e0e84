"""Numerical parity of the Swin weight conversion (VERDICT r1 item 4).

Two independent pins on ``compat.torch_convert.convert_swin_encoder`` +
``models.swin.swin_apply`` against torchvision ``swin_t`` semantics
(the reference's shipped encoder, /root/reference/src/model_swin.py:17-46):

1. a live cross-framework oracle (tests/torch_swin_oracle.py — pure torch,
   shares no code with the JAX path) on the full production swin_t topology;
2. a committed golden artifact (tests/fixtures/swin_golden_small.npz) so
   future refactors are checked against a frozen byte-exact fixture even if
   torch's RNG or kernels change.

A wrong transpose, bias index, rel-bias permute, merge order, or shift mask
in either the converter or the JAX forward fails these at ~1e-3 scale.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from handwritten_math_ocr_api_tpu.compat.torch_convert import (
    convert_swin_encoder,
)
from handwritten_math_ocr_api_tpu.core.config import ModelConfig, SwinConfig
from handwritten_math_ocr_api_tpu.models.swin import swin_apply

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "swin_golden_small.npz")


def _assert_close(got, want, label, rel_tol=2e-4):
    """rel_tol is relative to the output's max magnitude: f32 accumulation
    noise sits at ~1e-4 (measured 3.3e-4 over the 12-block trunk) while any
    structural converter bug (wrong transpose/index) lands at O(1)."""
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    assert got.shape == want.shape, (got.shape, want.shape)
    scale = max(float(np.abs(want).max()), 1e-6)
    max_err = float(np.abs(got - want).max())
    assert max_err / scale < rel_tol, (
        f"{label}: max abs err {max_err:.3e} vs scale {scale:.3e}")


@pytest.mark.slow
def test_swin_conversion_matches_committed_golden():
    data = np.load(FIXTURE)
    sd = {k: data[k] for k in data.files if not k.startswith("__")}
    cfg = ModelConfig(swin=SwinConfig(embed_dim=16, depths=(2, 2, 2, 2),
                                      num_heads=(2, 2, 4, 4)))
    params = convert_swin_encoder(sd, cfg)
    images = jnp.asarray(data["__input__"].transpose(0, 2, 3, 1))
    out = swin_apply(params, images, cfg.swin, deterministic=True)
    _assert_close(out, data["__output__"], "golden")


@pytest.mark.slow
def test_swin_conversion_matches_torch_oracle_full_size():
    torch = pytest.importorskip("torch")
    from torch_swin_oracle import make_random_swin_state_dict, swin_features

    sd_t = make_random_swin_state_dict(seed=0)  # production swin_t topology
    g = torch.Generator().manual_seed(1)
    x = torch.randn(2, 1, 96, 320, generator=g)
    want = swin_features(sd_t, x).numpy()

    cfg = ModelConfig()  # flagship swin_t
    sd = {k: v.numpy() for k, v in sd_t.items()}
    params = convert_swin_encoder(sd, cfg)
    images = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    out = swin_apply(params, images, cfg.swin, deterministic=True)
    _assert_close(out, want, "full-size oracle", rel_tol=1e-3)


@pytest.mark.slow
def test_swin_per_stage_activations_match_committed_full_golden():
    """FULL-production-config per-stage goldens (VERDICT r3 item 5): the
    converter + JAX trunk must reproduce the committed torch-oracle
    activations at EVERY stage tap of the flagship swin_t topology, so a
    numerics regression is localized to the first diverging stage instead
    of surfacing only at the trunk output. Weights are regenerated from
    the committed torch seed (the artifact stores activations only)."""
    torch = pytest.importorskip("torch")
    from torch_swin_oracle import make_random_swin_state_dict

    from handwritten_math_ocr_api_tpu.models.swin import swin_apply_stages

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "swin_golden_stages_full.npz")
    data = np.load(path)
    sd_t = make_random_swin_state_dict(seed=0)
    cfg = ModelConfig()  # flagship swin_t
    sd = {k: v.numpy() for k, v in sd_t.items()}
    params = convert_swin_encoder(sd, cfg)
    images = jnp.asarray(data["__input__"].transpose(0, 2, 3, 1))
    taps = swin_apply_stages(params, images, cfg.swin)
    assert len(taps) == 5  # embed + 4 stages
    for i, tap in enumerate(taps):
        _assert_close(tap, data[f"stage_{i}"], f"stage_{i}", rel_tol=1e-3)
