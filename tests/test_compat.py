"""Converter tests: decoder and resnet numerics vs torch modules built with
the reference's module names; swin mapping checked structurally (shapes)
against fabricated torchvision-style state dicts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handwritten_math_ocr_api_tpu.core.config import ModelConfig, SwinConfig
from handwritten_math_ocr_api_tpu.compat import torch_convert as tc
from handwritten_math_ocr_api_tpu.models import decoder as dec_mod
from handwritten_math_ocr_api_tpu.models import resnet as resnet_mod
from handwritten_math_ocr_api_tpu.models import swin as swin_mod

torch = pytest.importorskip("torch")
nn = torch.nn

CFG = ModelConfig(d_model=32, nhead=4, dim_feedforward=64, dropout=0.0,
                  num_decoder_layers=2, max_seq_len=16, vocab_size=30,
                  dtype="float32")


class RefDecoder(nn.Module):
    """Mirror of the reference DecoderTransformer's module names
    (src/model_swin.py:49-64)."""

    def __init__(self, cfg):
        super().__init__()
        self.embedding = nn.Embedding(cfg.vocab_size, cfg.d_model)
        self.pos_encoder = nn.Embedding(cfg.max_seq_len, cfg.d_model)
        layer = nn.TransformerDecoderLayer(cfg.d_model, cfg.nhead,
                                           cfg.dim_feedforward, 0.0)
        self.decoder = nn.TransformerDecoder(layer, cfg.num_decoder_layers)
        self.fc_out = nn.Linear(cfg.d_model, cfg.vocab_size)

    def forward(self, memory, tgt):
        L = tgt.size(1)
        x = self.embedding(tgt) + self.pos_encoder(torch.arange(L))[None]
        mask = torch.triu(torch.full((L, L), float("-inf")), diagonal=1)
        out = self.decoder(x.permute(1, 0, 2), memory.permute(1, 0, 2),
                           tgt_mask=mask)
        return self.fc_out(out.permute(1, 0, 2))


class Holder(nn.Module):
    def __init__(self, **mods):
        super().__init__()
        for k, v in mods.items():
            setattr(self, k, v)


def test_decoder_conversion_numerics():
    torch.manual_seed(0)
    ref = Holder(decoder=RefDecoder(CFG))
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = tc.convert_decoder(sd, CFG)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    rng = np.random.default_rng(0)
    memory = rng.standard_normal((2, 7, CFG.d_model), dtype=np.float32)
    ids = rng.integers(0, CFG.vocab_size, (2, 6))
    with torch.no_grad():
        want = ref.decoder(torch.tensor(memory), torch.tensor(ids)).numpy()
    got = dec_mod.decoder_forward(params, CFG, jnp.asarray(memory),
                                  jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


# --- resnet trunk: torch mirror with reference Sequential layout ----------

def _torch_basic_block(cin, cout, stride):
    class BasicBlock(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            if stride != 1 or cin != cout:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout))
            else:
                self.downsample = None

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return self.relu(out + idt)

    return BasicBlock()


def _torch_resnet_trunk():
    """children()[:-2] layout of torch resnet18 with 1-channel conv1
    (reference: src/model.py:19-32)."""
    torch.manual_seed(0)
    chans = [64, 128, 256, 512]
    seq = [
        nn.Conv2d(1, 64, 7, 2, 3, bias=False),
        nn.BatchNorm2d(64),
        nn.ReLU(inplace=True),
        nn.MaxPool2d(3, 2, 1),
    ]
    cin = 64
    for i, cout in enumerate(chans):
        blocks = []
        for b in range(2):
            stride = 2 if (b == 0 and i > 0) else 1
            blocks.append(_torch_basic_block(cin, cout, stride))
            cin = cout
        seq.append(nn.Sequential(*blocks))
    return nn.Sequential(*seq)


def test_resnet_conversion_numerics():
    trunk = _torch_resnet_trunk()
    trunk.eval()
    # randomize BN running stats so eval mode is a real test
    with torch.no_grad():
        for m in trunk.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    holder = Holder(features=trunk)
    sd = {f"encoder.{k}": v.detach().numpy()
          for k, v in holder.state_dict().items()}
    cfg = ModelConfig(encoder="resnet18", dtype="float32")
    params, state = tc.convert_resnet_encoder(sd, cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    state = jax.tree_util.tree_map(jnp.asarray, state)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 96, 320, 1), dtype=np.float32)
    with torch.no_grad():
        want = trunk(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    got, _ = resnet_mod.resnet_apply(params, state, jnp.asarray(x),
                                     cfg.resnet, training=False)
    got_nchw = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_nchw, want, atol=1e-3, rtol=1e-3)


# --- swin: structural mapping over a fabricated torchvision state dict ----

def _fake_swin_sd(cfg: SwinConfig):
    """All torchvision swin_t parameter names/shapes the converter reads."""
    rng = np.random.default_rng(0)
    sd = {}
    f = "encoder.swin.features"
    d = cfg.embed_dim
    ps = cfg.patch_size
    sd[f + ".0.0.weight"] = rng.standard_normal(
        (d, cfg.in_channels, ps, ps)).astype(np.float32)
    sd[f + ".0.0.bias"] = np.zeros(d, np.float32)
    sd[f + ".0.2.weight"] = np.ones(d, np.float32)
    sd[f + ".0.2.bias"] = np.zeros(d, np.float32)
    stage_idx = [1, 3, 5, 7]
    merge_idx = [2, 4, 6]
    for si, depth in enumerate(cfg.depths):
        C = d * 2 ** si
        for b in range(depth):
            bp = f"{f}.{stage_idx[si]}.{b}"
            sd[bp + ".norm1.weight"] = np.ones(C, np.float32)
            sd[bp + ".norm1.bias"] = np.zeros(C, np.float32)
            sd[bp + ".attn.qkv.weight"] = rng.standard_normal(
                (3 * C, C)).astype(np.float32)
            sd[bp + ".attn.qkv.bias"] = np.zeros(3 * C, np.float32)
            sd[bp + ".attn.proj.weight"] = rng.standard_normal(
                (C, C)).astype(np.float32)
            sd[bp + ".attn.proj.bias"] = np.zeros(C, np.float32)
            sd[bp + ".attn.relative_position_bias_table"] = (
                rng.standard_normal(((2 * cfg.window_size - 1) ** 2,
                                     cfg.num_heads[si])).astype(np.float32))
            sd[bp + ".norm2.weight"] = np.ones(C, np.float32)
            sd[bp + ".norm2.bias"] = np.zeros(C, np.float32)
            hidden = int(C * cfg.mlp_ratio)
            sd[bp + ".mlp.0.weight"] = rng.standard_normal(
                (hidden, C)).astype(np.float32)
            sd[bp + ".mlp.0.bias"] = np.zeros(hidden, np.float32)
            sd[bp + ".mlp.3.weight"] = rng.standard_normal(
                (C, hidden)).astype(np.float32)
            sd[bp + ".mlp.3.bias"] = np.zeros(C, np.float32)
        if si < len(cfg.depths) - 1:
            mp = f"{f}.{merge_idx[si]}"
            sd[mp + ".norm.weight"] = np.ones(4 * C, np.float32)
            sd[mp + ".norm.bias"] = np.zeros(4 * C, np.float32)
            sd[mp + ".reduction.weight"] = rng.standard_normal(
                (2 * C, 4 * C)).astype(np.float32)
    return sd


@pytest.mark.slow
def test_swin_conversion_structure_and_forward():
    cfg = ModelConfig(dtype="float32")
    sd = _fake_swin_sd(cfg.swin)
    params = tc.convert_swin_encoder(sd, cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    # tree structure must match a freshly initialized param tree exactly
    init = swin_mod.init_swin_params(jax.random.PRNGKey(0), cfg.swin)
    got_shapes = jax.tree_util.tree_map(lambda x: tuple(x.shape), params)
    want_shapes = jax.tree_util.tree_map(lambda x: tuple(x.shape), init)
    assert got_shapes == want_shapes

    # and it must run
    x = jnp.zeros((1, 96, 320, 1), jnp.float32)
    out = swin_mod.swin_apply(params, x, cfg.swin)
    assert out.shape == (1, 30, 768)


def test_convert_cli_to_serving_artifact(tmp_path):
    """convert-checkpoint CLI -> serving artifact -> engine decode, with
    BatchNorm running stats flowing through (resnet encoder)."""
    import json

    from handwritten_math_ocr_api_tpu.cli import main
    from handwritten_math_ocr_api_tpu.core.tokenizer import save_vocab
    from handwritten_math_ocr_api_tpu.train.checkpoint import (
        load_params_for_serving,
    )

    torch.manual_seed(0)
    model = Holder(
        encoder=Holder(features=_torch_resnet_trunk(),
                       projection=nn.Linear(512, CFG.d_model)),
        decoder=RefDecoder(CFG))
    pth = tmp_path / "best_model.pth"
    torch.save({"model_state_dict": model.state_dict()}, pth)
    vocab = {"<pad>": 0, "<sos>": 1, "<eos>": 2, "<unk>": 3}
    for i in range(4, CFG.vocab_size):
        vocab[f"t{i}"] = i
    vpath = tmp_path / "vocab.json"
    save_vocab(vocab, str(vpath))

    overrides = json.dumps({
        "d_model": CFG.d_model, "nhead": CFG.nhead,
        "dim_feedforward": CFG.dim_feedforward,
        "num_decoder_layers": CFG.num_decoder_layers,
        "max_seq_len": CFG.max_seq_len, "dtype": "float32",
    })
    out = str(tmp_path / "trained-model")
    assert main(["convert-checkpoint", str(pth), str(vpath), out,
                 "--encoder", "resnet18",
                 "--model-overrides", overrides]) == 0

    params, mstate, vocab2, idx2char, cfg2 = load_params_for_serving(out)
    assert "resnet" in mstate  # BN running stats present
    from handwritten_math_ocr_api_tpu.core.tokenizer import Tokenizer
    from handwritten_math_ocr_api_tpu.decode.api import DecodeEngine

    eng = DecodeEngine(params, mstate, cfg2,
                       tokenizer=Tokenizer(vocab2, idx2char))
    latex, conf = eng.predict_single(
        np.zeros((96, 320, 1), np.float32))
    assert isinstance(latex, str) and 0 <= conf <= 1


def test_full_checkpoint_bundle_roundtrip(tmp_path):
    """state-dict bundle (src/utils.py:61-71 format) -> converted model."""
    torch.manual_seed(0)
    model = Holder(
        encoder=Holder(features=_torch_resnet_trunk(),
                       projection=nn.Linear(512, CFG.d_model)),
        decoder=RefDecoder(CFG))
    path = tmp_path / "best_model.pth"
    torch.save({"model_state_dict": model.state_dict(), "epoch": 3,
                "metric_value": 1.0}, path)

    cfg = ModelConfig(encoder="resnet18", d_model=CFG.d_model,
                      nhead=CFG.nhead, dim_feedforward=CFG.dim_feedforward,
                      num_decoder_layers=CFG.num_decoder_layers,
                      max_seq_len=CFG.max_seq_len,
                      vocab_size=CFG.vocab_size, dtype="float32")
    params, state = tc.convert_checkpoint(str(path), cfg)

    from handwritten_math_ocr_api_tpu.models.model import forward

    images = jnp.zeros((1, 96, 320, 1), jnp.float32)
    captions = jnp.ones((1, 8), jnp.int32)
    logits, _ = forward(params, state, cfg, images, captions)
    assert logits.shape == (1, 7, CFG.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
