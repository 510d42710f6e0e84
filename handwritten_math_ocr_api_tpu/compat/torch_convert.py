"""PyTorch .pth checkpoint -> JAX params converter.

Lets a user of the reference bring their trained weights across: handles
both reference artifact styles (SURVEY §5) — training checkpoints that
bundle ``model_state_dict`` (reference: src/utils.py:61-71) and the
serving artifact that pickles the whole module (app/src/im2latex.py:7-12;
we call ``.state_dict()`` on it) — for all three encoder variants.

Key mappings (torch (out, in) linear weights are transposed to our
(in, out); convs OIHW -> HWIO):
- decoder (src/model_swin.py:49-88): ``decoder.embedding.weight``,
  ``decoder.pos_encoder.weight``, ``decoder.{decoder|transformer_decoder}
  .layers.N.{self_attn,multihead_attn,linear1,linear2,norm1..3}``,
  ``decoder.fc_out``;
- swin encoder (torchvision swin_t under ``encoder.swin.features``):
  patch embed ``features.0.{0,2}``, stage blocks ``features.{1,3,5,7}.B``
  (norm1/2, attn.qkv, attn.proj, attn.relative_position_bias_table,
  mlp.{0,3}), patch merging ``features.{2,4,6}`` — the trunk's final
  ``norm``/``head`` are unused by the reference (src/model_swin.py:40) and
  skipped;
- resnet encoder (src/model.py:13-36): ``encoder.features.{0,1,4..7}`` ->
  conv1/bn1/layers, plus ``encoder.projection`` and (res18trans) the
  transformer encoder stack.

Numerical parity of the decoder mapping is asserted against torch core in
tests/test_compat.py. The swin mapping is asserted numerically against an
independent pure-torch torchvision-semantics oracle plus a committed golden
fixture (tests/test_swin_parity.py); resnet mappings are shape-exact.
"""

from __future__ import annotations

import logging
from typing import Dict, Tuple

import jax

import numpy as np

from ..core.config import ModelConfig

logger = logging.getLogger(__name__)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a .pth file into {name: np.ndarray} without keeping torch
    tensors alive. Accepts state-dict bundles or whole pickled modules."""
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    elif isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    return {k: np.asarray(v.detach().cpu().numpy())
            for k, v in obj.items() if hasattr(v, "detach")}


def _lin(sd, prefix) -> Dict[str, np.ndarray]:
    p = {"w": sd[f"{prefix}.weight"].T}
    if f"{prefix}.bias" in sd:
        p["b"] = sd[f"{prefix}.bias"]
    return p


def _ln(sd, prefix) -> Dict[str, np.ndarray]:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _mha(sd, prefix) -> Dict[str, np.ndarray]:
    return {
        "w_qkv": sd[f"{prefix}.in_proj_weight"].T,
        "b_qkv": sd[f"{prefix}.in_proj_bias"],
        "w_out": sd[f"{prefix}.out_proj.weight"].T,
        "b_out": sd[f"{prefix}.out_proj.bias"],
    }


def _conv(sd, key) -> Dict[str, np.ndarray]:
    return {"w": sd[key].transpose(2, 3, 1, 0)}  # OIHW -> HWIO


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def convert_decoder(sd: Dict[str, np.ndarray], cfg: ModelConfig,
                    prefix: str = "decoder") -> Dict:
    """Reference DecoderTransformer -> our decoder params. The inner torch
    TransformerDecoder is named ``decoder`` in model_swin.py:62 and
    ``transformer_decoder`` in model.py:60 — both accepted."""
    inner = None
    for cand in ("decoder", "transformer_decoder"):
        if f"{prefix}.{cand}.layers.0.self_attn.in_proj_weight" in sd:
            inner = f"{prefix}.{cand}"
            break
    if inner is None:
        raise KeyError(f"no transformer decoder layers under '{prefix}.*'")

    layers_p = []
    for i in range(cfg.num_decoder_layers):
        lp = f"{inner}.layers.{i}"
        layers_p.append({
            "self_attn": _mha(sd, f"{lp}.self_attn"),
            "cross_attn": _mha(sd, f"{lp}.multihead_attn"),
            "norm1": _ln(sd, f"{lp}.norm1"),
            "norm2": _ln(sd, f"{lp}.norm2"),
            "norm3": _ln(sd, f"{lp}.norm3"),
            "ffn": {"fc1": _lin(sd, f"{lp}.linear1"),
                    "fc2": _lin(sd, f"{lp}.linear2")},
        })
    return {
        "embedding": {"table": sd[f"{prefix}.embedding.weight"]},
        "pos": {"table": sd[f"{prefix}.pos_encoder.weight"]},
        "layers": layers_p,
        "fc_out": _lin(sd, f"{prefix}.fc_out"),
    }


# ---------------------------------------------------------------------------
# Swin encoder
# ---------------------------------------------------------------------------

def convert_swin_encoder(sd: Dict[str, np.ndarray], cfg: ModelConfig,
                         prefix: str = "encoder.swin") -> Dict:
    f = f"{prefix}.features" if prefix else "features"
    params = {
        "patch_embed": {
            "conv": {"w": sd[f"{f}.0.0.weight"].transpose(2, 3, 1, 0),
                     "b": sd[f"{f}.0.0.bias"]},
            "norm": _ln(sd, f"{f}.0.2"),
        },
        "stages": [],
        "merges": [],
    }
    stage_feature_idx = [1, 3, 5, 7]
    merge_feature_idx = [2, 4, 6]
    for si, depth in enumerate(cfg.swin.depths):
        fi = stage_feature_idx[si]
        blocks = []
        for b in range(depth):
            bp = f"{f}.{fi}.{b}"
            attn = {
                "w_qkv": sd[f"{bp}.attn.qkv.weight"].T,
                "b_qkv": sd[f"{bp}.attn.qkv.bias"],
                "w_out": sd[f"{bp}.attn.proj.weight"].T,
                "b_out": sd[f"{bp}.attn.proj.bias"],
                "rel_bias_table": sd[f"{bp}.attn.relative_position_bias_table"],
            }
            blocks.append({
                "norm1": _ln(sd, f"{bp}.norm1"),
                "attn": attn,
                "norm2": _ln(sd, f"{bp}.norm2"),
                "mlp": {"fc1": _lin(sd, f"{bp}.mlp.0"),
                        "fc2": _lin(sd, f"{bp}.mlp.3")},
            })
        params["stages"].append({"blocks": blocks})
        if si < len(cfg.swin.depths) - 1:
            mi = merge_feature_idx[si]
            params["merges"].append({
                "norm": _ln(sd, f"{f}.{mi}.norm"),
                "reduction": {"w": sd[f"{f}.{mi}.reduction.weight"].T},
            })
    return params


def convert_torchvision_swin(sd: Dict[str, np.ndarray], cfg: ModelConfig
                             ) -> Dict:
    """Raw torchvision ``swin_t`` (ImageNet) state_dict -> encoder params,
    applying the reference's 1-channel patch-embed surgery: the RGB patch
    conv weights are averaged into one input channel
    (/root/reference/src/model_swin.py:19-34). This is the ingest path for
    the reference's fine-tuning posture — initialize training from an
    ImageNet-pretrained encoder (``cli.py train --init-from``)."""
    sd = dict(sd)
    w = np.asarray(sd["features.0.0.weight"])
    if w.shape[1] == 3:  # (embed, RGB, ps, ps) -> mean over channels
        sd["features.0.0.weight"] = w.mean(axis=1, keepdims=True)
    return convert_swin_encoder(sd, cfg, prefix="")


# ---------------------------------------------------------------------------
# ResNet encoder
# ---------------------------------------------------------------------------

def _bn_from(sd, prefix) -> Tuple[Dict, Dict]:
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {"mean": sd[f"{prefix}.running_mean"],
             "var": sd[f"{prefix}.running_var"]}
    return params, stats


def convert_resnet_encoder(sd: Dict[str, np.ndarray], cfg: ModelConfig,
                           prefix: str = "encoder.features") -> Tuple[Dict, Dict]:
    """Reference EncoderCNN trunk (Sequential of resnet children[:-2],
    src/model.py:32): index 0 conv1, 1 bn1, 4..7 layer1..4."""
    bn1_p, bn1_s = _bn_from(sd, f"{prefix}.1")
    params = {"conv1": _conv(sd, f"{prefix}.0.weight"), "bn1": bn1_p,
              "layers": []}
    state = {"bn1": bn1_s, "layers": []}
    for li, nblocks in enumerate(cfg.resnet.stage_blocks):
        seq = li + 4
        blocks_p, blocks_s = [], []
        for b in range(nblocks):
            bp = f"{prefix}.{seq}.{b}"
            p1, s1 = _bn_from(sd, f"{bp}.bn1")
            p2, s2 = _bn_from(sd, f"{bp}.bn2")
            block_p = {"conv1": _conv(sd, f"{bp}.conv1.weight"), "bn1": p1,
                       "conv2": _conv(sd, f"{bp}.conv2.weight"), "bn2": p2}
            block_s = {"bn1": s1, "bn2": s2}
            if f"{bp}.downsample.0.weight" in sd:
                dp, ds = _bn_from(sd, f"{bp}.downsample.1")
                block_p["downsample"] = {
                    "conv": _conv(sd, f"{bp}.downsample.0.weight"), "bn": dp}
                block_s["downsample"] = {"bn": ds}
            blocks_p.append(block_p)
            blocks_s.append(block_s)
        params["layers"].append(blocks_p)
        state["layers"].append(blocks_s)
    return params, state


def convert_trans_encoder(sd: Dict[str, np.ndarray], cfg: ModelConfig,
                          prefix: str = "encoder.transformer_encoder") -> Dict:
    """res18trans transformer encoder stack (src/model_res18trans.py:39-47).
    The reference's positional embedding was re-randomized every forward
    (:57-59) and is unrecoverable; ours initializes to zeros so converted
    checkpoints reproduce the *deterministic* part of the computation."""
    enc_layers = []
    for i in range(cfg.num_encoder_layers):
        lp = f"{prefix}.layers.{i}"
        enc_layers.append({
            "self_attn": _mha(sd, f"{lp}.self_attn"),
            "norm1": _ln(sd, f"{lp}.norm1"),
            "norm2": _ln(sd, f"{lp}.norm2"),
            "ffn": {"fc1": _lin(sd, f"{lp}.linear1"),
                    "fc2": _lin(sd, f"{lp}.linear2")},
        })
    return {
        "layers": enc_layers,
        "pos": {"table": np.zeros((cfg.encoder_len, cfg.d_model),
                                  np.float32)},
    }


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

def convert_state_dict(sd: Dict[str, np.ndarray], cfg: ModelConfig
                       ) -> Tuple[Dict, Dict]:
    """Full reference FormulaRecognitionModel state_dict -> (params, state).
    Arrays come back as numpy; jax consumes them directly."""
    import jax.numpy as jnp

    state: Dict = {}
    if cfg.encoder == "swin_t":
        enc = convert_swin_encoder(sd, cfg)
    else:
        enc, bn_state = convert_resnet_encoder(sd, cfg)
        state["resnet"] = bn_state
    params = {
        "encoder": enc,
        "projection": _lin(sd, "encoder.projection"),
        "decoder": convert_decoder(sd, cfg),
    }
    if cfg.encoder == "res18trans":
        params["trans_encoder"] = convert_trans_encoder(sd, cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    state = jax.tree_util.tree_map(jnp.asarray, state)
    return params, state



def convert_checkpoint(pth_path: str, cfg: ModelConfig) -> Tuple[Dict, Dict]:
    """One-call .pth -> (params, state)."""
    sd = load_torch_state_dict(pth_path)
    return convert_state_dict(sd, cfg)
