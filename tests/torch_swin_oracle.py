"""Independent PyTorch oracle for torchvision ``swin_t`` feature numerics.

torchvision is not installed in this image, so Swin weight-conversion
parity is pinned against this standalone re-implementation of
``torchvision.models.swin_transformer``'s *documented* eval-time semantics
(v1 swin: qkv-packed linear, q-scaling by head_dim**-0.5, relative position
bias table indexing, shifted-window region mask with -100 fill, PatchMerging
even/odd gather order, patch-embed conv + channels-last LayerNorm). It
consumes a state_dict with torchvision key names (the exact format
``compat.torch_convert.convert_swin_encoder`` ingests), giving a
cross-framework parity oracle that shares no code with the JAX path.

Reference semantics source: torchvision swin_transformer (public API), as
used by the reference's shipped encoder (/root/reference/src/model_swin.py:
17-46 — 1-channel patch conv, features-only tap, no final norm).
"""

from __future__ import annotations

import torch
import torch.nn.functional as F


def _relative_position_index(ws: int) -> torch.Tensor:
    coords = torch.stack(
        torch.meshgrid(torch.arange(ws), torch.arange(ws), indexing="ij"))
    flat = coords.flatten(1)  # (2, ws*ws)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.permute(1, 2, 0).contiguous()
    rel[..., 0] += ws - 1
    rel[..., 1] += ws - 1
    rel[..., 0] *= 2 * ws - 1
    return rel.sum(-1)  # (N, N)


def _shifted_window_attention(x, sd, bp, num_heads, ws, shift):
    B, H, W, C = x.shape
    pad_b = (ws - H % ws) % ws
    pad_r = (ws - W % ws) % ws
    x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
    _, pH, pW, _ = x.shape
    sh = 0 if ws >= pH else shift
    sw = 0 if ws >= pW else shift
    if sh or sw:
        x = torch.roll(x, shifts=(-sh, -sw), dims=(1, 2))

    nwh, nww = pH // ws, pW // ws
    num_windows = nwh * nww
    N = ws * ws
    xw = x.view(B, nwh, ws, nww, ws, C).permute(0, 1, 3, 2, 4, 5)
    xw = xw.reshape(B * num_windows, N, C)

    qkv = F.linear(xw, sd[f"{bp}.attn.qkv.weight"], sd[f"{bp}.attn.qkv.bias"])
    qkv = qkv.reshape(xw.size(0), N, 3, num_heads, C // num_heads)
    qkv = qkv.permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    q = q * (C // num_heads) ** -0.5
    attn = q.matmul(k.transpose(-2, -1))  # (B*nW, nh, N, N)

    table = sd[f"{bp}.attn.relative_position_bias_table"]
    idx = _relative_position_index(ws).flatten()
    bias = table[idx].view(N, N, -1).permute(2, 0, 1)  # (nh, N, N)
    attn = attn + bias.unsqueeze(0)

    if sh or sw:
        region = x.new_zeros((pH, pW))
        h_slices = ((0, pH - ws), (pH - ws, pH - sh), (pH - sh, pH))
        w_slices = ((0, pW - ws), (pW - ws, pW - sw), (pW - sw, pW))
        cnt = 0
        for h0, h1 in h_slices:
            for w0, w1 in w_slices:
                region[h0:h1, w0:w1] = cnt
                cnt += 1
        region = region.view(nwh, ws, nww, ws).permute(0, 2, 1, 3)
        region = region.reshape(num_windows, N)
        amask = region.unsqueeze(1) - region.unsqueeze(2)
        amask = amask.masked_fill(amask != 0, -100.0).masked_fill(
            amask == 0, 0.0)
        attn = attn.view(B, num_windows, num_heads, N, N)
        attn = attn + amask.unsqueeze(1).unsqueeze(0)
        attn = attn.view(B * num_windows, num_heads, N, N)

    attn = F.softmax(attn, dim=-1)
    out = attn.matmul(v).transpose(1, 2).reshape(xw.size(0), N, C)
    out = F.linear(out, sd[f"{bp}.attn.proj.weight"],
                   sd[f"{bp}.attn.proj.bias"])

    out = out.view(B, nwh, nww, ws, ws, C).permute(0, 1, 3, 2, 4, 5)
    out = out.reshape(B, pH, pW, C)
    if sh or sw:
        out = torch.roll(out, shifts=(sh, sw), dims=(1, 2))
    return out[:, :H, :W, :].contiguous()


def _block(x, sd, bp, num_heads, ws, shift):
    h = F.layer_norm(x, (x.shape[-1],), sd[f"{bp}.norm1.weight"],
                     sd[f"{bp}.norm1.bias"])
    x = x + _shifted_window_attention(h, sd, bp, num_heads, ws, shift)
    h = F.layer_norm(x, (x.shape[-1],), sd[f"{bp}.norm2.weight"],
                     sd[f"{bp}.norm2.bias"])
    h = F.linear(h, sd[f"{bp}.mlp.0.weight"], sd[f"{bp}.mlp.0.bias"])
    h = F.gelu(h)
    h = F.linear(h, sd[f"{bp}.mlp.3.weight"], sd[f"{bp}.mlp.3.bias"])
    return x + h


def _patch_merging(x, sd, mp):
    B, H, W, C = x.shape
    x = F.pad(x, (0, 0, 0, W % 2, 0, H % 2))
    x0 = x[:, 0::2, 0::2, :]
    x1 = x[:, 1::2, 0::2, :]
    x2 = x[:, 0::2, 1::2, :]
    x3 = x[:, 1::2, 1::2, :]
    x = torch.cat([x0, x1, x2, x3], dim=-1)
    x = F.layer_norm(x, (x.shape[-1],), sd[f"{mp}.norm.weight"],
                     sd[f"{mp}.norm.bias"])
    return F.linear(x, sd[f"{mp}.reduction.weight"])


@torch.no_grad()
def swin_features(sd, images, depths=(2, 2, 6, 2),
                  num_heads=(3, 6, 12, 24), window_size=7,
                  prefix="encoder.swin.features", return_stages=False):
    """images: (B, 1, H, W) NCHW float -> (B, H/32 * W/32, C_final).

    Mirrors the reference's EncoderSwin.forward trunk (features tap, no
    final norm, row-major flatten). ``return_stages``: instead return the
    list [patch-embed out, stage-1 out (post-blocks, pre-merge), ...,
    final-stage out], each (B, H, W, C) NHWC — the tap points
    models.swin.swin_apply_stages exposes."""
    f = prefix
    x = F.conv2d(images, sd[f"{f}.0.0.weight"], sd[f"{f}.0.0.bias"],
                 stride=4)
    x = x.permute(0, 2, 3, 1)  # NHWC
    x = F.layer_norm(x, (x.shape[-1],), sd[f"{f}.0.2.weight"],
                     sd[f"{f}.0.2.bias"])
    taps = [x]

    stage_idx = [1, 3, 5, 7]
    merge_idx = [2, 4, 6]
    for si, depth in enumerate(depths):
        for b in range(depth):
            shift = 0 if b % 2 == 0 else window_size // 2
            x = _block(x, sd, f"{f}.{stage_idx[si]}.{b}", num_heads[si],
                       window_size, shift)
        taps.append(x)
        if si < len(depths) - 1:
            x = _patch_merging(x, sd, f"{f}.{merge_idx[si]}")
    if return_stages:
        return taps
    B, H, W, C = x.shape
    return x.reshape(B, H * W, C)


def make_random_swin_state_dict(seed=0, embed_dim=96, depths=(2, 2, 6, 2),
                                num_heads=(3, 6, 12, 24), window_size=7,
                                in_channels=1,
                                prefix="encoder.swin.features"):
    """Random torchvision-format swin state_dict (1-channel patch embed,
    matching the reference's rebuilt conv)."""
    g = torch.Generator().manual_seed(seed)

    def randn(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    f = prefix
    sd = {
        f"{f}.0.0.weight": randn(embed_dim, in_channels, 4, 4),
        f"{f}.0.0.bias": randn(embed_dim),
        f"{f}.0.2.weight": 1.0 + randn(embed_dim),
        f"{f}.0.2.bias": randn(embed_dim),
    }
    stage_idx = [1, 3, 5, 7]
    merge_idx = [2, 4, 6]
    for si, depth in enumerate(depths):
        dim = embed_dim * 2 ** si
        for b in range(depth):
            bp = f"{f}.{stage_idx[si]}.{b}"
            sd.update({
                f"{bp}.norm1.weight": 1.0 + randn(dim),
                f"{bp}.norm1.bias": randn(dim),
                f"{bp}.attn.qkv.weight": randn(3 * dim, dim),
                f"{bp}.attn.qkv.bias": randn(3 * dim),
                f"{bp}.attn.proj.weight": randn(dim, dim),
                f"{bp}.attn.proj.bias": randn(dim),
                f"{bp}.attn.relative_position_bias_table":
                    randn((2 * window_size - 1) ** 2, num_heads[si]),
                f"{bp}.norm2.weight": 1.0 + randn(dim),
                f"{bp}.norm2.bias": randn(dim),
                f"{bp}.mlp.0.weight": randn(4 * dim, dim),
                f"{bp}.mlp.0.bias": randn(4 * dim),
                f"{bp}.mlp.3.weight": randn(dim, 4 * dim),
                f"{bp}.mlp.3.bias": randn(dim),
            })
        if si < len(depths) - 1:
            mp = f"{f}.{merge_idx[si]}"
            sd.update({
                f"{mp}.norm.weight": 1.0 + randn(4 * dim),
                f"{mp}.norm.bias": randn(4 * dim),
                f"{mp}.reduction.weight": randn(2 * dim, 4 * dim),
            })
    return sd
