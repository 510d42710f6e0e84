#!/usr/bin/env python3
"""Layerwise parity check against REAL torchvision swin_t weights.

The build image has no torchvision, so in-repo parity is pinned against a
standalone torch oracle (tests/torch_swin_oracle.py) plus hand-derived
static-construct tests. This script closes the remaining trust gap in any
environment where torchvision IS installable (e.g. the deploy host or a
dev workstation):

  1. loads torchvision ``swin_t(weights=IMAGENET1K_V1)`` — the exact
     pretrained encoder the reference ships
     (/root/reference/src/model_swin.py:17-19) — and rebuilds its patch
     conv for 1-channel input the same way the reference does (mean over
     RGB kernels, src/model_swin.py:21-27);
  2. runs torchvision's own forward, tapping every stage;
  3. converts the state dict with ``compat.torch_convert.
     convert_swin_encoder`` and runs the JAX trunk's matching taps
     (models.swin.swin_apply_stages);
  4. reports the max relative error per stage and fails (exit 1) if any
     stage diverges beyond --tol (default 1e-3, the f32 accumulation
     envelope measured for the 12-block trunk).

Usage:  python deploy/check_torchvision_parity.py [--tol 1e-3] [--cpu]
"""

from __future__ import annotations

import argparse
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tol", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    try:
        import torch
        import torchvision
        from torchvision.models import Swin_T_Weights, swin_t
    except ImportError as e:
        print(f"SKIP: torchvision unavailable in this environment ({e}); "
              "run this on a host with torchvision to verify against the "
              "real pretrained weights")
        return 0

    import numpy as np

    import jax.numpy as jnp

    from handwritten_math_ocr_api_tpu.compat.torch_convert import (
        convert_swin_encoder,
    )
    from handwritten_math_ocr_api_tpu.core.config import ModelConfig
    from handwritten_math_ocr_api_tpu.models.swin import swin_apply_stages

    print(f"torchvision {torchvision.__version__}")
    model = swin_t(weights=Swin_T_Weights.IMAGENET1K_V1)
    model.eval()

    # 1-channel patch conv exactly like the reference rebuilt it
    # (src/model_swin.py:21-27): mean over the RGB kernel axis.
    old = model.features[0][0]
    new = torch.nn.Conv2d(1, old.out_channels, kernel_size=4, stride=4)
    with torch.no_grad():
        new.weight.copy_(old.weight.mean(dim=1, keepdim=True))
        new.bias.copy_(old.bias)
    model.features[0][0] = new

    g = torch.Generator().manual_seed(args.seed)
    x = torch.randn(1, 1, 96, 320, generator=g)

    # torchvision-side taps: run features sequentially, recording the
    # output after each stage's block list (features indices 1,3,5,7),
    # starting from the patch-embed output (index 0).
    taps_t = []
    with torch.no_grad():
        h = model.features[0](x)
        taps_t.append(h)
        for i in range(1, len(model.features)):
            h = model.features[i](h)
            if i in (1, 3, 5, 7):
                taps_t.append(h)

    # JAX side: prefix the state dict the way the converter expects
    sd = {f"encoder.swin.features.{k[len('features.'):] }": v.numpy()
          for k, v in model.state_dict().items()
          if k.startswith("features.")}
    cfg = ModelConfig()
    params = convert_swin_encoder(sd, cfg)
    taps_j = swin_apply_stages(params, jnp.asarray(
        x.numpy().transpose(0, 2, 3, 1)), cfg.swin)

    ok = True
    for i, (tt, tj) in enumerate(zip(taps_t, taps_j)):
        want = tt.numpy()
        got = np.asarray(tj, np.float32)
        assert got.shape == want.shape, (i, got.shape, want.shape)
        scale = max(float(np.abs(want).max()), 1e-6)
        err = float(np.abs(got - want).max()) / scale
        status = "ok" if err < args.tol else "FAIL"
        if err >= args.tol:
            ok = False
        print(f"stage {i}: shape {want.shape} max rel err {err:.3e} "
              f"[{status}]")
    print("PARITY OK" if ok else "PARITY FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
