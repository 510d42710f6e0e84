"""Generate the committed Swin conversion golden (tests/fixtures/
swin_golden_small.npz): a reduced-dim swin state_dict in torchvision key
format + a fixed input + the torch oracle's feature output. Reduced dims
keep the artifact small while exercising every converter mapping rule
(patch-embed conv/LN, qkv/proj transposes, rel-bias table, patch-merging
norm/reduction, window-shift clamp in the 3-row final stage).

Run once: python tests/fixtures/make_swin_golden.py
"""

import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from torch_swin_oracle import make_random_swin_state_dict, swin_features  # noqa: E402

EMBED = 16
DEPTHS = (2, 2, 2, 2)
HEADS = (2, 2, 4, 4)


def main():
    sd = make_random_swin_state_dict(seed=7, embed_dim=EMBED, depths=DEPTHS,
                                     num_heads=HEADS)
    g = torch.Generator().manual_seed(11)
    x = torch.randn(2, 1, 96, 320, generator=g)
    out = swin_features(sd, x, depths=DEPTHS, num_heads=HEADS)

    arrays = {"__input__": x.numpy(), "__output__": out.numpy()}
    for k, v in sd.items():
        arrays[k] = v.numpy()
    path = os.path.join(os.path.dirname(__file__), "swin_golden_small.npz")
    np.savez_compressed(path, **arrays)
    print(f"{path}: {os.path.getsize(path) / 1e6:.2f} MB, "
          f"out shape {out.shape}")


if __name__ == "__main__":
    main()
