"""Generate the committed FULL-PRODUCTION-CONFIG per-stage Swin golden
(tests/fixtures/swin_golden_stages_full.npz): per-stage activations of the
torch oracle on the flagship swin_t topology (embed 96, depths 2/2/6/2,
heads 3/6/12/24, ws 7) for a fixed seeded input. Weights are NOT stored —
the test regenerates the identical state dict from the same torch seed
(torch_swin_oracle.make_random_swin_state_dict(seed=0)), so the artifact
stays small while pinning every stage of the production config byte-for-
byte against refactors (VERDICT r3 item 5).

Run once: python tests/fixtures/make_swin_stage_golden.py
"""

import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from torch_swin_oracle import make_random_swin_state_dict, swin_features  # noqa: E402


def main():
    sd = make_random_swin_state_dict(seed=0)  # full swin_t topology
    g = torch.Generator().manual_seed(1)
    x = torch.randn(1, 1, 96, 320, generator=g)
    taps = swin_features(sd, x, return_stages=True)

    arrays = {"__input__": x.numpy()}
    for i, t in enumerate(taps):
        arrays[f"stage_{i}"] = t.numpy()
    path = os.path.join(os.path.dirname(__file__),
                        "swin_golden_stages_full.npz")
    np.savez_compressed(path, **arrays)
    print(f"{path}: {os.path.getsize(path) / 1e6:.2f} MB, "
          f"taps: {[tuple(t.shape) for t in taps]}")


if __name__ == "__main__":
    main()
