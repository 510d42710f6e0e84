"""Synthetic dataset generation for tests, benchmarks and CI.

The real MathWriting corpus is not shipped with either repo; this module
fabricates a structurally identical dataset (PNGs + labels CSV in the
data/README.md contract, and optionally InkML sources) so every pipeline
stage — vocab build, loaders, training, eval harness, serving — can run
end-to-end hermetically.
"""

from __future__ import annotations

import os
import random
from typing import List

import numpy as np

_ATOMS = list("abcxyz01259+-=") + [
    r"\frac", r"\sqrt", r"\alpha", r"\beta", r"\sum", r"\int", r"\pi",
    r"\cdot", r"\infty",
]


def random_formula(rng: random.Random, max_tokens: int = 12) -> str:
    n = rng.randint(1, max_tokens)
    parts: List[str] = []
    for _ in range(n):
        choice = rng.random()
        atom = rng.choice(_ATOMS)
        if choice < 0.15:
            parts.append(f"{atom} ^ {{ {rng.randint(0, 9)} }}")
        elif choice < 0.3:
            parts.append(f"{atom} _ {{ {rng.choice('abcxyz')} }}")
        elif choice < 0.4 and atom == r"\frac":
            parts.append(
                f"\\frac {{ {rng.choice('abc')} }} {{ {rng.randint(1, 9)} }}")
        else:
            parts.append(atom)
    return " ".join(parts)


def random_ink_image(rng: np.random.Generator, img_h: int,
                     img_w: int) -> np.ndarray:
    """Plausible-looking handwriting-ish strokes on white."""
    import cv2

    img = np.full((img_h, img_w), 255, np.uint8)
    n_strokes = int(rng.integers(3, 10))
    for _ in range(n_strokes):
        n_pts = int(rng.integers(3, 8))
        xs = rng.integers(4, img_w - 4, n_pts)
        ys = rng.integers(4, img_h - 4, n_pts)
        pts = np.stack([xs, ys], axis=1).astype(np.int32)
        cv2.polylines(img, [pts.reshape(-1, 1, 2)], False, 0, 2,
                      lineType=cv2.LINE_AA)
    return img


def render_text_image(text: str, img_h: int = 96, img_w: int = 320
                      ) -> np.ndarray:
    """Render ``text`` with PIL's built-in bitmap font: black on white
    uint8 (H, W). Unlike ``random_ink_image`` the pixels *depict* the
    label, so models can genuinely learn image->text on synthetic data
    (used by the learnability test)."""
    from PIL import Image, ImageDraw, ImageFont

    img = Image.new("L", (img_w, img_h), 255)
    draw = ImageDraw.Draw(img)
    font = ImageFont.load_default()
    draw.text((4, img_h // 2 - 5), text, fill=0, font=font)
    return np.asarray(img, np.uint8)


def make_learnable_dataset(root: str, splits=(("train", 16), ("validate", 8),
                                              ("test", 8)),
                           img_h: int = 96, img_w: int = 320,
                           seed: int = 0, n_distinct: int = 8) -> str:
    """Dataset whose images depict their labels (rendered text), drawn from
    ``n_distinct`` formulas — learnable by a tiny model in a few epochs."""
    import cv2
    import pandas as pd

    prng = random.Random(seed)
    formulas = [random_formula(prng, max_tokens=4) for _ in range(n_distinct)]
    for split, count in splits:
        img_dir = os.path.join(root, f"{split}_formulas")
        os.makedirs(img_dir, exist_ok=True)
        rows = []
        for i in range(count):
            formula = formulas[i % n_distinct]
            name = f"{split}_{i:05d}.png"
            cv2.imwrite(os.path.join(img_dir, name),
                        render_text_image(formula, img_h, img_w))
            rows.append({"image_filename": name, "latex_label": formula})
        pd.DataFrame(rows).to_csv(
            os.path.join(root, f"{split}_labels.csv"), index=False)
    return root


def make_synthetic_dataset(root: str, splits=(("train", 32), ("validate", 8),
                                              ("test", 8)),
                           img_h: int = 96, img_w: int = 320,
                           seed: int = 0) -> str:
    """Write {split}_formulas/*.png + {split}_labels.csv under ``root``."""
    import cv2
    import pandas as pd

    prng = random.Random(seed)
    nrng = np.random.default_rng(seed)
    for split, count in splits:
        img_dir = os.path.join(root, f"{split}_formulas")
        os.makedirs(img_dir, exist_ok=True)
        rows = []
        for i in range(count):
            name = f"{split}_{i:05d}.png"
            cv2.imwrite(os.path.join(img_dir, name),
                        random_ink_image(nrng, img_h, img_w))
            rows.append({"image_filename": name,
                         "latex_label": random_formula(prng)})
        pd.DataFrame(rows).to_csv(
            os.path.join(root, f"{split}_labels.csv"), index=False)
    return root


SAMPLE_INKML = """<ink xmlns="http://www.w3.org/2003/InkML">
  <annotation type="label">x ^ { 2 }</annotation>
  <annotation type="normalizedLabel">x ^ { 2 }</annotation>
  <trace>10 20, 15 25, 20 30, 30 45</trace>
  <trace>40 10 0.1, 45 15 0.2, 50 12 0.3</trace>
</ink>"""
