"""Image preprocessing: grayscale -> resize -> normalize.

Matches the reference numerics exactly:
- training path: ``cv2.imread(IMREAD_GRAYSCALE)`` + ``cv2.resize`` (bilinear)
  to (W=320, H=96), then ToTensor + Normalize(0.5, 0.5)
  (reference: src/data_loader.py:31-35,18-21);
- serving path: PIL Grayscale -> Resize((96, 320)) -> ToTensor ->
  Normalize(0.5, 0.5) (reference: app/src/preprocess.py:6-16).

Both are *stretch* resizes (no aspect-preserving pad). Normalization maps
uint8/255 to [-1, 1]: ``x/255*2 - 1``.

The host-side functions produce float32 numpy arrays shaped (H, W); the
batched on-device function fuses normalize into XLA so the cast/scale rides
along with the first encoder matmul.
"""

from __future__ import annotations

import numpy as np

from ..core.config import ModelConfig

try:  # cv2 is present in the image; gate anyway so the package imports bare
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def load_image_cv2(path: str, img_h: int = 96, img_w: int = 320) -> np.ndarray:
    """Training-path loader: grayscale read + bilinear stretch-resize
    (reference: src/data_loader.py:31-33). Returns uint8 (H, W)."""
    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(f"cannot read image: {path}")
    return cv2.resize(img, (img_w, img_h))  # cv2 takes (W, H); default bilinear


def resize_pil_u8(image, img_h: int = 96, img_w: int = 320) -> np.ndarray:
    """Serving-path resize: PIL image -> uint8 (H, W) grayscale
    (reference: app/src/preprocess.py:6-16). Accepts any PIL mode. The
    normalize half runs either host-side (``normalize``) or on-device
    (``device_normalize``) — both compute the same x/255*2-1 in float32."""
    image = image.convert("L")
    image = image.resize((img_w, img_h), Image.BILINEAR)
    return np.asarray(image, dtype=np.uint8)


def preprocess_pil(image, img_h: int = 96, img_w: int = 320) -> np.ndarray:
    """Serving-path preprocess: PIL image -> normalized float32 (H, W)
    (reference: app/src/preprocess.py:6-16). Accepts any PIL mode."""
    arr = resize_pil_u8(image, img_h, img_w).astype(np.float32)
    return arr / 255.0 * 2.0 - 1.0


def normalize(img_u8: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float32 [-1,1] (Normalize(mean=0.5, std=0.5))."""
    return img_u8.astype(np.float32) / 255.0 * 2.0 - 1.0


def preprocess_batch_numpy(images_u8: np.ndarray) -> np.ndarray:
    """Batch of uint8 (B, H, W) -> normalized float32 (B, H, W, 1), NHWC."""
    x = images_u8.astype(np.float32) / 255.0 * 2.0 - 1.0
    return x[..., None]


def device_normalize(images_u8, dtype=None):
    """On-device normalize, jit-friendly: uint8 (B, H, W[, 1]) -> (B, H, W, 1).

    Ship uint8 to the device (4x less host->HBM traffic than f32) and let
    XLA fuse the scale/shift into the patch-embed convolution.
    """
    import jax.numpy as jnp

    x = jnp.asarray(images_u8)
    if x.ndim == 3:
        x = x[..., None]
    x = x.astype(dtype or jnp.float32)
    return x / 255.0 * 2.0 - 1.0


def preprocess_file(path: str, cfg: ModelConfig | None = None) -> np.ndarray:
    """One file -> normalized float32 (1, H, W, 1) NHWC batch."""
    h = cfg.img_h if cfg else 96
    w = cfg.img_w if cfg else 320
    img = load_image_cv2(path, h, w)
    return normalize(img)[None, ..., None]
