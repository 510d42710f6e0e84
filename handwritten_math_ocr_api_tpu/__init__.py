"""TPU-native handwritten-math OCR framework (JAX/XLA/Pallas).

Image -> LaTeX with training, evaluation and production serving; a
TPU-first rebuild of the capabilities of PTD504/handwritten-math-ocr-api.
See README.md for the layout and docs/ARCHITECTURE.md for design.

Public API (lazy — importing the package pulls no heavy deps):

    from handwritten_math_ocr_api_tpu import (
        Config, ModelConfig, Tokenizer, DecodeEngine,
        init_model, load_vocab,
    )
"""

__version__ = "0.1.0"

_LAZY = {
    "Config": ("handwritten_math_ocr_api_tpu.core.config", "Config"),
    "ModelConfig": ("handwritten_math_ocr_api_tpu.core.config",
                    "ModelConfig"),
    "DecodeConfig": ("handwritten_math_ocr_api_tpu.core.config",
                     "DecodeConfig"),
    "Tokenizer": ("handwritten_math_ocr_api_tpu.core.tokenizer",
                  "Tokenizer"),
    "load_vocab": ("handwritten_math_ocr_api_tpu.core.tokenizer",
                   "load_vocab"),
    "create_vocab": ("handwritten_math_ocr_api_tpu.core.tokenizer",
                     "create_vocab"),
    "DecodeEngine": ("handwritten_math_ocr_api_tpu.decode.api",
                     "DecodeEngine"),
    "ContinuousDecoder": ("handwritten_math_ocr_api_tpu.decode.continuous",
                          "ContinuousDecoder"),
    "init_model": ("handwritten_math_ocr_api_tpu.models.model",
                   "init_model"),
    "train_model": ("handwritten_math_ocr_api_tpu.train.loop",
                    "train_model"),
    "convert_checkpoint": (
        "handwritten_math_ocr_api_tpu.compat.torch_convert",
        "convert_checkpoint"),
}

__all__ = list(_LAZY) + ["__version__"]


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
