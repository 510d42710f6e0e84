"""Pallas TPU kernels with jnp fallbacks.

Every kernel here ships beside a jnp reference implementation (in models/)
and an equivalence test. Kernels run compiled on TPU and fall back to
Pallas interpret mode on CPU so the whole suite runs hermetically.
"""

import jax


def default_interpret() -> bool:
    """Interpret Pallas kernels when not on TPU (CPU tests/dev)."""
    return jax.default_backend() != "tpu"
