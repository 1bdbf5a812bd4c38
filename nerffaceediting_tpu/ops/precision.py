"""Global matmul/conv precision policy for the framework.

On TPU, float32 convolutions/matmuls lower to multi-pass bfloat16 on the MXU;
``lax.Precision`` picks the number of passes. The reference uses fp32 for the
G backbone and fp16 (clamped) for SR/D (ref: train.py:384-387); our
equivalent policy is fp32 storage with HIGHEST-precision MXU ops for parity
runs, relaxable to DEFAULT (one bf16 pass) for speed.
"""

from __future__ import annotations

import contextlib

from jax import lax

_PRECISION = lax.Precision.HIGHEST


def get_precision() -> lax.Precision:
    return _PRECISION


def set_precision(p) -> None:
    global _PRECISION
    _PRECISION = lax.Precision(p) if not isinstance(p, lax.Precision) else p


@contextlib.contextmanager
def precision(p):
    """Temporarily override the op precision (affects tracing, so use around
    jit compilation, not inside traced code)."""
    global _PRECISION
    old = _PRECISION
    set_precision(p)
    try:
        yield
    finally:
        _PRECISION = old
