"""Fused bias + activation + gain + clamp.

TPU equivalent of the reference's bias_act CUDA kernel
(ref: torch_utils/ops/bias_act.py:54-88, bias_act.cu). On TPU this is a pure
elementwise chain that XLA fuses into the producing matmul/conv, so no Pallas
kernel is needed; ``jax.grad`` provides arbitrary-order gradients (the CUDA
kernel hand-codes 1st/2nd order for R1).

The activation table mirrors the reference registry
(ref: torch_utils/ops/bias_act.py:23-33): each entry carries the default
gain applied after the nonlinearity (sqrt(2) for relu-family keeps unit
variance under equalized-lr training).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Callable, Optional

import jax
import jax.numpy as jnp


class ActivationSpec(NamedTuple):
    fn: Callable
    def_alpha: float
    def_gain: float


activation_funcs = {
    "linear": ActivationSpec(lambda x, alpha: x, 0.0, 1.0),
    "relu": ActivationSpec(lambda x, alpha: jax.nn.relu(x), 0.0, math.sqrt(2.0)),
    "lrelu": ActivationSpec(
        lambda x, alpha: jnp.where(x >= 0, x, x * alpha), 0.2, math.sqrt(2.0)
    ),
    "tanh": ActivationSpec(lambda x, alpha: jnp.tanh(x), 0.0, 1.0),
    "sigmoid": ActivationSpec(lambda x, alpha: jax.nn.sigmoid(x), 0.0, 1.0),
    "elu": ActivationSpec(lambda x, alpha: jax.nn.elu(x), 0.0, 1.0),
    "selu": ActivationSpec(lambda x, alpha: jax.nn.selu(x), 0.0, 1.0),
    "softplus": ActivationSpec(lambda x, alpha: jax.nn.softplus(x), 0.0, 1.0),
    "swish": ActivationSpec(lambda x, alpha: jax.nn.sigmoid(x) * x, 0.0, math.sqrt(2.0)),
}


def bias_act(
    x: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    dim: int = 1,
    act: str = "linear",
    alpha: Optional[float] = None,
    gain: Optional[float] = None,
    clamp: Optional[float] = None,
) -> jax.Array:
    """Add bias along `dim`, apply `act`, scale by `gain`, clamp to ±`clamp`.

    Semantics match ref torch_utils/ops/bias_act.py:93-129 exactly (the `ref`
    implementation, which is the CUDA kernel's golden oracle).
    """
    spec = activation_funcs[act]
    alpha = float(spec.def_alpha if alpha is None else alpha)
    gain = float(spec.def_gain if gain is None else gain)

    if b is not None:
        assert b.ndim == 1 and b.shape[0] == x.shape[dim]
        shape = [1] * x.ndim
        shape[dim] = -1
        x = x + b.reshape(shape).astype(x.dtype)

    x = spec.fn(x, alpha)
    if gain != 1.0:
        x = x * jnp.asarray(gain, x.dtype)
    if clamp is not None:
        assert clamp >= 0
        x = jnp.clip(x, -clamp, clamp)
    return x
