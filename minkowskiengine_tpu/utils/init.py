"""Kaiming init for (volume, C_in, C_out) sparse-conv kernels
(reference: MinkowskiEngine/utils/init.py)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _calculate_fan_in_and_fan_out(shape):
    if len(shape) == 2:
        fan_in, fan_out = shape[0], shape[1]
    elif len(shape) == 3:  # (kernel_volume, C_in, C_out)
        fan_in = shape[1] * shape[0]
        fan_out = shape[2] * shape[0]
    else:
        raise ValueError(f"Unsupported kernel shape {shape}")
    return fan_in, fan_out


def _calculate_correct_fan(shape, mode: str):
    mode = mode.lower()
    if mode not in ("fan_in", "fan_out"):
        raise ValueError(f"Mode {mode} not supported")
    fan_in, fan_out = _calculate_fan_in_and_fan_out(shape)
    return fan_in if mode == "fan_in" else fan_out


def _gain(nonlinearity: str, a: float) -> float:
    if nonlinearity == "relu":
        return math.sqrt(2.0)
    if nonlinearity == "leaky_relu":
        return math.sqrt(2.0 / (1 + a**2))
    if nonlinearity in ("sigmoid", "linear"):
        return 1.0
    if nonlinearity == "tanh":
        return 5.0 / 3
    raise ValueError(f"Unsupported nonlinearity {nonlinearity}")


def kaiming_normal_(key, shape, a=0.0, mode="fan_in", nonlinearity="leaky_relu"):
    """Sample a kaiming-normal kernel (functional: returns the array)."""
    fan = _calculate_correct_fan(shape, mode)
    gain = _gain(nonlinearity, a)
    std = gain / math.sqrt(fan)
    return jax.random.normal(key, shape, jnp.float32) * std


def kaiming_uniform_(key, shape, a=0.0, mode="fan_in", nonlinearity="leaky_relu"):
    fan = _calculate_correct_fan(shape, mode)
    gain = _gain(nonlinearity, a)
    bound = gain * math.sqrt(3.0 / fan)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)
