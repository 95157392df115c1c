"""Kernel combinators (common/conv_kernel.h:12-100 equivalents).

Operate elementwise on batched kernel values, so a combined kernel is just a
function composition over the (B,) outputs of the base kernels:

- add(k1, k2)            AddKernel
- linear(k, a, b)        LTKernel: a*k + b
- exp(k, a, b)           ExpKernel: exp(a*k + b)
- log(k)                 LogKernel: log(k)  (NOTE: "violates positive
                         semi-definite", conv_kernel.h:80 — kept for parity)
- weighted_log(k, w)     LTKernel(LogKernel(k), w, 0) = w*log(k), the LSu*
                         variants of def_kernel.h:113-190
"""

from __future__ import annotations

import jax.numpy as jnp


def add(*values):
    out = values[0]
    for v in values[1:]:
        out = out + v
    return out


def linear(value, a: float, b: float = 0.0):
    return a * value + b


def exp(value, a: float = 1.0, b: float = 0.0):
    return jnp.exp(a * value + b)


def log(value):
    return jnp.log(value)


def weighted_log(value, w: float):
    return w * jnp.log(value)
