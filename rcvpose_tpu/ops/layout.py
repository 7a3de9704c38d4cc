"""Forced-relayout helper.

XLA layout assignment sometimes threads hostile tilings (e.g. the
T(1,128)-tiled 2-channel conv head output) through transposes as bitcasts,
poisoning every downstream elementwise pass. A Pallas identity copy pins its
operand/result to the default (8,128)-tiled layout — XLA must materialize
the relayout once, cheaply, instead of running megapixel fusions in the bad
layout (measured 6 ms -> sub-ms per full-res map on v5e).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_TILE = 256


def _copy_kernel(x_ref, o_ref):
    o_ref[:, :] = x_ref[:, :]


def _pinned_copy(x2):
    m, w = x2.shape
    tile = min(_ROW_TILE, m)
    grid = (pl.cdiv(m, tile),)
    return pl.pallas_call(
        _copy_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((tile, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, w), x2.dtype),
    )(x2)


# pallas_call has no autodiff rule, so the identity copy needs an explicit
# VJP for the training path (the loss differentiates through _split_heads).
# The cotangent is itself pinned: the backward megapixel fusions face the
# same hostile-layout hazard as the forward ones.
@jax.custom_vjp
def _pinned_identity(x2):
    return _pinned_copy(x2)


def _pinned_identity_fwd(x2):
    return _pinned_copy(x2), None


def _pinned_identity_bwd(_, g):
    return (_pinned_copy(g),)


_pinned_identity.defvjp(_pinned_identity_fwd, _pinned_identity_bwd)


def force_standard_layout(x):
    """Identity with a guaranteed default layout on TPU; no-op elsewhere.
    Differentiable (identity VJP, also layout-pinned)."""
    if jax.default_backend() != "tpu":
        return x
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    return _pinned_identity(x2).reshape(shape)
