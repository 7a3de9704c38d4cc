"""Pallas one-pass decoder conv vs the einsum reference formulation.

The kernel (ops/mmconv_pallas.py) must be numerically interchangeable with
models/fcnresnet.py::mmconv2d — the jit re-expression of the reference's
decoder convs (/root/reference/models/fcnresnet.py:108-118) — in both
directions of autodiff. Runs in the Pallas interpreter on the CPU test
backend; the TPU path compiles the same kernel body.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcvpose_tpu.models.fcnresnet import (DenseFCNResNet152, _mmconv_apply,
                                          mmconv2d)
from rcvpose_tpu.ops.mmconv_pallas import (conv_same_pallas,
                                           conv_same_pallas_dk,
                                           mmconv2d_pallas,
                                           pallas_applicable)

SHAPES = [
    # (B, H, W, C, D, K): thin channels, wide channels (>=128), K=5,
    # heights exercising different row tiles.
    (2, 16, 24, 8, 4, 3),
    (1, 32, 20, 5, 7, 3),
    (2, 8, 16, 130, 12, 3),
    (1, 20, 16, 6, 3, 5),
]


def _rand(shape, dtype=jnp.float32, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape), dtype)


@pytest.mark.parametrize("shape", SHAPES)
def test_forward_matches_einsum_f32(shape):
    b, h, w, c, d, k = shape
    x = _rand((b, h, w, c))
    kern = _rand((k, k, c, d), seed=1) * 0.1
    ref = _mmconv_apply(x, kern)
    got = conv_same_pallas(x, kern, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", SHAPES[:2])
def test_grads_match_einsum_f32(shape):
    b, h, w, c, d, k = shape
    x = _rand((b, h, w, c))
    kern = _rand((k, k, c, d), seed=1) * 0.1

    def loss_ref(x, kern):
        return jnp.sum(jnp.sin(mmconv2d(x, kern)))

    def loss_pal(x, kern):
        return jnp.sum(jnp.sin(mmconv2d_pallas(x, kern, True)))

    gr = jax.grad(loss_ref, argnums=(0, 1))(x, kern)
    gp = jax.grad(loss_pal, argnums=(0, 1))(x, kern)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                               rtol=1e-5, atol=1e-4)


def test_dk_matches_manual():
    b, h, w, c, d, k = 2, 8, 12, 6, 5, 3
    x = _rand((b, h, w, c))
    g = _rand((b, h, w, d), seed=2)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    want = np.zeros((k, k, c, d), np.float32)
    for dy in range(k):
        for dx in range(k):
            want[dy, dx] = np.einsum(
                "bhwc,bhwd->cd", np.asarray(xp[:, dy:dy + h, dx:dx + w]),
                np.asarray(g))
    got = conv_same_pallas_dk(x, g, 3, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-4)


def test_vmap_over_frames():
    """The DP dataset-eval path vmaps the net forward over a frame batch."""
    x = _rand((3, 1, 16, 24, 8))
    kern = _rand((3, 3, 8, 4), seed=1) * 0.1
    ref = jax.vmap(lambda xi: _mmconv_apply(xi, kern))(x)
    got = jax.vmap(lambda xi: mmconv2d_pallas(xi, kern, True))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_bf16_close_to_f32_conv():
    """bf16 inputs, f32 accumulation: at least as close to the f32 conv as
    the bf16 einsum chain is (the kernel rounds once, the chain K*K-1
    times)."""
    b, h, w, c, d = 1, 16, 16, 8, 4
    x32 = _rand((b, h, w, c))
    k32 = _rand((3, 3, c, d), seed=1) * 0.1
    exact = np.asarray(_mmconv_apply(x32, k32))
    got = np.asarray(conv_same_pallas(
        x32.astype(jnp.bfloat16), k32.astype(jnp.bfloat16),
        interpret=True), np.float32)
    chain = np.asarray(_mmconv_apply(
        x32.astype(jnp.bfloat16), k32.astype(jnp.bfloat16)), np.float32)
    scale = np.abs(exact).max()
    assert np.abs(got - exact).max() / scale < 0.03
    assert (np.abs(got - exact).max()
            <= np.abs(chain - exact).max() * 1.5 + 1e-6)


def test_model_forward_with_pallas_dispatch(monkeypatch):
    """DenseFCN forward with the Pallas conv forced on (interpreter) must
    match the einsum-only forward bit-for-bit in f32."""
    model = DenseFCNResNet152(blocks=(1, 1, 1, 1), width=0.125)
    x = _rand((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("RCVPOSE_PALLAS_CONV", "off")
    seg_ref, rad_ref = model.apply(variables, x)
    monkeypatch.setenv("RCVPOSE_PALLAS_CONV", "interpret")
    seg_p, rad_p = model.apply(variables, x)
    np.testing.assert_allclose(np.asarray(seg_p), np.asarray(seg_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rad_p), np.asarray(rad_ref),
                               rtol=1e-5, atol=1e-5)


def test_applicable_gate():
    assert pallas_applicable((1, 16, 16, 8), 3, 4)
    assert not pallas_applicable((1, 16, 16, 8), 1, 4)   # 1x1 -> einsum
    assert not pallas_applicable((1, 16, 16, 8), 2, 4)   # even K unsupported
