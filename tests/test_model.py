import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcvpose_tpu.models import DenseFCNResNet152, ResFCNResNet152

# Shallow stage depths: same topology/strides/skips as ResNet-152, cheap
# enough for the 1-core CPU test runner.
TINY = (1, 1, 1, 1)


@pytest.fixture(scope="module")
def small_input():
    return jnp.zeros((1, 64, 64, 3), jnp.float32)


def test_dense_fcn_shapes_small(small_input):
    model = DenseFCNResNet152(blocks=TINY, width=0.125)
    variables = model.init(jax.random.PRNGKey(0), small_input, False)
    seg, radial = model.apply(variables, small_input, False)
    assert seg.shape == (1, 64, 64, 1)
    assert radial.shape == (1, 64, 64, 1)
    assert seg.dtype == jnp.float32


def test_dense_fcn_full_param_count(small_input):
    # eval_shape: no FLOPs, just tracing — safe for the full 152-layer model.
    model = DenseFCNResNet152()
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), small_input, False))
    n_params = sum(int(np.prod(p.shape)) for p in
                   jax.tree.leaves(variables["params"]))
    # torch DenseFCNResNet152(3,2) is ~118M params; guard the ballpark.
    assert 100e6 < n_params < 140e6, n_params


def test_dense_fcn_rect_input():
    x = jnp.zeros((1, 96, 64, 3), jnp.float32)
    model = DenseFCNResNet152(blocks=TINY, width=0.125)
    variables = model.init(jax.random.PRNGKey(0), x, False)
    seg, radial = model.apply(variables, x, False)
    assert seg.shape == (1, 96, 64, 1)


def test_res_fcn_shapes(small_input):
    model = ResFCNResNet152(blocks=TINY, width=0.125)
    variables = model.init(jax.random.PRNGKey(0), small_input, False)
    seg, radial = model.apply(variables, small_input, False)
    assert seg.shape == (1, 64, 64, 1)
    assert radial.shape == (1, 64, 64, 1)


def test_res_fcn_double_up1(small_input):
    model = ResFCNResNet152(blocks=TINY, double_up1=True, width=0.125)
    variables = model.init(jax.random.PRNGKey(0), small_input, False)
    seg, _ = model.apply(variables, small_input, False)
    assert seg.shape == (1, 128, 128, 1)  # reference bug reproduced on demand


def test_train_mode_updates_batch_stats(small_input):
    model = DenseFCNResNet152(blocks=TINY, width=0.125)
    variables = model.init(jax.random.PRNGKey(0), small_input, False)
    x = jax.random.normal(jax.random.PRNGKey(1), small_input.shape)
    (_, _), mutated = model.apply(variables, x, True,
                                  mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    diffs = [float(jnp.abs(a - b).max()) for a, b in zip(before, after)]
    assert max(diffs) > 0


def test_up2x_matches_jax_image_resize(rng):
    from rcvpose_tpu.models.fcnresnet import jax_resize2x

    x = jnp.asarray(rng.normal(size=(2, 7, 9, 5)).astype(np.float32))
    got = jax_resize2x(x)
    ref = jax.image.resize(x, (2, 14, 18, 5), method="bilinear")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

def test_width_scaling_consistent():
    # power-of-two widths keep the x4 bottleneck expansion exact: the
    # additive-skip decoder's channel-lift convs must line up at any width
    from rcvpose_tpu.models.fcnresnet import _scaled

    for width in (1.0, 0.5, 0.25, 0.125):
        for c in (64, 128, 256, 512):
            assert _scaled(4 * c, width) == 4 * _scaled(c, width), (width, c)

def test_multihead_output_shapes(small_input):
    # kpt_heads=3 extension: 6-channel output splits into K=3 head pairs
    model = DenseFCNResNet152(blocks=TINY, width=0.125, output_channels=6)
    variables = model.init(jax.random.PRNGKey(0), small_input, False)
    seg, radial = model.apply(variables, small_input, False)
    assert seg.shape == (1, 64, 64, 3)
    assert radial.shape == (1, 64, 64, 3)


def test_multihead_split_matches_single(small_input):
    # K=1 split must be exactly the reference 2-channel behavior
    from rcvpose_tpu.models.fcnresnet import _split_heads
    import jax.numpy as jnp

    out = jnp.arange(2 * 4 * 6 * 2, dtype=jnp.float32).reshape(2, 4, 6, 2)
    seg, radial = _split_heads(out)
    np.testing.assert_array_equal(np.asarray(seg[..., 0]),
                                  np.asarray(out[..., 0]))
    np.testing.assert_array_equal(np.asarray(radial[..., 0]),
                                  np.asarray(out[..., 1]))


def test_mmconv_matches_nn_conv_f32_and_bf16():
    """MMConv == nn.Conv on identical params. In bf16 the K*K shifted
    contributions accumulate in bf16 (f32 partials were measured 1 ms
    slower on v5e and rejected — PERF.md), so the result carries a few
    extra bf16 roundings vs the f32 oracle; bound them."""
    import flax.linen as nn
    import jax.numpy as jnp

    from rcvpose_tpu.models.fcnresnet import MMConv

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 8, 10, 16)).astype(np.float32))
    ref_conv = nn.Conv(12, (3, 3), padding=1, dtype=jnp.float32)
    ref_vars = ref_conv.init(jax.random.PRNGKey(0), x)
    oracle = np.asarray(ref_conv.apply(ref_vars, x))

    f32 = MMConv(12, 3, dtype=jnp.float32).apply(ref_vars, x)
    np.testing.assert_allclose(np.asarray(f32), oracle, atol=2e-5)

    bf16 = MMConv(12, 3, dtype=jnp.bfloat16).apply(ref_vars, x)
    # input rounding + up to K*K-1 partial-sum roundings at ~2^-8 relative
    tol = 4.0 * np.abs(oracle).max() * 2.0 ** -8
    np.testing.assert_allclose(np.asarray(bf16, np.float32), oracle,
                               atol=float(tol))


def test_mmconv_custom_vjp_matches_autodiff_and_nn_conv():
    """mmconv2d's hand-written backward (transpose conv in the same
    shifted-matmul form — see the device-trace rationale in its docstring)
    must equal both XLA autodiff of the forward and nn.Conv's gradients."""
    import flax.linen as nn
    import jax.numpy as jnp

    from rcvpose_tpu.models.fcnresnet import _mmconv_apply, mmconv2d

    rng = np.random.default_rng(3)
    for ks in (1, 3):
        x = jnp.asarray(rng.normal(size=(2, 9, 11, 5)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(ks, ks, 5, 7)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(2, 9, 11, 7)).astype(np.float32))

        gx1, gk1 = jax.grad(lambda x, k: jnp.sum(mmconv2d(x, k) * g),
                            argnums=(0, 1))(x, k)
        gx2, gk2 = jax.grad(lambda x, k: jnp.sum(_mmconv_apply(x, k) * g),
                            argnums=(0, 1))(x, k)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2),
                                   rtol=1e-5, atol=1e-5)

        conv = nn.Conv(7, (ks, ks), padding=ks // 2, dtype=jnp.float32)
        kernel_vars = {"params": {"kernel": k, "bias": jnp.zeros(7)}}
        gx3 = jax.grad(lambda x: jnp.sum(conv.apply(kernel_vars, x) * g))(x)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx3),
                                   rtol=1e-4, atol=1e-4)


def test_remat_same_outputs_gradients_param_tree(small_input):
    """remat=True (encoder-block jax.checkpoint) changes scheduling only:
    same parameter tree, same outputs, differentiable."""
    import jax.numpy as jnp

    ref = DenseFCNResNet152(blocks=TINY, width=0.125)
    rem = DenseFCNResNet152(blocks=TINY, width=0.125, remat=True)
    v = ref.init(jax.random.PRNGKey(0), small_input, False)
    v2 = rem.init(jax.random.PRNGKey(0), small_input, False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    seg_a, rad_a = ref.apply(v, small_input, False)
    seg_b, rad_b = rem.apply(v, small_input, False)
    np.testing.assert_allclose(np.asarray(seg_a), np.asarray(seg_b),
                               atol=1e-6)

    def loss(params, model):
        (seg, rad), _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            small_input, True, mutable=["batch_stats"])
        return jnp.mean(seg ** 2) + jnp.mean(rad ** 2)

    g_a = jax.grad(loss)(v["params"], ref)
    g_b = jax.grad(loss)(v["params"], rem)
    flat_a = jax.tree_util.tree_leaves(g_a)
    flat_b = jax.tree_util.tree_leaves(g_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fast_head_shapes_and_param_tree(small_input):
    """fast_head runs conv7/conv8 at H/2 + upsamples the thin output: same
    full-res output shapes and the IDENTICAL parameter tree (torch
    import/export unaffected)."""
    ref = DenseFCNResNet152(blocks=TINY, width=0.125)
    fast = DenseFCNResNet152(blocks=TINY, width=0.125, fast_head=True)
    v_ref = ref.init(jax.random.PRNGKey(0), small_input, False)
    v_fast = fast.init(jax.random.PRNGKey(0), small_input, False)
    ref_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_flatten_with_path(v_ref)[0]}
    fast_paths = {jax.tree_util.keystr(p)
                  for p, _ in jax.tree_util.tree_flatten_with_path(v_fast)[0]}
    assert ref_paths == fast_paths
    seg, radial = fast.apply(v_ref, small_input, False)
    assert seg.shape == (1, 64, 64, 1)
    assert radial.shape == (1, 64, 64, 1)
