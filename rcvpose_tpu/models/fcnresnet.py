"""FCN-ResNet-152 radial-map backbones in Flax (NHWC, TPU-native).

Architectural parity with the reference torch models
(``/root/reference/models/fcnresnet.py``):

* ``DenseFCNResNet152`` (fcnresnet.py:48-191) — ResNet-152 encoder
  (3/8/36/3 bottleneck stages), a 2048->1024 conv6 neck, and an FCN decoder
  with *concatenated* skip connections, emitting a 2-channel full-resolution
  map split into (segmentation, radial) heads.
* ``ResFCNResNet152`` (fcnresnet.py:194-323) — same encoder, decoder with
  *additive* skips through 1x1 channel-lift convs. The reference applies
  ``up1`` twice (fcnresnet.py:311-313); that second application is the 5th
  ladder step (H/2 -> H), so reference output is input resolution — matched
  by the default ``double_up1=False`` (verified numerically against the
  torch model in tests/test_torch_parity.py). ``double_up1=True`` adds a 6th
  upsample (2x-resolution output) and matches nothing in the reference.

TPU-first choices: NHWC layout, bf16-capable compute dtype with f32 params,
BatchNorm statistics in f32. The encoder's deep-channel convs use XLA's
conv path (already MXU-optimal); the decoder's shallow-channel full-res
convs use ``MMConv`` — shifted-matmul formulations that a v5e device trace
showed run 2-4x faster than ``conv_general_dilated`` at those shapes
(full forward 10.0 ms -> 4.4 ms at 480x640 bf16). Param trees are
identical to ``nn.Conv``, so torch-checkpoint import and numerical parity
are unaffected (tests/test_torch_parity.py).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# ResNet-152 stage depths (reference fcnresnet.py:60-82).
RESNET152_BLOCKS = (3, 8, 36, 3)


def _scaled(c: int, width: float) -> int:
    """Channel count scaled by a width multiplier, floored at 8 lanes.

    ``width=1.0`` (the default everywhere) is the reference architecture.
    Fractional widths exist for tests and driver dryruns only: they keep the
    exact topology (stages, skips, BN placement, sharding structure) while
    shrinking compute quadratically — essential on single-core CI boxes that
    emulate 8-device meshes.
    """
    return max(8, int(round(c * width)))


class Bottleneck(nn.Module):
    """1-3-1 bottleneck, x4 expansion (reference fcnresnet.py:6-45).

    ``project=True`` adds the 1x1 projection shortcut (the reference's
    misleadingly named ``upsample`` flag).
    """
    channels: int
    stride: int = 1
    project: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        # reference conv2 keeps torch's default bias=True (fcnresnet.py:11)
        y = nn.Conv(self.channels, (3, 3), strides=(self.stride,) * 2,
                    padding=1, dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn3")(y)
        if self.project:
            residual = nn.Conv(self.channels * 4, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name="proj_conv")(residual)
            residual = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype, name="proj_bn")(residual)
        return nn.relu(y + residual)


def _mmconv_apply(x, kernel):
    """Shifted-matmul SAME conv core: pad once, K*K einsums, accumulate."""
    ks = kernel.shape[0]
    if ks == 1:
        return jnp.einsum("bhwc,cd->bhwd", x, kernel[0, 0])
    p = ks // 2
    h, w = x.shape[1], x.shape[2]
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    out = None
    for dy in range(ks):
        for dx in range(ks):
            contrib = jnp.einsum(
                "bhwc,cd->bhwd", xp[:, dy:dy + h, dx:dx + w, :],
                kernel[dy, dx])
            out = contrib if out is None else out + contrib
    return out


@jax.custom_vjp
def mmconv2d(x, kernel):
    """SAME-padding conv as shifted matmuls, with a hand-written backward.

    XLA's autodiff of the forward's padded-buffer slices turns the input
    gradient into K*K materialized full-resolution pad+add fusions — a
    device trace of the train step showed those fusions (plus their layout
    copies) dominating the decoder backward at 480x640. The VJP below is
    the transpose conv expressed in the SAME fast form: pad the cotangent
    once and run K*K einsums against the flipped/transposed kernel, so
    backward enjoys the exact optimization the forward was built for
    (dL/dx[a,b] = sum_{u,v} g[a-u, b-v] W[p+u, p+v] = shifted-matmul of g
    with W flipped in both spatial dims, channels transposed).
    """
    return _mmconv_apply(x, kernel)


def _mmconv2d_fwd(x, kernel):
    return _mmconv_apply(x, kernel), (x, kernel)


def _mmconv2d_bwd(res, g):
    x, kernel = res
    g = g.astype(x.dtype)
    ks = kernel.shape[0]
    # input grad: same shifted-matmul conv of g with the rotated kernel
    dx = _mmconv_apply(g, jnp.transpose(kernel[::-1, ::-1], (0, 1, 3, 2)))
    # weight grad: per-shift (bhw)-contraction einsums off one padded x
    if ks == 1:
        dk = jnp.einsum("bhwc,bhwd->cd", x, g)[None, None]
    else:
        p = ks // 2
        h, w = x.shape[1], x.shape[2]
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        dk = jnp.stack([
            jnp.stack([
                jnp.einsum("bhwc,bhwd->cd", xp[:, dy:dy + h, dx:dx + w, :], g)
                for dx in range(ks)], axis=0)
            for dy in range(ks)], axis=0)
    return dx, dk


mmconv2d.defvjp(_mmconv2d_fwd, _mmconv2d_bwd)


def _pallas_conv_mode(x_shape, ks, dout):
    """Dispatch for the one-HBM-pass Pallas conv (ops/mmconv_pallas.py).

    Returns 'off' | 'tpu' | 'interpret'. DEFAULT OFF: the kernel beats the
    einsum chain standalone on wide-channel shapes (conv_up1 192->64 at
    240x320: 2.8 vs 4.8 ms fwd at batch 4), but in-graph the custom-call
    boundary forces relayout copies of megapixel buffers that cost more
    than the win (train step 88.9 vs 83.3 ms; PERF.md "Training").
    RCVPOSE_PALLAS_CONV=off|auto|on|interpret overrides ('auto' = the
    standalone-win heuristic, 'on' = every supported shape, 'interpret'
    forces the Pallas interpreter for CPU-backend tests)."""
    import os

    env = os.environ.get("RCVPOSE_PALLAS_CONV", "off")
    if env == "off":
        return "off"
    from rcvpose_tpu.ops.mmconv_pallas import (pallas_applicable,
                                               pallas_wins)

    if not pallas_applicable(x_shape, ks, dout):
        return "off"
    if env == "interpret":
        return "interpret"
    if jax.default_backend() != "tpu":
        return "off"
    return "tpu" if pallas_wins(x_shape, ks, dout) else "off"


class MMConv(nn.Module):
    """Conv expressed as shifted matmuls (einsum over channels).

    Numerically identical to ``nn.Conv`` in float32 (same padding/init/
    param tree: kernel (kh, kw, cin, cout) + bias); in bfloat16 it is
    within a few extra bf16 roundings of nn.Conv (see the accumulation
    note below). Lowers to K*K batched matmuls
    with fused accumulation instead of ``conv_general_dilated``. On TPU the
    XLA conv path underutilizes the MXU for shallow-channel wide-spatial
    stages: measured 2.9 ms -> 0.24 ms for conv7 (480x640, 64->32) and
    0.46 -> 0.20 ms for conv_up1 (240x320, 192->64) on v5e
    (scripts/prof_tail_forms.py; device-trace confirmed). Used only for
    the full-resolution decoder tail where the win is measured.
    """
    features: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ks = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (ks, ks, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        # Accumulation dtype = compute dtype. In bf16 each of the K*K
        # shifted contributions is rounded before the adds — up to K*K-1
        # extra roundings vs conv_general_dilated's single f32-accumulated
        # result (each einsum still accumulates its own contraction in f32
        # on the MXU). f32 partial sums were measured on v5e and REJECTED:
        # they double the decoder tail's intermediate bytes and cost ~1 ms
        # of the 4.4 ms forward (70.8 -> 57.1 fps end to end, PERF.md).
        # The bf16 rounding error is bounded by the test suite
        # (tests/test_model.py::test_mmconv_matches_nn_conv_f32_and_bf16)
        # and the end-to-end ADD proof trains/serves in bf16 (E2E.md).
        mode = _pallas_conv_mode(x.shape, ks, self.features)
        if mode != "off":
            from rcvpose_tpu.ops.mmconv_pallas import mmconv2d_pallas
            out = mmconv2d_pallas(x, kernel, mode == "interpret")
            return out + bias.astype(self.dtype)
        return mmconv2d(x, kernel) + bias.astype(self.dtype)


def _conv_bn_relu(x, features, train, dtype, name, mm=False):
    conv = (MMConv(features, 3, dtype=dtype, name=f"{name}_conv") if mm
            else nn.Conv(features, (3, 3), padding=1, dtype=dtype,
                         name=f"{name}_conv"))
    x = conv(x)
    x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                     epsilon=1e-5, dtype=dtype, name=f"{name}_bn")(x)
    return nn.relu(x)


def _up2x_axis(x, axis):
    """Bilinear x2 along one spatial axis, half-pixel centers with edge
    clamp — exactly ``jax.image.resize(..., 'bilinear')`` / torch
    ``align_corners=False`` semantics for integer x2 scaling."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 1)
    xp = jnp.pad(x, pad, mode="edge")
    n = x.shape[axis]
    lo = jax.lax.slice_in_dim(xp, 0, n, axis=axis)        # x[i-1]
    mid = jax.lax.slice_in_dim(xp, 1, n + 1, axis=axis)   # x[i]
    hi = jax.lax.slice_in_dim(xp, 2, n + 2, axis=axis)    # x[i+1]
    even = 0.25 * lo + 0.75 * mid
    odd = 0.75 * mid + 0.25 * hi
    out = jnp.stack([even, odd], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] = 2 * n
    return out.reshape(shape)


def jax_resize2x(x):
    """Bilinear x2 upsample (torch align_corners=False semantics).

    Hand-rolled from pad/slice/stack instead of ``jax.image.resize``: the
    gather-based resize lowering drags the decoder into W-major layouts on
    TPU (measured 2.5 ms of relayout copies per conv7 at 480x640).

    RCVPOSE_PIN_RESIZE=pre|post reproduces the measured-NEGATIVE layout-pin
    experiment (PERF.md "Round-3 attack"): forcing the default layout at
    the upsample seams costs +17% train-step time — XLA's layout
    excursions here are load-bearing. Keep unset for production."""
    import os
    if os.environ.get("RCVPOSE_PIN_RESIZE") == "pre":
        from rcvpose_tpu.ops.layout import force_standard_layout
        x = force_standard_layout(x)
    x = _up2x_axis(x, 1)
    x = _up2x_axis(x, 2)
    if os.environ.get("RCVPOSE_PIN_RESIZE") == "post":
        from rcvpose_tpu.ops.layout import force_standard_layout
        x = force_standard_layout(x)
    return x


class _Encoder(nn.Module):
    """Shared ResNet-152 encoder trunk; returns all skip tensors."""
    dtype: jnp.dtype = jnp.float32
    blocks: Sequence[int] = RESNET152_BLOCKS
    width: float = 1.0
    remat: bool = False  # rematerialize bottleneck activations in backward
    #   (jax.checkpoint per block): trades one extra block forward for not
    #   storing the 3 intra-block activations — lifts the max training
    #   batch on a 16 GB chip (see PERF.md for the measured throughput
    #   tradeoff). Inference is unaffected (no backward).

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = lambda c: _scaled(c, self.width)  # noqa: E731
        x = nn.Conv(w(64), (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)                       # H/2, 64  ("x" skip)
        y = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))   # H/4

        block = nn.remat(Bottleneck, static_argnums=(2,)) if self.remat \
            else Bottleneck
        stage_channels = tuple(w(c) for c in (64, 128, 256, 512))
        skips = []
        for s, (depth, ch) in enumerate(zip(self.blocks, stage_channels)):
            stride = 1 if s == 0 else 2
            y = block(ch, stride=stride, project=True, dtype=self.dtype,
                      name=f"block{s + 1}up")(y, train)
            for i in range(1, depth):
                y = block(ch, dtype=self.dtype,
                          name=f"block{s + 1}_{i}")(y, train)
            skips.append(y)
        x2s, x4s, x8s, x16s = skips          # H/4 .. H/32
        return x, x2s, x4s, x8s, x16s


class DenseFCNResNet152(nn.Module):
    """Concat-skip FCN decoder variant — the production model.

    ``__call__(x)`` takes NHWC RGB (H, W multiples of 32 + even halves; the
    LINEMOD 480x640 frames divide cleanly) and returns
    ``(seg, radial)`` each (B, H, W, 1), mirroring the reference's 2-channel
    split (fcnresnet.py:188-191).
    """
    input_channels: int = 3
    output_channels: int = 2
    dtype: jnp.dtype = jnp.float32
    blocks: Sequence[int] = RESNET152_BLOCKS  # shallower for tests
    width: float = 1.0                        # fractional for tests only
    remat: bool = False      # checkpoint encoder blocks (see _Encoder.remat)
    fast_head: bool = False  # TPU-first extension: run the conv7/conv8 head
    #   BEFORE the final 2x upsample (1/4 the pixels for the costliest
    #   full-resolution stage) and bilinearly upsample the thin 2K-channel
    #   output instead. Identical parameter tree — torch import/export
    #   unaffected — but NOT the reference forward; opt in via
    #   Config.fast_head after checking the accuracy note in PERF.md.

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = lambda c: _scaled(c, self.width)  # noqa: E731
        x = x.astype(self.dtype)
        xc, x2s, x4s, x8s, x16s = _Encoder(dtype=self.dtype,
                                           blocks=self.blocks,
                                           width=self.width,
                                           remat=self.remat,
                                           name="encoder")(x, train)
        x32s = nn.Conv(w(1024), (3, 3), padding=1, dtype=self.dtype,
                       name="conv6")(x16s)
        x32s = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype, name="bn6")(x32s)
        x32s = nn.relu(x32s)

        up = _conv_bn_relu(jnp.concatenate([x32s, x16s], -1), w(1024), train,
                           self.dtype, "conv_up5", mm=True)
        up = jax_resize2x(up)
        up = _conv_bn_relu(jnp.concatenate([up, x8s], -1), w(512), train,
                           self.dtype, "conv_up4", mm=True)
        up = jax_resize2x(up)
        up = _conv_bn_relu(jnp.concatenate([up, x4s], -1), w(256), train,
                           self.dtype, "conv_up3", mm=True)
        up = jax_resize2x(up)
        up = _conv_bn_relu(jnp.concatenate([up, x2s], -1), w(128), train,
                           self.dtype, "conv_up2", mm=True)
        up = jax_resize2x(up)
        up = _conv_bn_relu(jnp.concatenate([up, xc], -1), w(64), train,
                           self.dtype, "conv_up1", mm=True)
        if self.fast_head:
            up = _conv_bn_relu(up, w(32), train, self.dtype, "conv7",
                               mm=True)
            out = MMConv(self.output_channels, 1, dtype=self.dtype,
                         name="conv8")(up)
            out = jax_resize2x(out)
        else:
            up = jax_resize2x(up)
            up = _conv_bn_relu(up, w(32), train, self.dtype, "conv7",
                               mm=True)
            out = MMConv(self.output_channels, 1, dtype=self.dtype,
                         name="conv8")(up)
        return _split_heads(out)


def _split_heads(out):
    """(B, H, W, 2K) -> ((B, H, W, K) seg, (B, H, W, K) radial), f32.

    K = 1 is the reference's 2-channel model (fcnresnet.py:188-191); K > 1
    is the multi-head extension (``output_channels = 2 * kpt_heads``: the
    first K channels are the per-keypoint segmentation logits, the last K
    the radial maps) — one shared encoder/decoder serving all keypoints.

    A thin-channel NHWC conv output gets a T(1,128)-tiled layout on TPU
    that poisons every downstream elementwise pass over the full-resolution
    maps (~6 ms/map measured); a plain transpose gets bitcast-folded, so
    the channel-major view is pinned to the default layout with a Pallas
    identity copy (one cheap materialized relayout).
    """
    from rcvpose_tpu.ops.layout import force_standard_layout

    k = out.shape[-1] // 2
    out = jnp.transpose(out.astype(jnp.float32), (3, 0, 1, 2))  # (2K,B,H,W)
    out = force_standard_layout(out)
    seg = jnp.moveaxis(out[:k], 0, -1)       # (B, H, W, K)
    radial = jnp.moveaxis(out[k:], 0, -1)
    return seg, radial


class ResFCNResNet152(nn.Module):
    """Additive-skip decoder variant (reference fcnresnet.py:194-323).

    The default ``double_up1=False`` reproduces the reference exactly: its
    two ``up1`` calls (fcnresnet.py:311-313) are this decoder's 5 total
    upsamples (H/32 -> H), same as ours (proved bit-close in
    tests/test_torch_parity.py). ``double_up1=True`` adds one extra final
    upsample (2x-resolution output) as an experimental option only.
    """
    input_channels: int = 3
    output_channels: int = 2
    double_up1: bool = False
    dtype: jnp.dtype = jnp.float32
    blocks: Sequence[int] = RESNET152_BLOCKS
    width: float = 1.0
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = lambda c: _scaled(c, self.width)  # noqa: E731
        x = x.astype(self.dtype)
        xc, x2s, x4s, x8s, x16s = _Encoder(dtype=self.dtype,
                                           blocks=self.blocks,
                                           width=self.width,
                                           remat=self.remat,
                                           name="encoder")(x, train)
        up = jax_resize2x(x16s)
        lift = MMConv(w(2048), 1, dtype=self.dtype, name="conv_up4_1")(x8s)
        up = _conv_bn_relu(up + lift, w(1024), train, self.dtype, "conv_up4", mm=True)

        up = jax_resize2x(up)
        lift = MMConv(w(1024), 1, dtype=self.dtype, name="conv_up3_1")(x4s)
        up = _conv_bn_relu(up + lift, w(512), train, self.dtype, "conv_up3", mm=True)

        up = jax_resize2x(up)
        lift = MMConv(w(512), 1, dtype=self.dtype, name="conv_up2_1")(x2s)
        up = _conv_bn_relu(up + lift, w(256), train, self.dtype, "conv_up2", mm=True)

        up = jax_resize2x(up)
        lift = MMConv(w(256), 1, dtype=self.dtype, name="conv_up1_1")(xc)
        up = _conv_bn_relu(up + lift, w(128), train, self.dtype, "conv_up1",
                           mm=True)
        up = jax_resize2x(up)
        if self.double_up1:
            up = jax_resize2x(up)

        up = _conv_bn_relu(up, w(64), train, self.dtype, "conv7", mm=True)
        out = MMConv(self.output_channels, 1, dtype=self.dtype,
                     name="conv8")(up)
        return _split_heads(out)
