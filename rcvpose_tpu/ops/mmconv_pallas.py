"""Pallas TPU kernel for the full-resolution decoder convolutions.

``models/fcnresnet.py::mmconv2d`` expresses a SAME KxK conv as K*K shifted
matmuls so the shallow-channel decoder tail rides the MXU instead of XLA's
conv path (reference conv stack: ``/root/reference/models/fcnresnet.py``,
conv_up1/conv7 at ``:108-118``). That form is MXU-right but HBM-wrong in
training: XLA materializes the accumulator chain between the K*K einsum
fusions, so each full-resolution conv re-reads and re-writes megapixel
buffers K*K times (a device trace of the batch-4 480x640 train step put
~12 ms/step into the conv7/conv_up1 chains plus their layout copies —
PERF.md "Training").

This kernel computes the whole conv in ONE pass over the image: a row-tile
of the input is staged in VMEM once, all K*K shifted matmuls accumulate
into a float32 VMEM scratch, and the tile's output is written once.
HBM traffic drops from ~K*K reads + K*K-1 accumulator round-trips to
exactly one read + one write per pixel.

MEASURED OUTCOME (v5e, batch-4 480x640 bf16): standalone the kernel wins
the wide-channel shapes (conv_up1 192->64: 2.8 vs 4.8 ms) and loses the
thin-channel ones (conv7 64->32: 6.0 vs 4.5 ms — lane padding makes the
kernel VPU-copy-bound at 64 channels). IN-GRAPH even the winning shape
loses: the custom call pins its operands/results to default layouts, so
XLA materializes relayout copies of the megapixel buffers at the boundary
that the freely-fused einsum chain never pays (full train step 88.9 ms
with conv_up1 on the kernel vs 83.3 ms einsum-only). Model dispatch
therefore DEFAULTS OFF (models/fcnresnet.py::_pallas_conv_mode); the
kernel stays as the measured evidence line for PERF.md "Training" and an
RCVPOSE_PALLAS_CONV=auto|on experiment switch.

Design:
* Grid = (batch, row-tiles). Halo rows come in as two extra clamped block
  views of the same input (no manual DMA, no semaphores); the first/last
  tile zero their out-of-image halo in-kernel, giving SAME zero padding.
  Width padding is an in-VMEM concat with zero columns.
* Mosaic cannot shift bf16 vectors along the sublane (width) dim, so no
  operand is ever width-shifted: the K row (dy) shifts are an outer-dim
  concat (ycat, contraction K*C), the K width (dx) shifts' weight columns
  are lane-packed into one (K*C, K*D) matrix so a single matmul per tile
  emits every shift's contribution, and the dx shifts are realized as
  static f32 slice-adds on the OUTPUT (f32 offsets are supported).
* Accumulation is float32 regardless of input dtype (closer to
  ``nn.Conv``'s single f32-accumulated conv than mmconv2d's bf16
  contribution adds; tests bound both against nn.Conv).
* The backward reuses the machinery: dx is the forward conv of the
  cotangent with the flipped/transposed kernel; a second kernel packs the
  K width-shifted zero-padded cotangents lane-wise and accumulates
  dk = im2col(x)^T @ g across the sequential grid (race-free by TPU grid
  order, dy on the x side, dx on the g side).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# Per-block VMEM working-set budget (bytes); TH is chosen to fit it.
# The accounting below uses PHYSICAL (lane-padded) sizes — a 32-channel
# f32 value occupies full 128-lane tiles — and leaves headroom under the
# scoped-vmem limit (raised via CompilerParams below) for Mosaic's own
# temporaries.
_VMEM_BUDGET = int(_os.environ.get("RCVPOSE_MMCONV_VMEM",
                                   str(13 * 1024 * 1024)))


def _row_window(top_ref, mid_ref, bot_ref, th, pad):
    """Assemble the (TH + 2p, W + 2p, C) zero-padded input window."""
    i = pl.program_id(1)
    n = pl.num_programs(1)
    top = top_ref[0]
    bot = bot_ref[0]
    top = jnp.where(i == 0, jnp.zeros_like(top), top)
    bot = jnp.where(i == n - 1, jnp.zeros_like(bot), bot)
    xs = jnp.concatenate([top, mid_ref[0], bot], axis=0)
    zcol = jnp.zeros((th + 2 * pad, pad, xs.shape[-1]), xs.dtype)
    return jnp.concatenate([zcol, xs, zcol], axis=1)


def _dy_cat(xs, ks, th):
    """(TH+2p, W+2p, C) window -> (TH, W+2p, K*C) with ycat[t, j, dy*C + c]
    = xs[t + dy, j, c]. Row (outermost-dim) slices carry no vector offset,
    so this concat is Mosaic-legal — unlike concatenating width-shifted
    slices, whose differing sublane offsets Mosaic's concat rejects."""
    return jnp.concatenate([xs[dy:dy + th] for dy in range(ks)], axis=-1)


def _fwd_kernel(top_ref, mid_ref, bot_ref, wcat_ref, o_ref, *, ks, th):
    """One MXU pass per tile: wcat packs the K width-shifts' weight columns
    lane-wise (K*C, K*D), so a single matmul over the full padded width
    produces every shift's contribution; the dx shifts then ride the f32
    OUTPUT side as static slice-adds (bf16 sublane shifts are not
    implemented in Mosaic; f32 static-offset slices are)."""
    pad = ks // 2
    w = o_ref.shape[2]
    dout = o_ref.shape[3]
    wpad = w + 2 * pad
    xs = _row_window(top_ref, mid_ref, bot_ref, th, pad)
    ycat = _dy_cat(xs, ks, th)                     # (TH, W + 2p, K*C)
    yc2 = ycat.reshape(th * wpad, ycat.shape[-1])
    c3 = jnp.dot(yc2, wcat_ref[...],
                 preferred_element_type=jnp.float32)
    c3 = c3.reshape(th, wpad, ks * dout)
    acc = c3[:, 0:w, 0:dout]
    for dx in range(1, ks):
        acc = acc + c3[:, dx:dx + w, dx * dout:(dx + 1) * dout]
    o_ref[0] = acc.astype(o_ref.dtype)


def _dk_kernel(top_ref, mid_ref, bot_ref, g_ref, o_ref, *, ks, th):
    """Accumulates dk transposed as (kx, ky, C, D); the caller swaps the
    spatial axes back. The dx shifts land on g: the cotangent is placed at
    column offset dx in K zero-padded full-width buffers packed lane-wise,
    so one matmul per tile computes all K shifts and every MXU operand
    stays at vector offset 0."""
    pad = ks // 2
    w = g_ref.shape[2]
    cin = mid_ref.shape[3]
    dout = g_ref.shape[3]
    wpad = w + 2 * pad
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    xs = _row_window(top_ref, mid_ref, bot_ref, th, pad)
    ycat = _dy_cat(xs, ks, th)
    yc2 = ycat.reshape(th * wpad, ycat.shape[-1])
    g3 = g_ref[0]                                   # (TH, W, D)
    shifted = []
    for dx in range(ks):
        parts = []
        if dx:
            parts.append(jnp.zeros((th, dx, dout), g3.dtype))
        parts.append(g3)
        if 2 * pad - dx:
            parts.append(jnp.zeros((th, 2 * pad - dx, dout), g3.dtype))
        shifted.append(jnp.concatenate(parts, axis=1)
                       if len(parts) > 1 else parts[0])
    gcat = jnp.concatenate(shifted, axis=-1)        # (TH, W + 2p, K*D)
    dk3 = jax.lax.dot_general(
        yc2, gcat.reshape(th * wpad, ks * dout), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)         # (K*C, K*D)
    for dx in range(ks):
        o_ref[dx] += dk3[:, dx * dout:(dx + 1) * dout].reshape(
            ks, cin, dout)


def _pick_tile(h, w, cin, dout, ks, itemsize):
    """Largest row-tile whose working set fits the VMEM budget."""
    pad = ks // 2
    lane = lambda c: -(-c // 128) * 128            # noqa: E731
    cpad, dpad = lane(cin), lane(dout)
    kcpad, kdpad = lane(ks * cin), lane(ks * dout)
    wpad = w + 2 * pad
    fixed = (itemsize * ks * cin * kdpad           # wcat block (fwd)
             + 4 * ks * ks * cin * dpad)           # f32 dk output block
    for th in (32, 16, 8, 4, 2, 1):
        if h % th or th < pad or th % pad:
            continue
        bytes_needed = fixed + (
            itemsize * (2 * th * w * cpad          # mid block, double-buffer
                        + 4 * pad * w * cpad       # halo blocks
                        + 2 * th * wpad * kcpad    # ycat + 2-D reshape copy
                        + th * wpad * kdpad        # gcat (dk kernel)
                        + 2 * th * w * dpad)       # out block, double-buffer
            + 4 * (th * wpad * kdpad               # f32 packed matmul result
                   + th * w * dpad))               # f32 accumulator
        if bytes_needed <= _VMEM_BUDGET:
            return th
    return None


def pallas_applicable(x_shape, ks, dout):
    """Whether conv_same_pallas supports this (shape, kernel): K odd >= 3
    and a VMEM-feasible row tile exists for the image height. Sized at
    float32 width so the gate never admits a shape the f32 path would
    then fail to tile."""
    if ks % 2 == 0 or ks < 3:
        return False
    _, h, w, c = x_shape
    return _pick_tile(h, w, c, dout, ks, 4) is not None


def pallas_wins(x_shape, ks, dout):
    """The STANDALONE-win region on v5e: wide-channel (>= 128) mid-to-high
    resolution convs, where the one-pass kernel beats the einsum chain's
    K*K accumulator round-trips as an isolated jit (conv_up1 192->64 @
    240x320 batch 4: 2.8 vs 4.8 ms). Thin-channel shapes (conv7 64->32)
    stay on the einsum chain — its lane-packed VPU footprint is smaller.

    NOTE: measured IN-GRAPH this win does not survive — the custom-call's
    fixed operand/result layouts force relayout copies of megapixel
    buffers at its boundary that the freely-fused einsum chain never pays
    (full train step: 88.9 ms with conv_up1 on the kernel vs 83.3 ms
    einsum-only; PERF.md "Training"). The model dispatch therefore
    defaults to OFF; this predicate routes the experimental
    RCVPOSE_PALLAS_CONV=auto mode and the standalone/dk direction choices.
    RCVPOSE_PALLAS_CONV=on forces every applicable shape."""
    if not pallas_applicable(x_shape, ks, dout):
        return False
    if _os.environ.get("RCVPOSE_PALLAS_CONV") == "on":
        return True
    _, h, w, c = x_shape
    return c >= 128 and h * w >= 240 * 320


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv_same_pallas(x, kernel, interpret=False):
    """SAME stride-1 KxK NHWC conv, one HBM pass, f32 accumulation.

    x: (B, H, W, C); kernel: (K, K, C, D) in x.dtype. Returns (B, H, W, D)
    in x.dtype. K odd; H must be divisible by a feasible row tile.
    """
    b, h, w, cin = x.shape
    ks, _, _, dout = kernel.shape
    pad = ks // 2
    th = _pick_tile(h, w, cin, dout, ks, x.dtype.itemsize)
    if th is None:
        raise ValueError(f"no feasible row tile for {x.shape} K={ks}")
    r = th // pad
    nh = h // th
    last = h // pad - 1

    top = pl.BlockSpec(
        (1, pad, w, cin),
        lambda bb, i: (bb, jnp.maximum(i * r - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    mid = pl.BlockSpec((1, th, w, cin), lambda bb, i: (bb, i, 0, 0),
                       memory_space=pltpu.VMEM)
    bot = pl.BlockSpec(
        (1, pad, w, cin),
        lambda bb, i: (bb, jnp.minimum((i + 1) * r, last), 0, 0),
        memory_space=pltpu.VMEM)
    # Lane-pack the K width-shifts' weight columns: wcat[:, dx*D + d]
    # = kernel[:, dx, :, d] flattened over (ky, c).
    wcat = jnp.concatenate(
        [kernel[:, dx].reshape(ks * cin, dout) for dx in range(ks)], axis=-1)
    wspec = pl.BlockSpec((ks * cin, ks * dout), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, ks=ks, th=th),
        grid=(b, nh),
        in_specs=[top, mid, bot, wspec],
        out_specs=pl.BlockSpec((1, th, w, dout), lambda bb, i: (bb, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, dout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 3 * 1024 * 1024),
        interpret=interpret,
    )(x, x, x, wcat)


@functools.partial(jax.jit, static_argnames=("ks", "interpret"))
def conv_same_pallas_dk(x, g, ks, interpret=False):
    """Weight gradient dk[ky,kx,c,d] = sum_bhw x[b,h+ky-p,w+kx-p,c] g[b,h,w,d]
    accumulated in f32 across the sequential grid. Returns (K, K, C, D) f32.
    """
    ks = int(ks)
    b, h, w, cin = x.shape
    dout = g.shape[-1]
    pad = ks // 2
    th = _pick_tile(h, w, cin, dout, ks, x.dtype.itemsize)
    if th is None:
        raise ValueError(f"no feasible row tile for {x.shape} K={ks}")
    r = th // pad
    last = h // pad - 1

    top = pl.BlockSpec(
        (1, pad, w, cin),
        lambda bb, i: (bb, jnp.maximum(i * r - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    mid = pl.BlockSpec((1, th, w, cin), lambda bb, i: (bb, i, 0, 0),
                       memory_space=pltpu.VMEM)
    bot = pl.BlockSpec(
        (1, pad, w, cin),
        lambda bb, i: (bb, jnp.minimum((i + 1) * r, last), 0, 0),
        memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((1, th, w, dout), lambda bb, i: (bb, i, 0, 0),
                         memory_space=pltpu.VMEM)
    dk_t = pl.pallas_call(
        functools.partial(_dk_kernel, ks=ks, th=th),
        grid=(b, h // th),
        in_specs=[top, mid, bot, gspec],
        out_specs=pl.BlockSpec((ks, ks, cin, dout),
                               lambda bb, i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ks, ks, cin, dout), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 3 * 1024 * 1024),
        interpret=interpret,
    )(x, x, x, g)
    return jnp.transpose(dk_t, (1, 0, 2, 3))   # (kx, ky, ...) -> (ky, kx, ...)


def _rot_transpose(kernel):
    """Kernel transform for the transpose conv: flip both spatial dims and
    swap the channel axes (dL/dx of a SAME conv is the SAME conv of the
    cotangent with this kernel — models/fcnresnet.py::_mmconv2d_bwd)."""
    return jnp.transpose(kernel[::-1, ::-1], (0, 1, 3, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def mmconv2d_pallas(x, kernel, interpret=False):
    """Differentiable one-pass Pallas SAME conv (drop-in for mmconv2d)."""
    return conv_same_pallas(x, kernel, interpret=interpret)


def _mmconv2d_pallas_fwd(x, kernel, interpret):
    return conv_same_pallas(x, kernel, interpret=interpret), (x, kernel)


def _mmconv2d_pallas_bwd(interpret, res, g):
    x, kernel = res
    g = g.astype(x.dtype)
    kt = _rot_transpose(kernel)
    ks = kernel.shape[0]
    # dx is itself a SAME conv of g (channels = this conv's dout); route it
    # by the same measured-win rule — conv_up1's dx has 64-channel input,
    # where the einsum chain beats the kernel.
    if interpret or pallas_wins(g.shape, ks, kt.shape[-1]):
        dx = conv_same_pallas(g, kt, interpret=interpret)
    else:
        from rcvpose_tpu.models.fcnresnet import _mmconv_apply

        dx = _mmconv_apply(g, kt)
    dk = conv_same_pallas_dk(x, g, ks, interpret=interpret)
    return dx, dk.astype(kernel.dtype)


mmconv2d_pallas.defvjp(_mmconv2d_pallas_fwd, _mmconv2d_pallas_bwd)
