"""Standalone probe: is there int8 headroom in the serving forward?

v5e's MXU runs int8 at 2x the bf16 rate (394 vs 197 TOP/s). Before
building a quantized inference mode (scales, calibration, accuracy
validation), measure the CEILING: the decoder's shifted-matmul einsums and
an encoder-representative conv at production shapes, bf16 vs int8-in/
int32-accumulate, device-true (chained fori_loop, dispatch amortized).
If the standalone win is small — these stages are substantially
HBM/layout-bound at batch 1 (PERF.md) — a quantized mode cannot pay for
its accuracy risk and this probe is the documented dead end.

Run: python scripts/prof_int8_probe.py          (TPU)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(fn, args, x0, reps=128, runs=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*a):
        x = a[-1]

        def body(i, carry):
            x, acc = carry
            m = fn(*a[:-1], x)
            return (x + (m * 1e-12).astype(x.dtype), acc + m)
        _, acc = jax.lax.fori_loop(0, reps, body, (x, jnp.float32(0)))
        return acc
    float(run(*args, x0))
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        float(run(*args, x0))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))

    rng = np.random.default_rng(0)
    rows = []

    def dq(x):  # int8 "dequant" epilogue: per-channel scale in f32
        return x

    # --- decoder einsum shapes (MMConv K*K shifted matmuls). The matmul
    # view of conv3x3 at (H, W, C)->D is (H*W, 9C) @ (9C, D); time the
    # dominant single einsum form the decoder actually issues per shift:
    # (H*W, C) @ (C, D), 9 of them accumulated.
    shapes = [
        ("conv_up1 240x320 192->64", (240 * 320, 192, 64), 9),
        ("conv7 480x640 64->32", (480 * 640, 64, 32), 9),
        ("conv_up5 15x20 3072->1024", (15 * 20, 3072, 1024), 9),
        ("enc-mid 30x40 1024->256 (1x1)", (30 * 40, 1024, 256), 1),
    ]
    for name, (m, c, d, *_), k in [(n, s, k) for n, s, k in shapes]:
        w_bf = jnp.asarray(rng.normal(size=(k, c, d)), jnp.bfloat16)
        w_i8 = jnp.asarray(
            np.clip(rng.normal(size=(k, c, d)) * 40, -127, 127), jnp.int8)
        scale = jnp.asarray(rng.uniform(0.5, 2.0, size=(d,)), jnp.float32)

        def bf16_fn(w, x):
            acc = jnp.zeros((m, d), jnp.bfloat16)
            for i in range(k):
                acc = acc + x @ w[i]
            return acc.astype(jnp.float32).mean()

        def i8_fn(w, s, x):
            xi = jnp.clip(jnp.round(x * 16.0), -127, 127).astype(jnp.int8)
            acc = jnp.zeros((m, d), jnp.int32)
            for i in range(k):
                acc = acc + jax.lax.dot(
                    xi, w[i], preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * s).mean()

        x_bf = jnp.asarray(rng.normal(size=(m, c)), jnp.bfloat16)
        t_bf = chain_time(functools.partial(bf16_fn), (w_bf,), x_bf)
        t_i8 = chain_time(functools.partial(i8_fn), (w_i8, scale), x_bf)
        flops = 2.0 * m * c * d * k
        rows.append({
            "shape": name, "k_shifts": k,
            "bf16_ms": round(t_bf * 1e3, 3),
            "int8_ms": round(t_i8 * 1e3, 3),
            "speedup": round(t_bf / t_i8, 2),
            "bf16_tflops": round(flops / t_bf / 1e12, 1),
            "int8_tops": round(flops / t_i8 / 1e12, 1),
        })
        print(rows[-1], file=sys.stderr)

    # --- encoder-representative conv (XLA conv_general_dilated path)
    for name, (b, h, w_, c, d, kk, stride) in [
            ("enc block3 conv 30x40 256->256 3x3", (1, 30, 40, 256, 256, 3, 1)),
            ("stem 480x640 3->64 7x7 s2", (1, 480, 640, 3, 64, 7, 2)),
    ]:
        kern_bf = jnp.asarray(rng.normal(size=(kk, kk, c, d)), jnp.bfloat16)
        kern_i8 = jnp.asarray(
            np.clip(rng.normal(size=(kk, kk, c, d)) * 40, -127, 127),
            jnp.int8)
        x0 = jnp.asarray(rng.normal(size=(b, h, w_, c)), jnp.bfloat16)
        dn = jax.lax.conv_dimension_numbers(
            x0.shape, kern_bf.shape, ("NHWC", "HWIO", "NHWC"))

        def conv_bf(kern, x):
            y = jax.lax.conv_general_dilated(
                x, kern, (stride, stride), "SAME", dimension_numbers=dn)
            return y.astype(jnp.float32).mean()

        def conv_i8(kern, x):
            xi = jnp.clip(jnp.round(x * 16.0), -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xi, kern, (stride, stride), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return y.astype(jnp.float32).mean()

        t_bf = chain_time(conv_bf, (kern_bf,), x0)
        try:
            t_i8 = chain_time(conv_i8, (kern_i8,), x0)
        except Exception as exc:  # int8 convs may be unsupported
            rows.append({"shape": name, "bf16_ms": round(t_bf * 1e3, 3),
                         "int8_ms": None,
                         "error": str(exc).splitlines()[0][:120]})
            print(rows[-1], file=sys.stderr)
            continue
        ho, wo = h // stride, w_ // stride
        flops = 2.0 * b * ho * wo * c * d * kk * kk
        rows.append({
            "shape": name,
            "bf16_ms": round(t_bf * 1e3, 3),
            "int8_ms": round(t_i8 * 1e3, 3),
            "speedup": round(t_bf / t_i8, 2),
            "bf16_tflops": round(flops / t_bf / 1e12, 1),
            "int8_tops": round(flops / t_i8 / 1e12, 1),
        })
        print(rows[-1], file=sys.stderr)

    print(json.dumps({"metric": "int8_probe", "backend": jax.default_backend(),
                      "rows": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
