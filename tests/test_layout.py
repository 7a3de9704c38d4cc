"""The Pallas layout pin (ops/layout.py) must be differentiable: the training
loss differentiates through _split_heads, and pallas_call has no built-in
autodiff rule — without the custom VJP, *tracing* grad on TPU raises
"Linearization failed" (found the first time a train step ran on real TPU;
the CPU test mesh never hits the pin because it is a TPU-only path)."""

import jax
import jax.numpy as jnp


def test_force_standard_layout_grad_traces(monkeypatch):
    from rcvpose_tpu.ops import layout

    # pretend we are on TPU so the pallas path is taken; eval_shape only
    # traces (never lowers/executes), which is where the original bug lived
    monkeypatch.setattr(layout.jax, "default_backend", lambda: "tpu")

    def loss(x):
        return jnp.sum(layout.force_standard_layout(x) ** 2)

    g = jax.eval_shape(jax.grad(loss), jnp.zeros((2, 8, 4), jnp.float32))
    assert g.shape == (2, 8, 4)


def test_force_standard_layout_noop_off_tpu():
    from rcvpose_tpu.ops import layout

    x = jnp.ones((3, 5), jnp.float32)
    assert layout.force_standard_layout(x) is x
