"""Parity + gradient tests for the fused Pallas LayerNorm
(ops/layer_norm.py) against the exact fp32 XLA formulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prismer_tpu.ops.layer_norm import _ln_forward, fused_layer_norm


def xla_ln(x, scale, bias, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


@pytest.mark.parametrize("rows,d,dtype", [
    (700, 768, jnp.float32),     # unaligned row count (pads to 1024)
    (1024, 768, jnp.bfloat16),   # aligned, bf16 traffic
    (37, 64, jnp.float32),       # tiny
])
def test_fused_ln_matches_xla(rows, d, dtype):
    key = jax.random.key(0)
    x = (jax.random.normal(key, (rows, d), jnp.float32) * 3 + 1).astype(dtype)
    scale = jax.random.normal(jax.random.fold_in(key, 1), (d,), jnp.float32)
    bias = jax.random.normal(jax.random.fold_in(key, 2), (d,), jnp.float32)
    got = _ln_forward(x, scale, bias, 1e-5, interpret=True)
    want = xla_ln(x, scale, bias)
    # bf16 output: fp32 reduction order differs between the kernel and XLA,
    # so the final cast can flip one bf16 ulp (~0.8% relative)
    tol = 1e-5 if dtype == jnp.float32 else 1e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=tol, atol=tol)


def test_fused_ln_3d_shape_and_grads():
    key = jax.random.key(3)
    x = jax.random.normal(key, (2, 50, 128), jnp.float32)
    scale = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (128,))
    bias = 0.1 * jax.random.normal(jax.random.fold_in(key, 2), (128,))

    def loss_fused(x, s, b):
        return jnp.sum(fused_layer_norm(x, s, b) ** 2)

    def loss_xla(x, s, b):
        return jnp.sum(xla_ln(x, s, b) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(x, scale, bias)
    for name, gf, gx in zip("x,scale,bias".split(","), g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   rtol=2e-4, atol=2e-4, err_msg=name)
