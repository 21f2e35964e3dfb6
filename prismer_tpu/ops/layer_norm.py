"""Pallas TPU fused LayerNorm (fp32 statistics, single HBM pass).

The model pins LayerNorm to fp32 compute regardless of activation dtype
(reference model/modules/utils.py:14-19). XLA's lowering of that contract
costs ~0.58 ms per LN on the encoder's (32*964, 768) activations — separate
convert / reduce / normalize fusions re-read the input several times
(measured via trace, tools/trace_breakdown.py: 27 ms of the b32 encode was
LayerNorm). This kernel reads each row-block once into VMEM, computes
mean/variance/normalize in fp32 on-chip, and writes the result once:
speed-of-light is read+write of the (bf16) activation, ~0.12 ms.

MEASURED AND NOT ADOPTED: end-to-end at b32 the full pipeline got slightly
SLOWER with this kernel dispatched for the encoder's LNs (233.8 vs 231.5
ms/iter) — the XLA LN fusions overlap with surrounding device work, while
pallas custom-calls serialize at the call boundary. Lesson recorded: trace
event durations are not additive wall time on this device. Kept (with
tests) as the documented experiment; layers.fp32_layer_norm stays on the
XLA formulation.

Numerics are identical to layers.fp32_layer_norm: cast to fp32, mean, var,
rsqrt(var + eps), scale/bias in fp32, cast back to the input dtype.

Differentiable via custom_vjp; the backward is the standard LN gradient in
plain XLA (training recomputes the statistics — the fwd saves only x, scale).

"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)          # (BR, D)
    mean = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def _ln_forward(x2d: jax.Array, scale: jax.Array, bias: jax.Array,
                eps: float, interpret: Optional[bool] = None) -> jax.Array:
    r, d = x2d.shape
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    block_r = 512
    # non-dividing row counts are handled by Pallas's implicit block masking
    # (out-of-range rows of the last block are never stored) — an explicit
    # jnp.pad would copy the whole activation and erase the kernel's win
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(pl.cdiv(r, block_r),),
        in_specs=[
            pl.BlockSpec((block_r, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_r, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, d), x2d.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * x2d.size, transcendentals=r,
            bytes_accessed=2 * x2d.size * x2d.dtype.itemsize),
        interpret=interpret,
    )(x2d, scale[None, :], bias[None, :])
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
                     eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis with fp32 statistics; x of any rank."""
    d = x.shape[-1]
    y = _ln_forward(x.reshape(-1, d), scale, bias, eps)
    return y.reshape(x.shape)


def _ln_fwd(x, scale, bias, eps):
    return fused_layer_norm(x, scale, bias, eps), (x, scale)


def _ln_bwd(eps, res, g):
    """Standard LayerNorm gradient, recomputed statistics, all fp32."""
    x, scale = res
    x32 = x.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = xc * inv
    d = x.shape[-1]
    gs = g32 * scale.astype(jnp.float32)
    dx = (gs - jnp.mean(gs, axis=-1, keepdims=True)
          - xhat * jnp.mean(gs * xhat, axis=-1, keepdims=True)) * inv
    reduce_dims = tuple(range(x.ndim - 1))
    dscale = jnp.sum(g32 * xhat, axis=reduce_dims)
    dbias = jnp.sum(g32, axis=reduce_dims)
    return (dx.astype(x.dtype), dscale.astype(scale.dtype),
            dbias.astype(scale.dtype))


fused_layer_norm.defvjp(_ln_fwd, _ln_bwd)
