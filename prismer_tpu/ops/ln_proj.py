"""Pallas TPU fused LayerNorm -> projection(s) (and the whole ViT Adaptor).

STATUS: REJECTED for production (round-5 e2e A/B, ab_ln_proj.log,
same-session b24): off 232.9 img/s vs on 211.4 img/s (-9.2%), pipeline
compile 94.5 s vs 2246.7 s. The kernels are individually correct (on-chip
parity rel < 6e-3, tools/check_ln_proj_tpu.py) and the isolated LN traffic
argument below is real, but replacing the encoder's LN fusions with 36
pallas custom calls breaks XLA's fusion graph around them — the round-3
lesson ("when a pallas experiment loses end-to-end, suspect fusion
breakage, not call cost") repeated at full scale. PRISMER_LN_PROJ stays
default-OFF; the code and CPU-interpret parity tests are kept as the
documented negative result. Do not re-attempt without first solving the
surrounding-fusion problem (e.g. fusing the whole block, not the LN).

The motivating analysis (kept for the record): the encoder's pre-LN blocks
spend ~20 ms of a ~50 ms b24 encode in LayerNorm
fusions (`convert_reduce_fusion`, 47 instances, tools/trace_breakdown.py):
XLA keeps each LN a separate HBM round trip running at ~250 GB/s, and a
standalone Pallas LN was measured NO-WIN in round 2 (ops/layer_norm.py — it
moves the same traffic). The lever that changes the traffic itself is fusing
the LN into its CONSUMER: read the raw activations once, compute the fp32
statistics in VMEM, normalize, and feed the MXU directly —

  * ln_proj:       [q, k, v] = LN(x) @ W_i + b_i   (one x read, three writes)
  * ln_proj + act: h = quick_gelu(LN(x) @ W_fc + b) (the MLP's first half)
  * adaptor_fused: x + W_up @ sq_relu(W_down @ LN(x))  — the reference
    Adaptor (utils.py:53-64) as ONE kernel: two 768x768 matmuls, the
    nonlinearity, and the residual add never leave VMEM.

The normalized activations, the adaptor bottleneck, and the LN statistics
never touch HBM; weights are whole-array VMEM-resident (<= 4.5 MB each at
BASE width). Numerics mirror the XLA module path: LN statistics in fp32
(two-pass, the parity-pinned definition in layers.fp32_layer_norm), the
normalized value cast to the compute dtype BEFORE the matmul (same rounding
point as the separate-op path), matmul accumulation fp32, bias add in the
compute dtype (flax Dense semantics).

Backward (custom_vjp): jax.vjp of the identical pure-XLA composition —
recompute-in-backward, exactly the remat the training path already uses;
gradients are correct by construction vs the module path.

Reference anchors: model/modules/vit.py:55-75 (pre-LN CLIP block with the
Adaptor between halves), model/modules/utils.py:14-19 (fp32 LN), 53-64
(Adaptor: bottleneck ratio 1, squared-relu).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _default_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _ln_f32(x32: jax.Array, scale: jax.Array, bias: jax.Array,
            eps: float) -> jax.Array:
    """Two-pass fp32 LN on an already-fp32 (R, D) block — the exact
    parity-pinned definition (layers.fp32_layer_norm)."""
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + eps) * scale + bias


_ACTS: dict = {}


def _get_act(name: Optional[str]) -> Optional[Callable]:
    if name is None:
        return None
    if not _ACTS:
        from prismer_tpu.models.layers import ACTIVATIONS
        _ACTS.update(ACTIVATIONS)
    return _ACTS[name]


def _ln_proj_kernel(x_ref, s_ref, b_ref, *rest, n_out: int, eps: float,
                    act_name: Optional[str]):
    w_refs = rest[:n_out]
    pb_refs = rest[n_out:2 * n_out]
    o_refs = rest[2 * n_out:]
    x32 = x_ref[...].astype(jnp.float32)
    y = _ln_f32(x32, s_ref[...].astype(jnp.float32),
                b_ref[...].astype(jnp.float32), eps)
    yd = y.astype(o_refs[0].dtype)
    act = _get_act(act_name)
    for i in range(n_out):
        o = jnp.dot(yd, w_refs[i][...],
                    preferred_element_type=jnp.float32)
        o = o.astype(o_refs[i].dtype) + pb_refs[i][...]
        if act is not None:
            # Mosaic rejects f32-scalar x bf16-vector broadcasts inside the
            # activations (vector.broadcast element-type mismatch) — compute
            # the activation in f32 on the already-bf16-rounded value (same
            # inputs as the XLA path; the f32-vs-bf16 arithmetic difference
            # is below bf16 output resolution)
            o = act(o.astype(jnp.float32)).astype(o_refs[i].dtype)
        o_refs[i][...] = o


def _ln_proj_ref(x2d, scale, bias, ws, bs, act_name, eps):
    """Pure-XLA composition with identical math — the CPU path, the parity
    oracle, and the backward's recompute target."""
    from prismer_tpu.models.layers import fp32_layer_norm
    y = fp32_layer_norm(x2d, scale, bias, eps)
    act = _get_act(act_name)
    outs = []
    for w, b in zip(ws, bs):
        o = jnp.dot(y, w, preferred_element_type=jnp.float32).astype(x2d.dtype)
        o = o + b.astype(x2d.dtype)
        outs.append(act(o) if act is not None else o)
    return tuple(outs)


def _ln_proj_call(x2d, scale, bias, ws, bs, act_name, eps, block_r,
                  interpret):
    r, d = x2d.shape
    n_out = len(ws)
    grid = (pl.cdiv(r, block_r),)
    out = pl.pallas_call(
        functools.partial(_ln_proj_kernel, n_out=n_out, eps=eps,
                          act_name=act_name),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_r, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(w.shape, lambda i: (0, 0),
                          memory_space=pltpu.VMEM) for w in ws]
          + [pl.BlockSpec((1, w.shape[1]), lambda i: (0, 0),
                          memory_space=pltpu.VMEM) for w in ws],
        out_specs=[pl.BlockSpec((block_r, w.shape[1]), lambda i: (i, 0),
                                memory_space=pltpu.VMEM) for w in ws],
        out_shape=[jax.ShapeDtypeStruct((r, w.shape[1]), x2d.dtype)
                   for w in ws],
        cost_estimate=pl.CostEstimate(
            flops=sum(2 * r * d * w.shape[1] for w in ws) + 8 * r * d,
            bytes_accessed=(x2d.size + sum(w.size for w in ws)
                            + sum(r * w.shape[1] for w in ws))
            * x2d.dtype.itemsize,
            transcendentals=r * (d if act_name else 0),
        ),
        interpret=interpret,
    )(x2d, scale[None, :], bias[None, :], *ws, *[b[None, :] for b in bs])
    return tuple(out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _ln_proj(x2d, scale, bias, ws, bs, act_name, eps, block_r, interpret):
    if interpret is None:
        if _default_interpret():
            # production CPU path: the interpreter is slower than plain XLA
            # for zero benefit; kernel-parity tests force interpret=True
            return _ln_proj_ref(x2d, scale, bias, ws, bs, act_name, eps)
        interpret = False
    return _ln_proj_call(x2d, scale, bias, ws, bs, act_name, eps, block_r,
                         interpret)


def _ln_proj_fwd(x2d, scale, bias, ws, bs, act_name, eps, block_r,
                 interpret):
    out = _ln_proj(x2d, scale, bias, ws, bs, act_name, eps, block_r,
                   interpret)
    return out, (x2d, scale, bias, ws, bs)


def _ln_proj_bwd(act_name, eps, block_r, interpret, res, g):
    x2d, scale, bias, ws, bs = res
    # recompute-in-backward via the identical XLA composition (remat)
    _, vjp = jax.vjp(
        lambda x, s, b, w, bb: _ln_proj_ref(x, s, b, w, bb, act_name, eps),
        x2d, scale, bias, ws, bs)
    return vjp(g)


_ln_proj.defvjp(_ln_proj_fwd, _ln_proj_bwd)


def ln_proj(x: jax.Array, scale: jax.Array, bias: jax.Array,
            weights: Sequence[jax.Array], biases: Sequence[jax.Array],
            activation: Optional[str] = None, eps: float = 1e-5,
            block_r: int = 512,
            interpret: Optional[bool] = None) -> Tuple[jax.Array, ...]:
    """act(LN(x) @ W_i + b_i) for every (W_i, b_i), reading x once.

    x: (..., D); weights: (D, F_i); biases: (F_i,). Leading dims are
    flattened for the kernel and restored on the outputs. activation is an
    ACTIVATIONS name applied to every output (None = linear)."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    x2d = x.reshape(-1, d)
    outs = _ln_proj(x2d, scale, bias, tuple(weights), tuple(biases),
                    activation, eps, block_r, interpret)
    return tuple(o.reshape(*lead, o.shape[-1]) for o in outs)


# ---------------------------------------------------------------------------
# Whole-Adaptor kernel: x + up(sq_relu(down(LN(x))))
# ---------------------------------------------------------------------------


def _adaptor_kernel(x_ref, s_ref, b_ref, wd_ref, bd_ref, wu_ref, bu_ref,
                    o_ref, *, eps: float):
    x = x_ref[...]
    x32 = x.astype(jnp.float32)
    y = _ln_f32(x32, s_ref[...].astype(jnp.float32),
                b_ref[...].astype(jnp.float32), eps)
    yd = y.astype(x.dtype)
    h = jnp.dot(yd, wd_ref[...], preferred_element_type=jnp.float32)
    h = h.astype(x.dtype) + bd_ref[...]
    r = jnp.maximum(h, jnp.zeros((), x.dtype))
    h = r * r
    u = jnp.dot(h, wu_ref[...], preferred_element_type=jnp.float32)
    u = u.astype(x.dtype) + bu_ref[...]
    o_ref[...] = x + u


def _adaptor_ref(x2d, scale, bias, wd, bd, wu, bu, eps):
    from prismer_tpu.models.layers import fp32_layer_norm, squared_relu
    y = fp32_layer_norm(x2d, scale, bias, eps)
    h = jnp.dot(y, wd, preferred_element_type=jnp.float32).astype(x2d.dtype)
    h = squared_relu(h + bd.astype(x2d.dtype))
    u = jnp.dot(h, wu, preferred_element_type=jnp.float32).astype(x2d.dtype)
    return x2d + (u + bu.astype(x2d.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _adaptor(x2d, scale, bias, wd, bd, wu, bu, eps, block_r, interpret):
    if interpret is None:
        if _default_interpret():
            return _adaptor_ref(x2d, scale, bias, wd, bd, wu, bu, eps)
        interpret = False
    r, d = x2d.shape
    return pl.pallas_call(
        functools.partial(_adaptor_kernel, eps=eps),
        grid=(pl.cdiv(r, block_r),),
        in_specs=[
            pl.BlockSpec((block_r, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wd.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wd.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wu.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wu.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_r, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, d), x2d.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * d * (wd.shape[1] + wd.shape[1]) + 10 * r * d,
            bytes_accessed=(2 * x2d.size + wd.size + wu.size)
            * x2d.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2d, scale[None, :], bias[None, :], wd, bd[None, :], wu, bu[None, :])


def _adaptor_fwd(x2d, scale, bias, wd, bd, wu, bu, eps, block_r, interpret):
    out = _adaptor(x2d, scale, bias, wd, bd, wu, bu, eps, block_r, interpret)
    return out, (x2d, scale, bias, wd, bd, wu, bu)


def _adaptor_bwd(eps, block_r, interpret, res, g):
    x2d, scale, bias, wd, bd, wu, bu = res
    _, vjp = jax.vjp(
        lambda x, s, b, a, c, d2, e: _adaptor_ref(x, s, b, a, c, d2, e, eps),
        x2d, scale, bias, wd, bd, wu, bu)
    return vjp(g)


_adaptor.defvjp(_adaptor_fwd, _adaptor_bwd)


def adaptor_fused(x: jax.Array, scale: jax.Array, bias: jax.Array,
                  w_down: jax.Array, b_down: jax.Array,
                  w_up: jax.Array, b_up: jax.Array, eps: float = 1e-5,
                  block_r: int = 512,
                  interpret: Optional[bool] = None) -> jax.Array:
    """The full norm-early Adaptor, x + up(sq_relu(down(LN(x)))), as one
    kernel — LN stats, the bottleneck activations, and the residual add
    never leave VMEM (reference utils.py:53-64, norm_late=False flavour)."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    out = _adaptor(x.reshape(-1, d), scale, bias, w_down, b_down, w_up,
                   b_up, eps, block_r, interpret)
    return out.reshape(*lead, d)
