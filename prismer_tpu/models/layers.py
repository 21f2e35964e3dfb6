"""Shared neural-net building blocks.

TPU-native counterparts of the reference's shared utils
(reference: model/modules/utils.py):

  * LayerNorm pinned to fp32 compute regardless of activation dtype
    (utils.py:14-19) — a numerical-stability island inside bf16 flows.
  * QuickGELU (utils.py:23-25) and SquaredReLU (utils.py:28-30).
  * Bicubic positional-embedding interpolation (utils.py:34-44). The torch
    reference uses F.interpolate(mode='bicubic', align_corners=False), whose
    cubic kernel constant is a=-0.75; jax.image.resize uses a=-0.5, so we
    build the exact separable interpolation matrices ourselves (static shapes
    -> two small matmuls, MXU-friendly, bit-matching the torch operator).
  * Adaptor: dim-preserving down/up projection with SquaredReLU and a pre- or
    post-LayerNorm (utils.py:48-65).

All modules are flax.linen, batch-first, with params kept in fp32 and compute
in `dtype` (bf16 by default at the model level).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


def quick_gelu(x: jax.Array) -> jax.Array:
    """x * sigmoid(1.702 x) — CLIP's GELU approximation (utils.py:23-25)."""
    return x * jax.nn.sigmoid(1.702 * x)


def squared_relu(x: jax.Array) -> jax.Array:
    """relu(x)^2 (utils.py:28-30)."""
    r = jax.nn.relu(x)
    return r * r


def gelu_exact(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU — matches HF transformers' default 'gelu'."""
    return jax.nn.gelu(x, approximate=False)


ACTIVATIONS: dict[str, Callable[[jax.Array], jax.Array]] = {
    "gelu": gelu_exact,
    "quick_gelu": quick_gelu,
    "squared_relu": squared_relu,
    "relu": jax.nn.relu,
}


def _ln_one_pass() -> bool:
    """One-pass LN stats (E[x^2]-E[x]^2) vs the two-pass definition.

    The two-pass form needs x AFTER the mean is known, which on TPU makes XLA
    materialize an fp32 copy of the bf16 activations (the 0.42 ms/instance
    `convert_reduce_fusion`s in the b24 encode trace — ~20 ms/encode). The
    one-pass form lets both moments come from fused bf16->f32 reduce reads and
    the normalize re-read bf16, so no f32 copy ever hits HBM. Numerics: fp32
    cancellation costs ~5e-3 absolute on y when |mean|~100 (worst observed
    CLIP activations; measured, tests/test_layers.py) — below the bf16 output
    quantization (~8e-3). Flag: PRISMER_LN_ONEPASS=0/1 (default: on for TPU,
    off on CPU — keeps CPU oracle-parity tests on the exact definition)."""
    import os
    env = os.environ.get("PRISMER_LN_ONEPASS")
    if env is not None:
        return env == "1"
    return jax.default_backend() != "cpu"


def fp32_layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
                    eps: float = 1e-5) -> jax.Array:
    """LayerNorm computed in fp32, result cast back to x.dtype (utils.py:14-19).

    A fused Pallas LayerNorm exists (ops/layer_norm.py) and was measured
    end-to-end at b32: NO win (233.8 vs 231.5 ms/iter full pipeline) — the
    trace showed 27 ms of LN fusions, but those overlap with other device
    work, so replacing them with pallas_calls (which serialize at the
    custom-call boundary) buys nothing. Kept as a documented experiment;
    the XLA formulations below stay the production path (see _ln_one_pass
    for the TPU-default stats formulation)."""
    orig_dtype = x.dtype
    if _ln_one_pass():
        # both reductions read the (possibly bf16) input directly with the
        # convert fused into the reduce; no fp32 copy of x is materialized
        mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
        msq = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        var = jnp.maximum(msq - jnp.square(mean), 0.0)
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(orig_dtype)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(orig_dtype)


class LayerNorm(nn.Module):
    """fp32-pinned LayerNorm with learnable scale/bias."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        return fp32_layer_norm(x, scale, bias, self.eps)


@functools.lru_cache(maxsize=64)
def _bicubic_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) 1-D bicubic interpolation matrix.

    Matches torch.nn.functional.interpolate(mode='bicubic',
    align_corners=False): cubic convolution kernel with a=-0.75 and
    edge-clamped sampling. Precomputed on host (shapes are static)."""
    a = -0.75

    def kernel(t: np.ndarray) -> np.ndarray:
        t = np.abs(t)
        out = np.where(
            t <= 1.0,
            (a + 2.0) * t**3 - (a + 3.0) * t**2 + 1.0,
            np.where(t < 2.0, a * t**3 - 5.0 * a * t**2 + 8.0 * a * t - 4.0 * a, 0.0),
        )
        return out

    scale = in_size / out_size
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        base = int(np.floor(src))
        frac = src - base
        for k in range(-1, 3):
            w = kernel(k - frac)
            idx = min(max(base + k, 0), in_size - 1)
            mat[i, idx] += w
    return mat.astype(np.float32)


def interpolate_pos_embed(pos_embed: jax.Array, target_len: int) -> jax.Array:
    """Resize a square (L, D) positional-embedding grid to `target_len` tokens.

    Reference semantics (model/modules/utils.py:34-44): reshape (L, D) to the
    (S, S, D) grid, bicubic-resample to (S', S', D), flatten. No-op when sizes
    match. Implemented as two static matmuls with the exact torch bicubic
    operator (see _bicubic_matrix)."""
    orig_size = int(round(pos_embed.shape[0] ** 0.5))
    new_size = int(round(target_len ** 0.5))
    if orig_size == new_size:
        return pos_embed
    d = pos_embed.shape[-1]
    grid = pos_embed.reshape(orig_size, orig_size, d)
    w = jnp.asarray(_bicubic_matrix(orig_size, new_size), dtype=jnp.float32)
    g32 = grid.astype(jnp.float32)
    # one-time, tiny matmuls: force full fp32 precision even on TPU
    out = jnp.einsum("oi,ijd->ojd", w, g32, precision="highest")
    out = jnp.einsum("oj,sjd->sod", w, out, precision="highest")
    return out.reshape(new_size * new_size, d).astype(pos_embed.dtype)


_LN_PROJ: Optional[bool] = None  # None = env (PRISMER_LN_PROJ)


def set_ln_proj(mode: Optional[bool]) -> None:
    """Force the fused LN->projection kernels on/off (None = env flag).
    Trace-time flag — must be set before the program is jitted."""
    global _LN_PROJ
    _LN_PROJ = mode


def use_ln_proj() -> bool:
    """REJECTED round 5: e2e A/B b24 measured 232.9 (off) vs 211.4 img/s
    (on), compile 94.5 s vs 2246.7 s (ab_ln_proj.log) — the kernels break
    XLA's surrounding fusions. Kept default-OFF as a documented negative
    result. Fused LN->consumer Pallas kernels (ops/ln_proj.py): the encoder's
    pre-LN statistics/normalize never round-trip HBM — LN fuses into the
    qkv projections, the MLP's first matmul (+activation), and the whole
    Adaptor. On CPU the wiring routes to an identical pure-XLA composition
    (ops/ln_proj._ln_proj_ref), so flag-on is safe everywhere. Default OFF
    until the on-chip same-session A/B adopts it."""
    if _LN_PROJ is not None:
        return _LN_PROJ
    import os
    return os.environ.get("PRISMER_LN_PROJ", "0") == "1"


class Mlp(nn.Module):
    """fc -> activation -> proj (CLIP block MLP / resampler MLP).

    pre_ln: optional (scale, bias) of a preceding fp32 LayerNorm. When given,
    the LN is applied INSIDE: on the fused path (use_ln_proj) LN + c_fc +
    activation run as one Pallas kernel (ops/ln_proj.py) and the normalized
    activations never hit HBM; otherwise fp32_layer_norm is applied first
    (identical math)."""

    hidden_dim: int
    out_dim: int
    activation: str = "quick_gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 pre_ln: Optional[tuple] = None) -> jax.Array:
        act = ACTIVATIONS[self.activation]
        fc = nn.Dense(self.hidden_dim, dtype=self.dtype, name="c_fc")
        fused = (pre_ln is not None and use_ln_proj()
                 and not self.is_initializing())
        if fused:
            from prismer_tpu.ops.ln_proj import ln_proj
            p = self.get_variable("params", "c_fc")
            (x,) = ln_proj(x, pre_ln[0], pre_ln[1],
                           [jnp.asarray(p["kernel"], self.dtype)],
                           [jnp.asarray(p["bias"], self.dtype)],
                           activation=self.activation)
        else:
            if pre_ln is not None:
                x = fp32_layer_norm(x, pre_ln[0], pre_ln[1])
            x = act(fc(x))
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="c_proj")(x)
        return x


class Adaptor(nn.Module):
    """Dim-preserving adaptor: up(sq_relu(down(x))) with residual + LayerNorm.

    norm_late=False (ViT flavour, utils.py:64): x + adaptor(LN(x))
    norm_late=True  (decoder flavour, utils.py:62): LN(adaptor(x) + x)

    The reference's 'bottleneck' ratio is 1 (no actual bottleneck,
    utils.py:53-55); we keep the same shape so checkpoints convert."""

    norm_late: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        ln = LayerNorm(name="adaptor_ln")

        if (not self.norm_late and use_ln_proj()
                and not self.is_initializing()):
            # whole adaptor as ONE Pallas kernel: LN stats, the bottleneck
            # activations, and the residual add never leave VMEM
            from prismer_tpu.ops.ln_proj import adaptor_fused
            pn = self.get_variable("params", "adaptor_ln")
            pd = self.get_variable("params", "down_proj")
            pu = self.get_variable("params", "up_proj")
            return adaptor_fused(
                x, pn["scale"], pn["bias"],
                jnp.asarray(pd["kernel"], self.dtype),
                jnp.asarray(pd["bias"], self.dtype),
                jnp.asarray(pu["kernel"], self.dtype),
                jnp.asarray(pu["bias"], self.dtype))

        def proj(h: jax.Array) -> jax.Array:
            h = nn.Dense(dim, dtype=self.dtype, name="down_proj")(h)
            h = squared_relu(h)
            h = nn.Dense(dim, dtype=self.dtype, name="up_proj")(h)
            return h

        if self.norm_late:
            return ln(proj(x) + x)
        return proj(ln(x)) + x


_ATTENTION_IMPL: Optional[str] = None  # None = auto; 'flash' | 'xla'


def set_attention_impl(impl: Optional[str]) -> None:
    """Force 'flash' (Pallas) or 'xla' attention; None = auto (flash on TPU,
    xla on CPU). Tests pin this to compare both paths."""
    global _ATTENTION_IMPL
    assert impl in (None, "flash", "xla")
    _ATTENTION_IMPL = impl


class xla_attention:
    """Context manager pinning the XLA attention path (e.g. during CPU-device
    param init, where the Pallas kernel can't compile)."""

    def __enter__(self):
        global _ATTENTION_IMPL
        self._prev = _ATTENTION_IMPL
        _ATTENTION_IMPL = "xla"

    def __exit__(self, *exc):
        global _ATTENTION_IMPL
        _ATTENTION_IMPL = self._prev


def use_flash_attention() -> bool:
    import os
    if _ATTENTION_IMPL is not None:
        return _ATTENTION_IMPL == "flash"
    env = os.environ.get("PRISMER_FLASH")
    if env is not None:
        return env == "1"
    return jax.default_backend() != "cpu"


def attention(q: jax.Array, k: jax.Array, v: jax.Array,
              key_mask: Optional[jax.Array] = None,
              causal: bool = False) -> jax.Array:
    """Structured-mask attention: Pallas flash kernel on TPU, fp32-softmax
    XLA fallback elsewhere. q,k,v: (B,H,L,D); key_mask: (B,Lk) 1=valid."""
    if use_flash_attention():
        from prismer_tpu.ops.flash_attention import flash_attention
        return flash_attention(q, k, v, key_mask, causal)
    bias = None
    if key_mask is not None:
        bias = padding_mask_bias(key_mask)
    if causal:
        lq, lk = q.shape[2], k.shape[2]
        cmask = jnp.tril(jnp.ones((lq, lk), jnp.float32), k=lk - lq)
        cbias = ((1.0 - cmask) * NEG_INF)[None, None]
        bias = cbias if bias is None else bias + cbias
    return dot_product_attention(q, k, v, bias)


def dot_product_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          mask_bias: Optional[jax.Array] = None) -> jax.Array:
    """Scaled dot-product attention with fp32 softmax accumulation.

    q: (B, H, Lq, Dh); k/v: (B, H, Lk, Dh); mask_bias: additive fp32 bias
    broadcastable to (B, H, Lq, Lk) (0 for keep, large-negative for drop).
    Softmax always runs in fp32 (parity with roberta.py:118-121 and the
    fp16-safe path of torch MultiheadAttention)."""
    dh = q.shape[-1]
    scale = 1.0 / np.sqrt(dh)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask_bias is not None:
        scores = scores + mask_bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    probs = probs.astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    b, h, l, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * dh)


def use_packed_qkv() -> bool:
    """Self-attention q/k/v as ONE (D, 3D) matmul (encoder lever): the param
    tree keeps the converter-compatible separate q/k/v kernels; the packed
    weight is a per-call concat.

    MEASURED AND NOT ADOPTED (2026-08-17, same-session A/B,
    tools/profile_pipeline.py --stages encode, Prismer-BASE b32 480px):
    106.5 ms/iter unpacked vs 112.5 ms packed — the weight concat breaks
    XLA's fusion/scheduling of the three projections and costs 5.6%.
    Kept behind the env flag as the documented experiment."""
    import os
    return os.environ.get("PRISMER_PACKED_QKV") == "1"


class MultiHeadAttention(nn.Module):
    """Generic MHA with separate q/k/v/out projections (all with bias).

    Equivalent math to torch nn.MultiheadAttention (vit.py:41,
    resampler.py:18); the torch packed in_proj is split into q/k/v by the
    checkpoint converter. Supports a distinct key/value source for
    cross-attention. Batch-first: (B, L, D)."""

    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, kv: Optional[jax.Array] = None,
                 mask_bias: Optional[jax.Array] = None,
                 pre_ln: Optional[tuple] = None) -> jax.Array:
        dim = x.shape[-1]
        self_attn = kv is None
        kv = x if kv is None else kv
        dq = nn.Dense(dim, dtype=self.dtype, name="q_proj")
        dk = nn.Dense(dim, dtype=self.dtype, name="k_proj")
        dv = nn.Dense(dim, dtype=self.dtype, name="v_proj")
        fused_ln = (pre_ln is not None and self_attn and use_ln_proj()
                    and not self.is_initializing())
        if pre_ln is not None:
            assert self_attn, "pre_ln fusion is a self-attention feature"
            if not fused_ln:
                x = fp32_layer_norm(x, pre_ln[0], pre_ln[1])
                kv = x
        if fused_ln:
            # LN + the three projections in one Pallas kernel: x is read
            # once, the normalized activations never hit HBM
            from prismer_tpu.ops.ln_proj import ln_proj
            ps = [self.get_variable("params", nm)
                  for nm in ("q_proj", "k_proj", "v_proj")]
            q, k, v = ln_proj(
                x, pre_ln[0], pre_ln[1],
                [jnp.asarray(p["kernel"], self.dtype) for p in ps],
                [jnp.asarray(p["bias"], self.dtype) for p in ps])
        elif self_attn and use_packed_qkv() and not self.is_initializing():
            names = ("q_proj", "k_proj", "v_proj")
            ps = [self.get_variable("params", nm) for nm in names]
            w = jnp.concatenate(
                [jnp.asarray(p["kernel"], self.dtype) for p in ps], axis=1)
            b = jnp.concatenate(
                [jnp.asarray(p["bias"], self.dtype) for p in ps])
            qkv = jnp.dot(x, w) + b
            q, k, v = (qkv[..., :dim], qkv[..., dim:2 * dim],
                       qkv[..., 2 * dim:])
        else:
            q, k, v = dq(x), dk(kv), dv(kv)
        if mask_bias is None and use_flash_attention():
            # packed (B, L, H*Dh) kernel: no head-split transposes, no
            # length padding — kills ~28 ms of copy/pad HBM traffic in the
            # b32 encode (ops/flash_attention.py packed_attention notes)
            from prismer_tpu.ops.flash_attention import packed_attention
            out = packed_attention(q, k, v, self.num_heads)
        else:
            q, k, v = (split_heads(t, self.num_heads) for t in (q, k, v))
            if mask_bias is None:
                out = attention(q, k, v)  # flash path on TPU
            else:
                out = dot_product_attention(q, k, v, mask_bias)
            out = merge_heads(out)
        return nn.Dense(dim, dtype=self.dtype, name="out_proj")(out)


NEG_INF = -1e9  # additive mask fill; large-negative, fp32-safe


def padding_mask_bias(attention_mask: jax.Array) -> jax.Array:
    """(B, Lk) {0,1} padding mask -> (B, 1, 1, Lk) additive fp32 bias."""
    bias = (1.0 - attention_mask.astype(jnp.float32)) * NEG_INF
    return bias[:, None, None, :]


