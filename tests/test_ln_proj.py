"""Fused LN->projection kernels (ops/ln_proj.py) — parity vs the module path.

Kernel bodies run in Pallas interpret mode (interpret=True); the wiring tests
exercise the flag through VisionTransformer (on CPU the wiring routes to the
identical pure-XLA composition, so the comparison pins the get_variable
plumbing, shapes, and param-tree stability)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prismer_tpu.models import layers as L
from prismer_tpu.ops import ln_proj as lp


def _mk(key, r, d, fs, dtype):
    ks = jax.random.split(key, 3 + 2 * len(fs))
    x = jax.random.normal(ks[0], (r, d), jnp.float32).astype(dtype)
    scale = 1.0 + 0.1 * jax.random.normal(ks[1], (d,), jnp.float32)
    bias = 0.1 * jax.random.normal(ks[2], (d,), jnp.float32)
    ws = [jax.random.normal(ks[3 + 2 * i], (d, f), jnp.float32)
          .astype(dtype) / np.sqrt(d) for i, f in enumerate(fs)]
    bs = [0.1 * jax.random.normal(ks[4 + 2 * i], (f,), jnp.float32)
          .astype(dtype) for i, f in enumerate(fs)]
    return x, scale, bias, ws, bs


@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 2e-5),
                                        (jnp.bfloat16, 2e-2)])
@pytest.mark.parametrize("act", [None, "quick_gelu"])
def test_ln_proj_kernel_parity(dtype, atol, act):
    # R=600 does not divide the 256-row block (masked tail rows)
    x, scale, bias, ws, bs = _mk(jax.random.key(0), 600, 256,
                                 (256, 256, 512), dtype)
    got = lp.ln_proj(x, scale, bias, ws, bs, activation=act,
                     block_r=256, interpret=True)
    want = lp._ln_proj_ref(x, scale, bias, tuple(ws), tuple(bs), act, 1e-5)
    assert len(got) == 3
    for g, w in zip(got, want):
        assert g.dtype == dtype
        # bf16 needs rtol as well: the kernel evaluates the activation in
        # f32 (Mosaic rejects mixed-type broadcasts) on the bf16-rounded
        # matmul output, the XLA ref in bf16 — differences are one ulp of
        # whatever magnitude the activation emits
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(w, np.float32), atol=atol,
                                   rtol=2e-2 if dtype == jnp.bfloat16
                                   else 1e-6)


@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 2e-5),
                                        (jnp.bfloat16, 3e-2)])
def test_adaptor_kernel_parity(dtype, atol):
    x, scale, bias, ws, bs = _mk(jax.random.key(1), 600, 256, (256, 256),
                                 dtype)
    got = lp.adaptor_fused(x, scale, bias, ws[0], bs[0], ws[1], bs[1],
                           block_r=256, interpret=True)
    want = lp._adaptor_ref(x, scale, bias, ws[0], bs[0], ws[1], bs[1], 1e-5)
    assert got.dtype == dtype
    # rtol as well: squared-relu + up-proj push magnitudes to ~30, where
    # bf16 quantization alone is ~0.25 absolute
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=atol,
                               rtol=2e-2 if dtype == jnp.bfloat16 else 1e-6)


def test_ln_proj_leading_dims():
    x, scale, bias, ws, bs = _mk(jax.random.key(2), 60, 128, (128,),
                                 jnp.float32)
    x3 = x.reshape(4, 15, 128)
    (o3,) = lp.ln_proj(x3, scale, bias, ws, bs, interpret=True, block_r=32)
    (o2,) = lp.ln_proj(x, scale, bias, ws, bs, interpret=True, block_r=32)
    np.testing.assert_array_equal(np.asarray(o3.reshape(60, 128)),
                                  np.asarray(o2))


def test_ln_proj_grads_match_reference_composition():
    x, scale, bias, ws, bs = _mk(jax.random.key(3), 96, 128, (128, 256),
                                 jnp.float32)

    def via_kernel(x, s, b, ws, bs):
        outs = lp.ln_proj(x, s, b, ws, bs, activation="quick_gelu",
                          interpret=True, block_r=32)
        return sum(jnp.sum(o * o) for o in outs)

    def via_ref(x, s, b, ws, bs):
        outs = lp._ln_proj_ref(x, s, b, tuple(ws), tuple(bs),
                               "quick_gelu", 1e-5)
        return sum(jnp.sum(o * o) for o in outs)

    gk = jax.grad(via_kernel, argnums=(0, 1, 2, 3, 4))(x, scale, bias,
                                                       tuple(ws), tuple(bs))
    gr = jax.grad(via_ref, argnums=(0, 1, 2, 3, 4))(x, scale, bias,
                                                    tuple(ws), tuple(bs))
    for a, b_ in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_adaptor_grads_match_reference_composition():
    x, scale, bias, ws, bs = _mk(jax.random.key(4), 96, 128, (128, 128),
                                 jnp.float32)

    def via_kernel(x, s, b, wd, bd, wu, bu):
        o = lp.adaptor_fused(x, s, b, wd, bd, wu, bu, interpret=True,
                             block_r=32)
        return jnp.sum(o * o)

    def via_ref(x, s, b, wd, bd, wu, bu):
        return jnp.sum(jnp.square(
            lp._adaptor_ref(x, s, b, wd, bd, wu, bu, 1e-5)))

    args = (x, scale, bias, ws[0], bs[0], ws[1], bs[1])
    gk = jax.grad(via_kernel, argnums=tuple(range(7)))(*args)
    gr = jax.grad(via_ref, argnums=tuple(range(7)))(*args)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def _tiny_trunk_inputs():
    from prismer_tpu.config import VisionEncoderConfig
    cfg = VisionEncoderConfig(
        image_resolution=64, patch_size=16, width=128, layers=2, heads=4,
        experts=(("rgb", 3), ("depth", 1)), resampler_layers=1,
        resampler_heads=4, resampler_latents=8)
    inputs = {
        "rgb": jnp.ones((2, 64, 64, 3), jnp.float32) * 0.1,
        "depth": jnp.linspace(0, 1, 2 * 64 * 64).reshape(2, 64, 64, 1)
        .astype(jnp.float32),
    }
    return cfg, inputs


def test_vit_wiring_flag_on_matches_off():
    # on CPU the fused wiring routes to the identical XLA composition, so
    # outputs must match to numerical noise — this pins the get_variable
    # plumbing and that the param tree is unchanged by the flag
    from prismer_tpu.models.vit import VisionTransformer
    cfg, inputs = _tiny_trunk_inputs()
    model = VisionTransformer(cfg=cfg, dtype=jnp.float32)
    variables = model.init(jax.random.key(0), inputs)
    L.set_ln_proj(False)
    try:
        want = model.apply(variables, inputs)
        L.set_ln_proj(True)
        got = model.apply(variables, inputs)
    finally:
        L.set_ln_proj(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_vit_wiring_grads_flag_on_matches_off():
    from prismer_tpu.models.vit import VisionTransformer
    cfg, inputs = _tiny_trunk_inputs()
    model = VisionTransformer(cfg=cfg, dtype=jnp.float32)
    variables = model.init(jax.random.key(0), inputs)

    def loss(params, flag):
        L.set_ln_proj(flag)
        try:
            out = model.apply(dict(variables, params=params), inputs)
        finally:
            L.set_ln_proj(None)
        return jnp.sum(out * out)

    g_off = jax.grad(lambda p: loss(p, False))(variables["params"])
    g_on = jax.grad(lambda p: loss(p, True))(variables["params"])
    for a, b in zip(jax.tree.leaves(g_off), jax.tree.leaves(g_on)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)
