"""MSDeformAttn parity + gradient tests, replicating the reference's own
test strategy (ops/test.py: forward equality vs the torch grid_sample
reference impl + gradcheck over channel sizes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from prismer_tpu.experts.ops.deform_attn import ms_deform_attn


def torch_reference(value, shapes, locs, weights):
    """The reference's numerical spec (ms_deform_attn_func.py:52-72):
    per-level grid_sample(bilinear, zeros, align_corners=False) + weighted sum."""
    n, s, h, d = value.shape
    _, lq, _, nl, p, _ = locs.shape
    value = torch.tensor(value)
    locs = torch.tensor(locs)
    weights = torch.tensor(weights)
    splits = [hl * wl for hl, wl in shapes]
    value_list = value.split(splits, dim=1)
    grids = 2 * locs - 1
    sampled = []
    for lid, (hl, wl) in enumerate(shapes):
        v = value_list[lid].flatten(2).transpose(1, 2).reshape(n * h, d, hl, wl)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        sv = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                           align_corners=False)
        sampled.append(sv)
    w = weights.transpose(1, 2).reshape(n * h, 1, lq, nl * p)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * w).sum(-1)
    return out.view(n, h * d, lq).transpose(1, 2).contiguous().numpy()


def make_inputs(rng, n=2, h=4, d=8, lq=10, p=4,
                shapes=((6, 8), (3, 4))):
    s = sum(a * b for a, b in shapes)
    value = rng.standard_normal((n, s, h, d)).astype(np.float32)
    locs = rng.uniform(-0.1, 1.1,
                       (n, lq, h, len(shapes), p, 2)).astype(np.float32)
    w = rng.uniform(0, 1, (n, lq, h, len(shapes), p)).astype(np.float32)
    w = w / w.sum(axis=(-1, -2), keepdims=True)
    return value, list(shapes), locs, w


@pytest.mark.parametrize("d", [8, 16, 30])
def test_forward_matches_torch_grid_sample(rng, d):
    value, shapes, locs, w = make_inputs(rng, d=d)
    want = torch_reference(value, shapes, locs, w)
    got = ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(locs),
                         jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-4)


def test_forward_vs_double_reference(rng):
    """fp32 impl against a float64 torch reference: error stays at fp32
    rounding level (the reference runs this check in double, ops/test.py)."""
    value, shapes, locs, w = make_inputs(rng)
    want = torch_reference(value.astype(np.float64), shapes,
                           locs.astype(np.float64), w.astype(np.float64))
    got = ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(locs),
                         jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-6, rtol=1e-4)


def test_gradients_match_torch(rng):
    """Analog of ops/test.py gradcheck: grads vs the torch reference."""
    value, shapes, locs, w = make_inputs(rng, n=1, h=2, d=4, lq=5, p=2)

    vt = torch.tensor(value, requires_grad=True)
    lt = torch.tensor(locs, requires_grad=True)
    wt = torch.tensor(w, requires_grad=True)
    splits = [hl * wl for hl, wl in shapes]
    n, s, h, d = value.shape
    lq, p = locs.shape[1], locs.shape[4]
    grids = 2 * lt - 1
    sampled = []
    vl = vt.split(splits, dim=1)
    for lid, (hl, wl) in enumerate(shapes):
        v = vl[lid].flatten(2).transpose(1, 2).reshape(n * h, d, hl, wl)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        sampled.append(F.grid_sample(v, g, mode="bilinear",
                                     padding_mode="zeros",
                                     align_corners=False))
    wmat = wt.transpose(1, 2).reshape(n * h, 1, lq, len(shapes) * p)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * wmat).sum(-1)
    loss = (out ** 2).sum()
    loss.backward()

    def jloss(v, l, w_):
        o = ms_deform_attn(v, shapes, l, w_)
        return jnp.sum(o ** 2)

    gv, gl, gw = jax.grad(jloss, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gv), vt.grad.numpy(),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gl), lt.grad.numpy(),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), wt.grad.numpy(),
                               atol=1e-4, rtol=1e-3)
