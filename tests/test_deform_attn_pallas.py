"""Parity of the Pallas one-hot-matmul MSDeformAttn formulation against the
XLA-gather formulation (itself pinned to the torch grid_sample spec in
tests/test_deform_attn.py). Runs in Pallas interpret mode on the CPU mesh —
the same kernel code compiles with Mosaic on TPU (tools/bench_deform_attn.py
measures it there)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prismer_tpu.experts.ops import deform_attn_pallas as dap
from prismer_tpu.experts.ops.deform_attn import ms_deform_attn


def _inputs(rng, n=2, h=4, d=8, shapes=((12, 16), (6, 8), (3, 4)), lq=40,
            p=4):
    s = sum(hl * wl for hl, wl in shapes)
    value = rng.standard_normal((n, s, h, d)).astype(np.float32)
    # include out-of-bounds locations (zero-pad semantics) and corner cases
    loc = rng.uniform(-0.15, 1.15, (n, lq, h, len(shapes), p, 2)
                      ).astype(np.float32)
    attn = rng.uniform(0, 1, (n, lq, h, len(shapes), p)).astype(np.float32)
    attn /= attn.sum(axis=(-2, -1), keepdims=True)
    return jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn)


def test_onehot_matches_gather_formulation(rng):
    value, shapes, loc, attn = _inputs(rng)
    want = np.asarray(ms_deform_attn(value, shapes, loc, attn))
    got = np.asarray(dap.ms_deform_attn_onehot(
        value, shapes, loc, attn, q_tile=16, c_tile=128, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_onehot_real_tile_sizes_ragged_q(rng):
    """Lq not a multiple of q_tile; c tile larger than a level's HW."""
    value, shapes, loc, attn = _inputs(rng, n=1, lq=37)
    want = np.asarray(ms_deform_attn(value, shapes, loc, attn))
    got = np.asarray(dap.ms_deform_attn_onehot(
        value, shapes, loc, attn, q_tile=32, c_tile=256, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
