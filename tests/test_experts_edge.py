"""DexiNed parity: our flax model with converted weights vs the reference
torch model (imported from /root/reference as a golden oracle; skipped when
the reference checkout is unavailable)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from prismer_tpu.convert.experts import convert_dexined
from prismer_tpu.experts.edge.model import DexiNed, conv_transpose_torch

REFERENCE = "/root/reference"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available")


def test_conv_transpose_matches_torch(rng):
    for k, stride, pad in [(2, 2, 0), (4, 2, 1), (8, 2, 3), (16, 2, 7)]:
        x = rng.standard_normal((2, 10, 12, 5)).astype(np.float32)
        ct = torch.nn.ConvTranspose2d(5, 3, k, stride=stride, padding=pad)
        with torch.no_grad():
            want = ct(torch.tensor(x).permute(0, 3, 1, 2))
        want = want.permute(0, 2, 3, 1).numpy()
        kernel = ct.weight.detach().numpy().transpose(2, 3, 1, 0)
        got = conv_transpose_torch(jnp.asarray(x), jnp.asarray(kernel),
                                   jnp.asarray(ct.bias.detach().numpy()),
                                   stride, pad)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


@needs_reference
def test_dexined_matches_reference(rng):
    sys.path.insert(0, REFERENCE)
    try:
        from experts.edge.model import DexiNed as TorchDexiNed
    finally:
        sys.path.remove(REFERENCE)

    torch.manual_seed(0)
    ref = TorchDexiNed().eval()
    # randomize BN stats for a stronger check
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.8, 1.2)

    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x).permute(0, 3, 1, 2))

    variables = convert_dexined(ref.state_dict())
    model = DexiNed()
    got = model.apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(x))

    assert len(got) == len(want) == 7
    for g, w in zip(got, want):
        w = w.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(g), w, atol=5e-3, rtol=1e-3)
