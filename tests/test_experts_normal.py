"""NNET normal-expert tests: component torch-fixture parity + full shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from prismer_tpu.experts.normal.model import (NNET, MBConvBlock, UpSampleBN,
                                              norm_normalize)


def test_norm_normalize_matches_reference_formula(rng):
    x = rng.standard_normal((2, 5, 5, 4)).astype(np.float32)
    got = np.asarray(norm_normalize(jnp.asarray(x)))
    t = torch.tensor(x).permute(0, 3, 1, 2)
    nx, ny, nz, kappa = torch.split(t, 1, dim=1)
    norm = torch.sqrt(nx ** 2 + ny ** 2 + nz ** 2) + 1e-10
    kappa = F.elu(kappa) + 1.0 + 0.01
    want = torch.cat([nx / norm, ny / norm, nz / norm, kappa], dim=1)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


class TorchMBConv(nn.Module):
    """gen-efficientnet InvertedResidual semantics (eval, TF-SAME via same
    spatial config used in the test: stride 1 keeps sizes equal)."""

    def __init__(self, cin, cout, k, e, se_red):
        super().__init__()
        mid = cin * e
        self.conv_pw = nn.Conv2d(cin, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid, eps=1e-3)
        self.conv_dw = nn.Conv2d(mid, mid, k, padding=k // 2, groups=mid,
                                 bias=False)
        self.bn2 = nn.BatchNorm2d(mid, eps=1e-3)
        self.se_reduce = nn.Conv2d(mid, se_red, 1)
        self.se_expand = nn.Conv2d(se_red, mid, 1)
        self.conv_pwl = nn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout, eps=1e-3)
        self.cin, self.cout = cin, cout

    def forward(self, x):
        sc = x
        h = F.silu(self.bn1(self.conv_pw(x)))
        h = F.silu(self.bn2(self.conv_dw(h)))
        s = h.mean((2, 3), keepdim=True)
        s = self.se_expand(F.silu(self.se_reduce(s)))
        h = h * torch.sigmoid(s)
        h = self.bn3(self.conv_pwl(h))
        if self.cin == self.cout:
            h = h + sc
        return h


def test_mbconv_matches_torch_fixture(rng):
    torch.manual_seed(0)
    tb = TorchMBConv(16, 16, 3, 6, 4).eval()
    for m in tb.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.7, 1.3)
    x = rng.standard_normal((2, 8, 8, 16)).astype(np.float32)
    with torch.no_grad():
        want = tb(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)

    def cv(m):
        out = {"kernel": m.weight.detach().numpy().transpose(2, 3, 1, 0)}
        if m.bias is not None:
            out["bias"] = m.bias.detach().numpy()
        return out

    def dw(m):
        # torch depthwise (out, 1, kh, kw) -> flax grouped (kh, kw, 1, out)
        return {"kernel": m.weight.detach().numpy().transpose(2, 3, 1, 0)}

    def bn(m):
        return ({"scale": m.weight.detach().numpy(),
                 "bias": m.bias.detach().numpy()},
                {"mean": m.running_mean.numpy(), "var": m.running_var.numpy()})

    bn1p, bn1s = bn(tb.bn1)
    bn2p, bn2s = bn(tb.bn2)
    bn3p, bn3s = bn(tb.bn3)
    variables = {
        "params": {"conv_pw": cv(tb.conv_pw), "conv_pwl": cv(tb.conv_pwl),
                   "conv_dw": {"conv": dw(tb.conv_dw)},
                   "se": {"conv_reduce": cv(tb.se_reduce),
                          "conv_expand": cv(tb.se_expand)},
                   "bn1": bn1p, "bn2": bn2p, "bn3": bn3p},
        "batch_stats": {"bn1": bn1s, "bn2": bn2s, "bn3": bn3s},
    }
    mod = MBConvBlock(out_ch=16, kernel=3, stride=1, expand=6, se_reduced=4)
    got = mod.apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=3e-5)


def test_nnet_full_shapes(rng):
    model = NNET()
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    outs = model.apply(variables, x)
    assert [o.shape for o in outs] == [
        (1, 8, 8, 4), (1, 16, 16, 4), (1, 32, 32, 4), (1, 64, 64, 4)]
    for o in outs:
        norms = np.linalg.norm(np.asarray(o)[..., :3], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)
        assert float(jnp.min(o[..., 3])) > 0  # kappa positive
