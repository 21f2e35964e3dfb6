"""DPT-hybrid component parity (torch fixtures implementing the documented
semantics) + full-model shape/converter-structure tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from prismer_tpu.experts.depth.model import (DPTDepthModel, FeatureFusionBlock,
                                             PreActBottleneck, StdConv,
                                             resize_pos_embed_bilinear)


class TorchStdConv(nn.Conv2d):
    """timm StdConv2d semantics."""

    def forward(self, x):
        w = F.batch_norm(self.weight.reshape(1, self.out_channels, -1),
                         None, None, training=True, momentum=0.0,
                         eps=1e-6).reshape_as(self.weight)
        return F.conv2d(x, w, self.bias, self.stride, self.padding)


def test_std_conv_matches_timm_semantics(rng):
    torch.manual_seed(0)
    tc = TorchStdConv(8, 16, 3, stride=2, padding=1, bias=False)
    x = rng.standard_normal((2, 12, 12, 8)).astype(np.float32)
    with torch.no_grad():
        want = tc(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    mod = StdConv(16, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
    params = {"params": {"kernel": jnp.asarray(
        tc.weight.detach().numpy().transpose(2, 3, 1, 0))}}
    got = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


class TorchPreActBottleneck(nn.Module):
    def __init__(self, cin, mid, cout, stride, downsample):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, cin)
        self.conv1 = TorchStdConv(cin, mid, 1, bias=False)
        self.norm2 = nn.GroupNorm(32, mid)
        self.conv2 = TorchStdConv(mid, mid, 3, stride=stride, padding=1,
                                  bias=False)
        self.norm3 = nn.GroupNorm(32, mid)
        self.conv3 = TorchStdConv(mid, cout, 1, bias=False)
        self.down = (TorchStdConv(cin, cout, 1, stride=stride, bias=False)
                     if downsample else None)

    def forward(self, x):
        pre = F.relu(self.norm1(x))
        short = self.down(pre) if self.down is not None else x
        h = self.conv1(pre)
        h = self.conv2(F.relu(self.norm2(h)))
        h = self.conv3(F.relu(self.norm3(h)))
        return h + short


def test_preact_bottleneck_matches(rng):
    torch.manual_seed(1)
    tb = TorchPreActBottleneck(64, 32, 128, stride=2, downsample=True).eval()
    x = rng.standard_normal((1, 16, 16, 64)).astype(np.float32)
    with torch.no_grad():
        want = tb(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)

    def gn(m):
        return {"GroupNorm_0": {"scale": m.weight.detach().numpy(),
                                "bias": m.bias.detach().numpy()}}

    def cv(m):
        return {"kernel": m.weight.detach().numpy().transpose(2, 3, 1, 0)}

    params = {"params": {
        "norm1": gn(tb.norm1), "norm2": gn(tb.norm2), "norm3": gn(tb.norm3),
        "conv1": cv(tb.conv1), "conv2": cv(tb.conv2), "conv3": cv(tb.conv3),
        "downsample_conv": cv(tb.down),
    }}
    mod = PreActBottleneck(mid=32, out=128, stride=2, downsample=True)
    got = mod.apply(jax.tree.map(jnp.asarray, params), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=5e-5)


def test_pos_embed_resize_matches_torch(rng):
    pe = rng.standard_normal((24 * 24, 8)).astype(np.float32)
    t = torch.tensor(pe).reshape(1, 24, 24, 8).permute(0, 3, 1, 2)
    want = F.interpolate(t, size=(20, 30), mode="bilinear")
    want = want.permute(0, 2, 3, 1).reshape(20 * 30, 8).numpy()
    got = resize_pos_embed_bilinear(jnp.asarray(pe), 20, 30)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_fusion_block_semantics(rng):
    """Fusion: x (+ rcu1(skip)) -> rcu2 -> x2 bilinear(ac=True) -> 1x1."""
    x = rng.standard_normal((1, 8, 8, 16)).astype(np.float32)
    skip = rng.standard_normal((1, 8, 8, 16)).astype(np.float32)
    mod = FeatureFusionBlock()
    params = mod.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(skip))
    out = mod.apply(params, jnp.asarray(x), jnp.asarray(skip))
    assert out.shape == (1, 16, 16, 16)


def test_dpt_full_shape_and_converter_structure(rng):
    """Full DPT on a small input + synthetic-checkpoint conversion merge."""
    from prismer_tpu.convert.experts import convert_dpt
    model = DPTDepthModel()
    x = jnp.asarray(rng.standard_normal((1, 96, 96, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 96, 96)
    assert bool(jnp.all(out >= 0))

    # synthetic reference-layout state dict from our own param shapes
    sd = {}

    def fill_from(tree, maps):
        for tkey, shape in maps:
            sd[tkey] = torch.zeros(shape)

    # spot-check converter key coverage by building a checkpoint whose keys
    # convert into a subtree of our params
    import numpy as _np

    def torch_conv_shape(k):
        kh, kw, i, o = k.shape
        return (o, i, kh, kw)

    p = variables["params"]
    sd["pretrained.model.cls_token"] = torch.zeros(1, 1, 768)
    sd["pretrained.model.pos_embed"] = torch.zeros(1, 577, 768)
    sd["pretrained.model.patch_embed.backbone.stem.conv.weight"] = \
        torch.zeros(torch_conv_shape(p["backbone"]["stem_conv"]["kernel"]))
    sd["pretrained.model.patch_embed.backbone.stem.norm.weight"] = torch.zeros(64)
    sd["pretrained.model.patch_embed.backbone.stem.norm.bias"] = torch.zeros(64)
    for s, nb in enumerate((3, 4, 9)):
        for b in range(nb):
            q = f"pretrained.model.patch_embed.backbone.stages.{s}.blocks.{b}"
            blk = p["backbone"][f"stage_{s}"][f"block_{b}"]
            for nm in ("norm1", "norm2", "norm3"):
                n = blk[nm]["GroupNorm_0"]["scale"].shape[0]
                sd[f"{q}.{nm}.weight"] = torch.zeros(n)
                sd[f"{q}.{nm}.bias"] = torch.zeros(n)
            for nm in ("conv1", "conv2", "conv3"):
                sd[f"{q}.{nm}.weight"] = torch.zeros(
                    torch_conv_shape(blk[nm]["kernel"]))
            if "downsample_conv" in blk:
                sd[f"{q}.downsample.conv.weight"] = torch.zeros(
                    torch_conv_shape(blk["downsample_conv"]["kernel"]))
    sd["pretrained.model.patch_embed.proj.weight"] = torch.zeros(768, 1024, 1, 1)
    sd["pretrained.model.patch_embed.proj.bias"] = torch.zeros(768)
    for i in range(12):
        q = f"pretrained.model.blocks.{i}"
        sd[f"{q}.norm1.weight"] = torch.zeros(768)
        sd[f"{q}.norm1.bias"] = torch.zeros(768)
        sd[f"{q}.norm2.weight"] = torch.zeros(768)
        sd[f"{q}.norm2.bias"] = torch.zeros(768)
        sd[f"{q}.attn.qkv.weight"] = torch.zeros(2304, 768)
        sd[f"{q}.attn.qkv.bias"] = torch.zeros(2304)
        sd[f"{q}.attn.proj.weight"] = torch.zeros(768, 768)
        sd[f"{q}.attn.proj.bias"] = torch.zeros(768)
        sd[f"{q}.mlp.fc1.weight"] = torch.zeros(3072, 768)
        sd[f"{q}.mlp.fc1.bias"] = torch.zeros(3072)
        sd[f"{q}.mlp.fc2.weight"] = torch.zeros(768, 3072)
        sd[f"{q}.mlp.fc2.bias"] = torch.zeros(768)
    sd["pretrained.act_postprocess3.0.project.0.weight"] = torch.zeros(768, 1536)
    sd["pretrained.act_postprocess3.0.project.0.bias"] = torch.zeros(768)
    sd["pretrained.act_postprocess3.3.weight"] = torch.zeros(768, 768, 1, 1)
    sd["pretrained.act_postprocess3.3.bias"] = torch.zeros(768)
    sd["pretrained.act_postprocess4.0.project.0.weight"] = torch.zeros(768, 1536)
    sd["pretrained.act_postprocess4.0.project.0.bias"] = torch.zeros(768)
    sd["pretrained.act_postprocess4.3.weight"] = torch.zeros(768, 768, 1, 1)
    sd["pretrained.act_postprocess4.3.bias"] = torch.zeros(768)
    sd["pretrained.act_postprocess4.4.weight"] = torch.zeros(768, 768, 3, 3)
    sd["pretrained.act_postprocess4.4.bias"] = torch.zeros(768)
    for i, cin in zip(range(1, 5), (256, 512, 768, 768)):
        sd[f"scratch.layer{i}_rn.weight"] = torch.zeros(256, cin, 3, 3)
    for i in range(1, 5):
        q = f"scratch.refinenet{i}"
        for r in ("resConfUnit1", "resConfUnit2"):
            for c in ("conv1", "conv2"):
                sd[f"{q}.{r}.{c}.weight"] = torch.zeros(256, 256, 3, 3)
                sd[f"{q}.{r}.{c}.bias"] = torch.zeros(256)
        sd[f"{q}.out_conv.weight"] = torch.zeros(256, 256, 1, 1)
        sd[f"{q}.out_conv.bias"] = torch.zeros(256)
    sd["scratch.output_conv.0.weight"] = torch.zeros(128, 256, 3, 3)
    sd["scratch.output_conv.0.bias"] = torch.zeros(128)
    sd["scratch.output_conv.2.weight"] = torch.zeros(32, 128, 3, 3)
    sd["scratch.output_conv.2.bias"] = torch.zeros(32)
    sd["scratch.output_conv.4.weight"] = torch.zeros(1, 32, 1, 1)
    sd["scratch.output_conv.4.bias"] = torch.zeros(1)

    from prismer_tpu.convert.torch_to_jax import merge_params
    tree = convert_dpt(sd)
    merged = merge_params(variables["params"], tree["params"])
    assert merged["cls_token"].shape == (1, 1, 768)
