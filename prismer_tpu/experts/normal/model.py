"""NNET surface-normal expert (inference), flax/NHWC.

Re-implementation of the reference normal expert (experts/normal/models/*):
a tf_efficientnet_b5_ap encoder (gen-efficientnet; TF 'SAME' padding, BN
eps 1e-3, swish, squeeze-excite) feeding an uncertainty-aware hierarchical
decoder (submodules/decoder.py) that refines normals at 1/8 -> 1/4 -> 1/2 ->
1/1 resolution. Inference ('test' mode) path only — the train-time
uncertainty-guided point sampling (submodules.py:sample_points) is a
training detail of the expert, which is always frozen here.

Decoder skips are the encoder feature taps the reference indexes as
features[4,5,6,8,11] (decoder.py:63): EfficientNet stage outputs 0 (24ch,
/2), 1 (40ch, /4), 2 (64ch, /8), 4 (176ch, /16) and the raw conv_head
output (2048ch, /32 — before its BN/activation, a quirk of the reference's
module-walk feature hook, baseline.py:49-56).

Output: (B, H, W, 4) — L2-normalized normal xyz + kappa (elu+1.01)
(submodules.py:norm_normalize).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# EfficientNet-B5 stage configs: (repeats, kernel, stride, expand, out_ch)
B5_STAGES = (
    (3, 3, 1, 1, 24),
    (5, 3, 2, 6, 40),
    (5, 5, 2, 6, 64),
    (7, 3, 2, 6, 128),
    (7, 5, 1, 6, 176),
    (9, 5, 2, 6, 304),
    (3, 3, 1, 6, 512),
)
STEM_CH = 48
HEAD_CH = 2048


def swish(x):
    return x * jax.nn.sigmoid(x)


def _bn(name):
    # tf_ variants: eps 1e-3 (gen-efficientnet BN_EPS_TF_DEFAULT)
    return nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-3,
                        dtype=jnp.float32, name=name)


class SqueezeExcite(nn.Module):
    reduced: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), dtype=self.dtype,
                    name="conv_reduce")(s)
        s = swish(s)
        s = nn.Conv(ch, (1, 1), dtype=self.dtype, name="conv_expand")(s)
        return x * jax.nn.sigmoid(s)


class DepthwiseConv(nn.Module):
    kernel: int
    stride: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        return nn.Conv(ch, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride), padding="SAME",
                       feature_group_count=ch, use_bias=False,
                       dtype=self.dtype, name="conv")(x)


class DSConvBlock(nn.Module):
    """Stage-0 depthwise-separable block (no expansion)."""

    out_ch: int
    kernel: int
    stride: int
    se_reduced: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        h = DepthwiseConv(self.kernel, self.stride, dtype=self.dtype,
                          name="conv_dw")(x)
        h = swish(_bn("bn1")(h).astype(self.dtype))
        h = SqueezeExcite(self.se_reduced, dtype=self.dtype, name="se")(h)
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_pw")(h)
        h = _bn("bn2")(h).astype(self.dtype)
        if self.stride == 1 and shortcut.shape[-1] == self.out_ch:
            h = h + shortcut
        return h


class MBConvBlock(nn.Module):
    """Inverted residual (expand -> depthwise -> SE -> project)."""

    out_ch: int
    kernel: int
    stride: int
    expand: int
    se_reduced: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        shortcut = x
        h = nn.Conv(in_ch * self.expand, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv_pw")(x)
        h = swish(_bn("bn1")(h).astype(self.dtype))
        h = DepthwiseConv(self.kernel, self.stride, dtype=self.dtype,
                          name="conv_dw")(h)
        h = swish(_bn("bn2")(h).astype(self.dtype))
        h = SqueezeExcite(self.se_reduced, dtype=self.dtype, name="se")(h)
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_pwl")(h)
        h = _bn("bn3")(h).astype(self.dtype)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + shortcut
        return h


class EfficientNetB5(nn.Module):
    """Returns the decoder's 5 feature taps (see module docstring)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        d = self.dtype
        h = nn.Conv(STEM_CH, (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=d, name="conv_stem")(x.astype(d))
        h = swish(_bn("bn1")(h).astype(d))

        stage_outs = []
        in_ch = STEM_CH
        for s, (reps, k, stride, e, out_ch) in enumerate(B5_STAGES):
            for r in range(reps):
                se_red = max(1, int(in_ch * 0.25))
                name = f"blocks_{s}_{r}"
                if e == 1:
                    h = DSConvBlock(out_ch, k, stride if r == 0 else 1,
                                    se_red, dtype=d, name=name)(h)
                else:
                    h = MBConvBlock(out_ch, k, stride if r == 0 else 1, e,
                                    se_red, dtype=d, name=name)(h)
                in_ch = out_ch
            stage_outs.append(h)

        head = nn.Conv(HEAD_CH, (1, 1), use_bias=False, dtype=d,
                       name="conv_head")(h)
        # taps: stages 0,1,2,4 + raw conv_head (pre-BN, baseline.py:49-56)
        return [stage_outs[0], stage_outs[1], stage_outs[2], stage_outs[4],
                head]


class UpSampleBN(nn.Module):
    """bilinear(ac=True) up to skip size, concat, 2x (conv3-BN-lrelu)
    (submodules.py:10-24)."""

    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        from prismer_tpu.ops.resize import bilinear_resize_align_corners
        x = bilinear_resize_align_corners(x, skip.shape[1], skip.shape[2])
        h = jnp.concatenate([x, skip], axis=-1)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv1")(h)
        h = nn.leaky_relu(_bn("bn1")(h).astype(self.dtype), 0.01)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(h)
        h = nn.leaky_relu(_bn("bn2")(h).astype(self.dtype), 0.01)
        return h


def norm_normalize(x):
    """L2-normalize xyz, kappa = elu + 1.01 (submodules.py:104-110)."""
    xyz, kappa = x[..., :3], x[..., 3:]
    norm = jnp.sqrt(jnp.sum(xyz * xyz, axis=-1, keepdims=True)) + 1e-10
    kappa = jax.nn.elu(kappa) + 1.0 + 0.01
    return jnp.concatenate([xyz / norm, kappa], axis=-1)


class PointMLP(nn.Module):
    """The 1x1-conv refinement stacks (decoder.py:36-56), as Dense layers."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(3):
            x = nn.Dense(128, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.relu(x)
        return nn.Dense(4, dtype=self.dtype, name="fc3")(x)


class NNET(nn.Module):
    """Full normal expert; input ImageNet-normalized NHWC; output list of
    (B, h, w, 4) predictions [res8, res4, res2, res1] (decoder.py:58-200,
    test mode)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        from prismer_tpu.ops.resize import bilinear_resize_align_corners as up
        d = self.dtype
        f0, f1, f2, f4, head = EfficientNetB5(dtype=d, name="encoder")(x)

        x_d0 = nn.Conv(2048, (1, 1), dtype=d, name="conv2")(head)
        x_d1 = UpSampleBN(1024, dtype=d, name="up1")(x_d0, f4)
        x_d2 = UpSampleBN(512, dtype=d, name="up2")(x_d1, f2)
        x_d3 = UpSampleBN(256, dtype=d, name="up3")(x_d2, f1)
        x_d4 = UpSampleBN(128, dtype=d, name="up4")(x_d3, f0)

        out_res8 = nn.Conv(4, (3, 3), padding=((1, 1), (1, 1)), dtype=d,
                           name="out_conv_res8")(x_d2)
        out_res8 = norm_normalize(out_res8)

        def refine(feat, prev, name):
            fm = up(feat, feat.shape[1] * 2, feat.shape[2] * 2)
            init = up(prev, prev.shape[1] * 2, prev.shape[2] * 2)
            h = jnp.concatenate([fm, init], axis=-1)
            h = PointMLP(dtype=d, name=name)(h)
            return norm_normalize(h)

        out_res4 = refine(x_d2, out_res8, "out_conv_res4")
        out_res2 = refine(x_d3, out_res4, "out_conv_res2")
        out_res1 = refine(x_d4, out_res2, "out_conv_res1")
        return [out_res8, out_res4, out_res2, out_res1]
