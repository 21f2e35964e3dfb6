"""ResNeSt backbone (inference), flax/NHWC.

Re-implementation of the UniDet expert's ResNeSt-200 backbone
(experts/obj_detection/unidet/modeling/backbone/{resnest.py, splat.py}):
deep stem (3x 3x3 convs, width 64 -> 128), pre-stage avg-pool downsampling
(avd + avg_down, radix 2 split-attention 3x3 convs), stages [3, 24, 36, 3],
outputs res3/res4/res5. SyncBN becomes plain (running-stat) BatchNorm at
inference.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def _bn(name):
    return nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                        dtype=jnp.float32, name=name)


def avg_pool_torch(x, kernel, stride, padding, count_include_pad=False,
                   ceil_mode=False):
    """torch AvgPool2d semantics (count_include_pad=False -> divisor is the
    number of in-bounds elements)."""
    ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
    pad = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    xs = jnp.pad(x, pad)
    os = jnp.pad(ones, pad)
    dims = (1, kernel, kernel, 1)
    strides = (1, stride, stride, 1)
    s = jax.lax.reduce_window(xs, 0.0, jax.lax.add, dims, strides, "VALID")
    c = jax.lax.reduce_window(os, 0.0, jax.lax.add, dims, strides, "VALID")
    if count_include_pad:
        return s / (kernel * kernel)
    return s / jnp.maximum(c, 1.0)


class SplAtConv(nn.Module):
    """Split-attention conv (splat.py:29-92), radix 2, cardinality 1."""

    channels: int
    radix: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        r, c = self.radix, self.channels
        inter = max(x.shape[-1] * r // 4, 32)
        h = nn.Conv(c * r, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=r, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        h = nn.relu(_bn("bn0")(h).astype(self.dtype))

        b = h.shape[0]
        splits = jnp.split(h, r, axis=-1)
        gap = sum(splits)
        gap = jnp.mean(gap, axis=(1, 2), keepdims=True)
        gap = nn.Conv(inter, (1, 1), dtype=self.dtype, name="fc1")(gap)
        gap = nn.relu(_bn("bn1")(gap).astype(self.dtype))
        atten = nn.Conv(c * r, (1, 1), dtype=self.dtype, name="fc2")(gap)
        atten = jax.nn.softmax(atten.reshape(b, 1, 1, r, c).astype(jnp.float32),
                               axis=3).astype(h.dtype)
        out = sum(atten[..., i, :] * splits[i] for i in range(r))
        return out


class Bottleneck(nn.Module):
    """resnest.py:122-275 with avd + avg_down (radix 2)."""

    bottleneck_channels: int
    out_channels: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        avd = self.stride > 1
        h = nn.Conv(self.bottleneck_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        h = nn.relu(_bn("bn1")(h).astype(self.dtype))
        h = SplAtConv(self.bottleneck_channels, dtype=self.dtype,
                      name="conv2")(h)
        if avd:
            h = avg_pool_torch(h, 3, self.stride, 1)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(h)
        h = _bn("bn3")(h).astype(self.dtype)

        if in_ch != self.out_channels:
            s = x
            if self.stride > 1:
                s = avg_pool_torch(s, self.stride, self.stride, 0,
                                   ceil_mode=True)
            s = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, name="shortcut_conv")(s)
            s = _bn("shortcut_bn")(s).astype(self.dtype)
        else:
            s = x
        return nn.relu(h + s)


# ResNeSt-200 (resnest.py:658-665)
RESNEST200_BLOCKS = (3, 24, 36, 3)


class ResNeSt(nn.Module):
    """Deep-stem ResNeSt; returns {'res3', 'res4', 'res5'}."""

    blocks: Tuple[int, ...] = RESNEST200_BLOCKS
    stem_width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jax.Array]:
        d = self.dtype
        for i, (ch, stride) in enumerate(((self.stem_width, 2),
                                          (self.stem_width, 1),
                                          (self.stem_width * 2, 1))):
            x = nn.Conv(ch, (3, 3), strides=(stride, stride),
                        padding=((1, 1), (1, 1)), use_bias=False, dtype=d,
                        name=f"stem_conv{i + 1}")(x.astype(d))
            x = nn.relu(_bn(f"stem_bn{i + 1}")(x).astype(d))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        outs = {}
        out_ch, mid = 256, 64
        for s, n in enumerate(self.blocks):
            for b in range(n):
                x = Bottleneck(mid, out_ch,
                               stride=2 if (b == 0 and s > 0) else 1,
                               dtype=d, name=f"res{s + 2}_block{b}")(x)
            if s >= 1:
                outs[f"res{s + 2}"] = x
            out_ch *= 2
            mid *= 2
        return outs
