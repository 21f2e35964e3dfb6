"""DexiNed edge-detection expert (inference), flax/NHWC.

Re-implementation of the reference expert (experts/edge/model.py): a dense-
inception edge network producing 7 output scales; the generator uses the
final fused map (scale 7) after sigmoid + invert (experts/edge/images.py:
fuse_edge, experts/generate_edge.py:41-55).

Structure (model.py:161-265):
  block_1: DoubleConv(3->32->64, stride 2)
  block_2: DoubleConv(64->128, no final relu)
  dblocks 3-6: dense blocks of (conv3 pad2 -> BN -> relu -> conv3 pad0 -> BN)
  layers averaging with a skip (0.5 * (new + skip))
  side / pre_dense 1x1-conv+BN lateral connections, maxpool3x3/2 downsamps
  up_block_i: (1x1 conv, relu, torch-semantics ConvTranspose k=2^s stride 2
  pad all_pads[s]) chains back to full resolution; block_cat: 1x1 conv fusion

Torch ConvTranspose2d is reproduced exactly with input dilation + flipped-
kernel convolution (weights converted from (in,out,kh,kw)).
"""

from __future__ import annotations

from typing import Any, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

_UP_PADS = {1: 0, 2: 1, 3: 3, 4: 7}  # all_pads[up_scale] (model.py:97)


def conv_transpose_torch(x: jax.Array, kernel: jax.Array,
                         bias: Optional[jax.Array], stride: int,
                         padding: int) -> jax.Array:
    """torch.nn.ConvTranspose2d semantics on NHWC input.

    kernel layout: (kh, kw, out, in) — flipped/arranged by the converter from
    torch's (in, out, kh, kw). out = (in-1)*stride - 2*padding + k."""
    kh = kernel.shape[0]
    pad = kh - 1 - padding
    y = jax.lax.conv_general_dilated(
        x, jnp.flip(kernel, (0, 1)).transpose(0, 1, 3, 2),
        window_strides=(1, 1), padding=[(pad, pad), (pad, pad)],
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias
    return y


class ConvTranspose(nn.Module):
    features: int
    kernel: int
    stride: int
    padding: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel, self.kernel, self.features, in_ch),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return conv_transpose_torch(x.astype(self.dtype), k.astype(self.dtype),
                                    b.astype(self.dtype), self.stride,
                                    self.padding)


def _bn(name: str, dtype=jnp.float32) -> nn.BatchNorm:
    return nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                        dtype=jnp.float32, name=name)


class DoubleConvBlock(nn.Module):
    mid: int
    out: Optional[int] = None
    stride: int = 1
    use_act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = self.out if self.out is not None else self.mid
        x = nn.Conv(self.mid, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv1")(x)
        x = _bn("bn1")(x).astype(self.dtype)
        x = nn.relu(x)
        x = nn.Conv(out, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv2")(x)
        x = _bn("bn2")(x).astype(self.dtype)
        return nn.relu(x) if self.use_act else x


class SingleConvBlock(nn.Module):
    out: int
    stride: int = 1
    use_bn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out, (1, 1), strides=(self.stride, self.stride),
                    dtype=self.dtype, name="conv")(x)
        if self.use_bn:
            x = _bn("bn")(x).astype(self.dtype)
        return x


class DenseLayer(nn.Module):
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        """(model.py:53-73): new = BN(conv3_p0(relu(BN(conv3_p2(relu(x1))))));
        returns (0.5*(new+x2), x2)."""
        h = nn.relu(x1)
        h = nn.Conv(self.out, (3, 3), padding=((2, 2), (2, 2)),
                    dtype=self.dtype, name="conv1")(h)
        h = _bn("bn1")(h).astype(self.dtype)
        h = nn.relu(h)
        h = nn.Conv(self.out, (3, 3), padding="VALID", dtype=self.dtype,
                    name="conv2")(h)
        h = _bn("bn2")(h).astype(self.dtype)
        return 0.5 * (h + x2), x2


class DenseBlock(nn.Module):
    num_layers: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        for i in range(self.num_layers):
            x1, x2 = DenseLayer(self.out, dtype=self.dtype,
                                name=f"denselayer_{i}")(x1, x2)
        return x1


class UpConvBlock(nn.Module):
    up_scale: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = 2 ** self.up_scale
        pad = _UP_PADS[self.up_scale]
        for i in range(self.up_scale):
            out = 1 if i == self.up_scale - 1 else 16
            x = nn.Conv(out, (1, 1), dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.relu(x)
            x = ConvTranspose(out, k, 2, pad, dtype=self.dtype,
                              name=f"deconv_{i}")(x)
        return x


def _maxpool(x):
    """maxpool 3x3 stride 2 pad 1 (model.py:172)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class DexiNed(nn.Module):
    """Returns the 7 output maps (6 scales + fused), NHWC, logits."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        d = self.dtype
        block_1 = DoubleConvBlock(32, 64, stride=2, dtype=d, name="block_1")(x)
        block_1_side = SingleConvBlock(128, 2, dtype=d, name="side_1")(block_1)

        block_2 = DoubleConvBlock(128, use_act=False, dtype=d,
                                  name="block_2")(block_1)
        block_2_down = _maxpool(block_2)
        block_2_add = block_2_down + block_1_side
        block_2_side = SingleConvBlock(256, 2, dtype=d, name="side_2")(block_2_add)

        block_3_pre = SingleConvBlock(256, 1, dtype=d,
                                      name="pre_dense_3")(block_2_down)
        block_3 = DenseBlock(2, 256, dtype=d, name="dblock_3")(
            block_2_add, block_3_pre)
        block_3_down = _maxpool(block_3)
        block_3_add = block_3_down + block_2_side
        block_3_side = SingleConvBlock(512, 2, dtype=d, name="side_3")(block_3_add)

        block_2_resize_half = SingleConvBlock(256, 2, dtype=d,
                                              name="pre_dense_2")(block_2_down)
        block_4_pre = SingleConvBlock(512, 1, dtype=d, name="pre_dense_4")(
            block_3_down + block_2_resize_half)
        block_4 = DenseBlock(3, 512, dtype=d, name="dblock_4")(
            block_3_add, block_4_pre)
        block_4_down = _maxpool(block_4)
        block_4_add = block_4_down + block_3_side
        block_4_side = SingleConvBlock(512, 1, dtype=d, name="side_4")(block_4_add)

        block_5_pre = SingleConvBlock(512, 1, dtype=d,
                                      name="pre_dense_5")(block_4_down)
        block_5 = DenseBlock(3, 512, dtype=d, name="dblock_5")(
            block_4_add, block_5_pre)
        block_5_add = block_5 + block_4_side

        block_6_pre = SingleConvBlock(256, 1, dtype=d,
                                      name="pre_dense_6")(block_5)
        block_6 = DenseBlock(3, 256, dtype=d, name="dblock_6")(
            block_5_add, block_6_pre)

        outs = [
            UpConvBlock(1, dtype=d, name="up_block_1")(block_1),
            UpConvBlock(1, dtype=d, name="up_block_2")(block_2),
            UpConvBlock(2, dtype=d, name="up_block_3")(block_3),
            UpConvBlock(3, dtype=d, name="up_block_4")(block_4),
            UpConvBlock(4, dtype=d, name="up_block_5")(block_5),
            UpConvBlock(4, dtype=d, name="up_block_6")(block_6),
        ]
        cat = jnp.concatenate(outs, axis=-1)
        fused = SingleConvBlock(1, 1, use_bn=False, dtype=d,
                                name="block_cat")(cat)
        return outs + [fused]
