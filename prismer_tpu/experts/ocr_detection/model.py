"""CharNet OCR expert (inference), flax/NHWC — device compute path.

Re-implementation of the reference OCR expert (experts/ocr_detection/
charnet/modeling/{model.py, backbone/hourglass.py}): an Hourglass-88
backbone (two stacked depth-3 hourglass blocks over a stride-4 stem) with
three heads — word detector (fg 2ch / tblr 4ch*10 / orientation 1ch), char
detector (fg / tblr), char recognizer (68-way classifier) — all at stride 4.

Host-side oriented-text decoding (rotated boxes, polygon NMS, word-char
assembly, lexicon correction) lives in postprocess.py; the reference's
pyclipper/shapely geometry is replaced by a pure-numpy convex-polygon
clipper.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

NUM_CHAR_CLASSES = 68  # charnet/config/defaults.py:28


def _bn(name):
    return nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                        dtype=jnp.float32, name=name)


class ConvBnRelu(nn.Module):
    out: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.dilation * (self.kernel // 2)
        x = nn.Conv(self.out, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)),
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        return nn.relu(_bn("bn")(x).astype(self.dtype))


class Residual(nn.Module):
    """hourglass.py Residual: two 3x3 conv-bn (+relu between), 3x3 skip when
    shape changes."""

    out: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = nn.Conv(self.out, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        h = nn.relu(_bn("bn1")(h).astype(self.dtype))
        h = nn.Conv(self.out, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = _bn("bn2")(h).astype(self.dtype)
        if self.stride != 1 or in_ch != self.out:
            s = nn.Conv(self.out, (3, 3), strides=(self.stride, self.stride),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype, name="skip_conv")(x)
            s = _bn("skip_bn")(s).astype(self.dtype)
        else:
            s = x
        return nn.relu(h + s)


class ResLayer(nn.Module):
    out: int
    num_blocks: int
    revr: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        if self.revr:  # _make_layer_revr: keep-dims blocks then transition
            for i in range(self.num_blocks - 1):
                x = Residual(in_ch, dtype=self.dtype, name=f"res_{i}")(x)
            x = Residual(self.out, dtype=self.dtype,
                         name=f"res_{self.num_blocks - 1}")(x)
        else:          # _make_layer: transition first
            x = Residual(self.out, dtype=self.dtype, name="res_0")(x)
            for i in range(1, self.num_blocks):
                x = Residual(self.out, dtype=self.dtype, name=f"res_{i}")(x)
        return x


class HourGlassBlock(nn.Module):
    n: int
    channels: Tuple[int, ...]
    blocks: Tuple[int, ...]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from prismer_tpu.ops.resize import bilinear_resize_align_corners
        up1 = ResLayer(self.channels[0], self.blocks[0], dtype=self.dtype,
                       name="up_1")(x)
        low = nn.max_pool(x, (2, 2), strides=(2, 2))
        low = ResLayer(self.channels[1], self.blocks[0], dtype=self.dtype,
                       name="low_1")(low)
        if self.n <= 1:
            low = ResLayer(self.channels[1], self.blocks[1],
                           dtype=self.dtype, name="low_2")(low)
        else:
            low = HourGlassBlock(self.n - 1, self.channels[1:],
                                 self.blocks[1:], dtype=self.dtype,
                                 name="low_2")(low)
        low = ResLayer(self.channels[0], self.blocks[0], revr=True,
                       dtype=self.dtype, name="low_3")(low)
        low = bilinear_resize_align_corners(low, low.shape[1] * 2,
                                            low.shape[2] * 2)
        return low + up1


class Hourglass88(nn.Module):
    """HourGlassNet(3, [256,256,256,512], [2,2,2,2]) (hourglass.py:96-103)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        h = nn.Conv(128, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=d, name="pre_conv")(x.astype(d))
        h = nn.relu(_bn("pre_bn")(h).astype(d))
        h = Residual(256, stride=2, dtype=d, name="pre_res")(h)
        for i in range(2):
            h = HourGlassBlock(3, (256, 256, 256, 512), (2, 2, 2, 2),
                               dtype=d, name=f"hg_{i}")(h)
        return h


class DetHead(nn.Module):
    """Word/char detector heads (model.py:42-93)."""

    with_orient: bool
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        feat = ConvBnRelu(128, dilation=self.dilation, dtype=d,
                          name="det_conv_final")(x)
        fg_feat = ConvBnRelu(128, dilation=self.dilation, dtype=d,
                             name="fg_feat")(feat)
        fg = nn.Conv(2, (1, 1), dtype=d, name="fg_pred")(fg_feat)
        reg_feat = ConvBnRelu(128, dilation=self.dilation, dtype=d,
                              name="reg_feat")(feat)
        tblr = nn.relu(nn.Conv(4, (1, 1), dtype=d,
                               name="tblr_pred")(reg_feat)) * 10.0
        orient = (nn.Conv(1, (1, 1), dtype=d, name="orient_pred")(reg_feat)
                  if self.with_orient else None)
        return fg, tblr, orient


class CharNet(nn.Module):
    """Device forward: returns softmaxed maps (NHWC, stride 4):
    {'word_fg': (B,h,w,2), 'word_tblr': (B,h,w,4), 'word_orient': (B,h,w,1),
     'char_fg', 'char_tblr', 'char_cls': (B,h,w,68)}."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jax.Array]:
        d = self.dtype
        feat = Hourglass88(dtype=d, name="backbone")(x)
        w_fg, w_tblr, w_or = DetHead(with_orient=True, dtype=d,
                                     name="word_detector")(feat)
        c_fg, c_tblr, _ = DetHead(with_orient=False, dtype=d,
                                  name="char_detector")(feat)
        h = feat
        for i in range(3):
            h = ConvBnRelu(128, dtype=d, name=f"recog_{i}")(h)
        c_cls = nn.Conv(NUM_CHAR_CLASSES, (1, 1), dtype=d,
                        name="recog_cls")(h)
        return {
            "word_fg": jax.nn.softmax(w_fg.astype(jnp.float32), axis=-1),
            "word_tblr": w_tblr.astype(jnp.float32),
            "word_orient": w_or.astype(jnp.float32),
            "char_fg": jax.nn.softmax(c_fg.astype(jnp.float32), axis=-1),
            "char_tblr": c_tblr.astype(jnp.float32),
            "char_cls": jax.nn.softmax(c_cls.astype(jnp.float32), axis=-1),
        }
