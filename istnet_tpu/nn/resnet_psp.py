"""RGB encoder: dilated-variant ResNet-18 + PSP pyramid + upsampling decoder.

Rebuild of the reference encoder (``model/resnet.py`` + ``model/modules.py:10-81``)
producing a 128-channel feature map at full crop resolution (192x192).

Faithfulness notes (verified against the reference source, not its docstrings):

* The reference's ResNet passes ``dilation=2/4`` to ``_make_layer`` for
  layers 3/4 (``resnet.py:135-136``) but ``_make_layer`` ignores that argument
  — blocks are built with ``self.current_dilation``, which never changes
  because ``current_stride`` (max 8) never reaches ``output_stride`` (32)
  (``resnet.py:153-180``). The network actually computed is: stride-8,
  dilation-1 everywhere, layers 3/4 at stride 1 with 1x1-conv downsample
  branches. We reproduce that actual network.
* PSP pools the layer-4 output (512 ch, 24x24 for a 192 crop) to 1/2/3/6,
  1x1-convs each (no bias), upsamples back bilinear align_corners=False
  (``modules.py:27-34``), concats with the input (2560 ch) and bottlenecks to
  1024 + ReLU.
* Decoder: Dropout2d(0.3) -> 3x [x2 upsample align_corners=True, 3x3 conv, BN,
  PReLU] with Dropout2d(0.15) after the first two -> 1x1 conv to 128 + BN +
  PReLU (``modules.py:37-81``).

ImageNet-pretrained initialization: the reference downloads torchvision
weights (``resnet.py:205-214``); this environment has no egress, so the
backbone initializes randomly unless converted weights are supplied via
``istnet_tpu.cli.convert_torch_resnet``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from istnet_tpu.nn.precision import compute_dtype
from istnet_tpu.nn.layers import (
    BatchNorm,
    Dropout2d,
    PReLU,
    TorchConv,
    adaptive_avg_pool,
    resize_bilinear,
    resize_bilinear_align_corners,
)

Array = jax.Array


def _resnet_conv_init(key, shape, dtype=jnp.float32):
    """Reference resnet weight init: normal(0, sqrt(2/n)), n = kh*kw*out (resnet.py:145-148)."""
    kh, kw, _, out = shape
    std = float(np.sqrt(2.0 / (kh * kw * out)))
    return jax.random.normal(key, shape, dtype) * std


class _RConv(nn.Module):
    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: int = 0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=[(self.padding, self.padding)] * 2,
            use_bias=False,
            dtype=compute_dtype(),
            kernel_init=_resnet_conv_init,
        )(x)


class BasicBlock(nn.Module):
    """ResNet BasicBlock (resnet.py:37-66); dilation is 1 in the actual network."""

    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        residual = x
        out = _RConv(self.planes, (3, 3), (self.stride, self.stride), padding=1)(x)
        out = BatchNorm()(out, train)
        out = nn.relu(out)
        out = _RConv(self.planes, (3, 3), padding=1)(out)
        out = BatchNorm()(out, train)
        if self.downsample:
            residual = _RConv(self.planes, (1, 1), (self.stride, self.stride))(x)
            residual = BatchNorm()(residual, train)
        return nn.relu(out + residual)


class ResNet18Trunk(nn.Module):
    """Stride-8 ResNet-18 trunk returning the 512-ch layer-4 map (resnet.py:182-202)."""

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        x = _RConv(64, (7, 7), (2, 2), padding=3)(x)
        x = BatchNorm()(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        for planes, stride in ((64, 1), (128, 2), (256, 1), (512, 1)):
            needs_ds = stride != 1 or x.shape[-1] != planes
            x = BasicBlock(planes, stride, downsample=needs_ds)(x, train)
            x = BasicBlock(planes)(x, train)
        return x


class PSPModule(nn.Module):
    """Pyramid scene parsing pooling (modules.py:10-34)."""

    out_features: int = 1024
    sizes: tuple[int, ...] = (1, 2, 3, 6)

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        h, w = x.shape[1], x.shape[2]
        feats = x.shape[-1]
        priors = []
        for size in self.sizes:
            p = adaptive_avg_pool(x, size)
            p = TorchConv(feats, (1, 1), use_bias=False)(p)
            priors.append(resize_bilinear(p, h, w))
        priors.append(x)
        bottle = TorchConv(self.out_features, (1, 1))(jnp.concatenate(priors, axis=-1))
        return nn.relu(bottle)


class PSPUpsample(nn.Module):
    """x2 bilinear (align_corners=True) + 3x3 conv + BN + PReLU (modules.py:37-48)."""

    features: int

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        h, w = x.shape[1], x.shape[2]
        x = resize_bilinear_align_corners(x, 2 * h, 2 * w)
        x = TorchConv(self.features, (3, 3), padding=1)(x)
        x = BatchNorm()(x, train)
        return PReLU()(x)


class ModifiedResnet(nn.Module):
    """Full RGB encoder: (B, 192, 192, 3) -> (B, 192, 192, 128) (modules.py:51-81,234-241)."""

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        f = ResNet18Trunk()(x, train)
        p = PSPModule()(f, train)
        p = Dropout2d(0.3)(p, train)

        p = PSPUpsample(256)(p, train)
        p = Dropout2d(0.15)(p, train)
        p = PSPUpsample(64)(p, train)
        p = Dropout2d(0.15)(p, train)
        p = PSPUpsample(64)(p, train)

        p = TorchConv(128, (1, 1))(p)
        p = BatchNorm()(p, train)
        return PReLU()(p)
