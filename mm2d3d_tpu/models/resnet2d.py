"""ResNet-34 encoder (NHWC, XLA convolutions) for the 2D branch.

Capability parity with the reference backbone
(``/root/reference/experiments_*/rgbd_rgbxyz_sigmoid_for_rgb/2d_net/backbones.py:13-65``):

- torchvision resnet34 trunk with conv1 replaced by a STRIDE-1 7x7 conv (no
  first downsample; pretrained RGB kernels can be imported via
  `models.torch_import`),
- returns 5 skip features at strides 1, 2, 4, 8, 16 with channels
  (64, 64, 128, 256, 512),
- dropout p=0.4 after layer3 and layer4,
- optional frozen batch-norm.

TPU-native: NHWC layout, bf16 compute / fp32 params & BN.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# Stem max pool backend: the Pallas strip kernel (ops/pallas/maxpool,
# self-gating — falls back to reduce_window off TPU / non-bf16) vs XLA
# reduce_window.  Trace-time flag; only the A/B tools flip it.
_STEM_POOL_PALLAS = True


class ConvBN(nn.Module):
    features: int
    kernel: int
    strides: int = 1
    compute_dtype: Any = jnp.bfloat16
    frozen_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.strides, self.strides),
            padding=self.kernel // 2,
            use_bias=False,
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        if self.frozen_bn:
            # FrozenBatchNorm2d: affine transform with fixed stats
            c = x.shape[-1]
            scale = self.param("bn_scale", nn.initializers.ones, (c,))
            bias = self.param("bn_bias", nn.initializers.zeros, (c,))
            mean = self.variable("batch_stats", "bn_mean", jnp.zeros, (c,))
            var = self.variable("batch_stats", "bn_var", jnp.ones, (c,))
            y = (x.astype(jnp.float32) - mean.value) * jax.lax.rsqrt(var.value + 1e-5)
            x = (y * scale + bias).astype(x.dtype)
        else:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=jnp.float32,
                name="bn",
            )(x)
        return x


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    compute_dtype: Any = jnp.bfloat16
    frozen_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        conv = partial(
            ConvBN,
            compute_dtype=self.compute_dtype,
            frozen_bn=self.frozen_bn,
        )
        identity = x
        y = conv(self.features, 3, self.strides, name="cb1")(x, train)
        y = nn.relu(y)
        y = conv(self.features, 3, 1, name="cb2")(y, train)
        if self.strides != 1 or x.shape[-1] != self.features:
            identity = conv(self.features, 1, self.strides, name="downsample")(x, train)
        return nn.relu(y + identity)


class ResNet34Encoder(nn.Module):
    """5-skip ResNet-34 with stride-1 stem (reference backbones.py:43-65).

    With ``skip_stem=True`` the module owns no stem parameters and expects
    its input to already be the stem's ConvBN output (64 channels,
    pre-ReLU) — used by Net2DSeg's fused dual-stem path.
    """

    num_channels: int = 3
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    compute_dtype: Any = jnp.bfloat16
    frozen_bn: bool = False
    dropout_rate: float = 0.4
    skip_stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        feats = []
        if not self.skip_stem:
            x = ConvBN(
                64, 7, strides=1, compute_dtype=self.compute_dtype,
                frozen_bn=self.frozen_bn, name="stem",
            )(x, train)
        x = nn.relu(x)
        feats.append(x)  # stride 1, 64ch

        # torch maxpool 3x3 s2 p1.  NB: a separable strided shift-max
        # looked 7x cheaper STANDALONE (2.2 -> 0.3 ms) but cost +4.6 ms
        # IN-GRAPH: the stride-2 slices along W defeat XLA's fusion/layout,
        # while reduce_window fuses fine.  In-graph timings are what count
        # (PERFORMANCE.md).  The Pallas strip kernel (ops/pallas/maxpool)
        # reads the stem output — which materializes in HBM anyway as the
        # stride-1 skip — once at full bandwidth; backward stays XLA's
        # select-and-scatter.  _STEM_POOL_PALLAS=False pins reduce_window
        # (A/B tools; read at trace time).
        if _STEM_POOL_PALLAS:
            from ..ops.pallas.maxpool import maxpool3x3s2

            x = maxpool3x3s2(x)
        else:
            x = nn.max_pool(
                x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
            )

        widths = (64, 128, 256, 512)
        for i, (blocks, width) in enumerate(zip(self.stage_sizes, widths)):
            for b in range(blocks):
                strides = 2 if (b == 0 and i > 0) else 1
                x = BasicBlock(
                    width,
                    strides,
                    compute_dtype=self.compute_dtype,
                    frozen_bn=self.frozen_bn,
                    name=f"layer{i + 1}_{b}",
                )(x, train)
            if i >= 2:  # dropout after layer3 and layer4
                x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
            feats.append(x)

        return feats  # strides 1,2,4,8,16; channels 64,64,128,256,512


class _Kernel(nn.Module):
    """Bare conv-kernel holder; param path mimics nn.Conv ("<name>/kernel")."""

    shape: Sequence[int]

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), tuple(self.shape)
        )


class StemParams(nn.Module):
    """Owns one encoder stem's parameters for the fused dual-stem path.

    Parameter tree matches ConvBN's stem exactly ("conv/kernel" + "bn"), so
    torchvision imports keep the same per-stem layout.  Call with no args to
    read the 7x7 kernel; call with the (already convolved) stem output to
    apply the stem's BatchNorm.
    """

    cin: int
    frozen_bn: bool = False

    @nn.compact
    def __call__(self, conv_out=None, train: bool = False):
        kernel = _Kernel((7, 7, self.cin, 64), name="conv")()
        if conv_out is None:
            return kernel
        x = conv_out
        if self.frozen_bn:
            c = x.shape[-1]
            scale = self.param("bn_scale", nn.initializers.ones, (c,))
            bias = self.param("bn_bias", nn.initializers.zeros, (c,))
            mean = self.variable("batch_stats", "bn_mean", jnp.zeros, (c,))
            var = self.variable("batch_stats", "bn_var", jnp.ones, (c,))
            y = (x.astype(jnp.float32) - mean.value) * jax.lax.rsqrt(
                var.value + 1e-5
            )
            return (y * scale + bias).astype(x.dtype)
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="bn",
        )(x)
