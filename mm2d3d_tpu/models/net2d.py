"""Dual-encoder 2D U-Net (RGB + sparse depth) with 2D->3D lifting.

Capability parity with the reference Net2DSeg
(``/root/reference/experiments_*/rgbd_rgbxyz_sigmoid_for_rgb/2d_net/model.py:35-180``):

- two ResNet-34 encoders: RGB (importable pretrained weights) and depth
  (1 channel, from scratch), both with stride-1 stems;
- decoder: 4 ConvTranspose up-stages; each stage concatenates
  [depth skip, upsampled, rgb skip] (3x channels) then 3x3 conv+BN+ReLU;
  final 3x3 conv (no BN/ReLU) to 64 channels ("segm_last");
- main head: 5x5 avg-pool (stride 1, count_include_pad) + 1x1 conv to
  per-class logits at full resolution, lifted to the LiDAR points;
- aux head (L2G_classifier_2D): its own avg-pool + 1x1 conv over segm_last,
  also lifted ("seg_logit_avg").

TPU-native: NHWC, static input padding to a multiple of 16, batched gather
lifting (`ops.lifting`) instead of per-sample Python loops.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.lifting import lift_image_features
from ..ops.pallas import head2d
from .resnet2d import ResNet34Encoder, StemParams

# Opt-in: fuse the composed head conv + crop + 5x5 pool into one Pallas
# kernel (ops/pallas/head2d.py).  2x faster STANDALONE (6.5 vs 12.4 ms at
# the flagship head size) but a clear LOSS in the fused forward (162 vs
# 199 scans/s) — its halo BlockSpecs force the three full-res 64-channel
# decoder-tail producers to materialize in HBM, which the XLA path avoids.
# Kept opt-in for narrower-producer configs; see PERFORMANCE.md.
# Configured per-module via Net2DSeg(pallas_head=...), defaulting from
# MM2D3D_PALLAS_HEAD at module CONSTRUCTION time.
import os as _os


def _shift_sum5(y: jax.Array, axis: int) -> jax.Array:
    n = y.shape[axis]
    pad = [(0, 0)] * y.ndim
    pad[axis] = (2, 2)
    yp = jnp.pad(y, pad)
    out = jax.lax.slice_in_dim(yp, 0, n, axis=axis)
    for d in range(1, 5):
        out = out + jax.lax.slice_in_dim(yp, d, d + n, axis=axis)
    return out


_POOL_BARRIERS = True


def _avg_pool_5x5(x: jax.Array) -> jax.Array:
    # torch AvgPool2d((5,5), stride 1, padding 2) with count_include_pad=True:
    # zero-pad then divide by the full window size.  Separable 5x1 + 1x5 as
    # explicit shift-adds — exactly equal (diff ~1e-6), and 3.2x faster than
    # XLA's reduce_window lowering on this chip (1.66 -> 0.52 ms per head at
    # the flagship size).
    #
    # The optimization barriers pin the producer and the first pool pass:
    # without them XLA fuses the producer (the full-width head conv) into
    # EVERY shifted-slice read — the 5x5 pool re-runs it up to 25x
    # (measured standalone: conv+pool+lift 15.6 ms fused vs 5.5 ms with
    # the barriers at the flagship head size).
    if _POOL_BARRIERS:
        x = jax.lax.optimization_barrier(x)
        x = jax.lax.optimization_barrier(_shift_sum5(x, 1))
        return _shift_sum5(x, 2) * (1.0 / 25.0)
    return _shift_sum5(_shift_sum5(x, 1), 2) * (1.0 / 25.0)


class _HeadConvParams(nn.Module):
    """1x1 conv params with nn.Conv's tree layout ("kernel" + "bias")."""

    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, self.cin, self.cout)
        )
        b = self.param("bias", nn.initializers.zeros, (self.cout,))
        return k, b


class _DecConvParams(nn.Module):
    """3x3 conv params with nn.Conv's tree layout (kernel + bias), so the
    fused head path below can read dec_conv_stage1's parameters without
    paying its full-width convolution."""

    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, self.cin, self.cout)
        )
        b = self.param("bias", nn.initializers.zeros, (self.cout,))
        return k, b


class UpStage(nn.Module):
    """ConvTranspose(k2,s2) + BN + ReLU (the reference's dec_t_conv_stage*)."""

    features: int
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.ConvTranspose(
            self.features,
            (2, 2),
            strides=(2, 2),
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            name="tconv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="bn",
        )(x)
        return nn.relu(x)


class FuseStage(nn.Module):
    """3x3 conv + BN + ReLU over [depth skip, up, rgb skip] concat."""

    features: int
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.features, (3, 3), padding=1,
            dtype=self.compute_dtype, param_dtype=jnp.float32, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="bn",
        )(x)
        return nn.relu(x)


class Net2DSeg(nn.Module):
    num_classes: int
    frozen_batch_norm: bool = False
    compute_dtype: Any = jnp.bfloat16
    # explicit, trace-safe opt-in for the fused Pallas head (the env var is
    # only the DEFAULT, read at module construction — toggling the env after
    # import works, unlike the old module-level constant)
    pallas_head: bool = None  # type: ignore[assignment]

    def __post_init__(self):
        if self.pallas_head is None:
            object.__setattr__(
                self, "pallas_head",
                _os.environ.get("MM2D3D_PALLAS_HEAD", "0") != "0",
            )
        super().__post_init__()

    @nn.compact
    def __call__(
        self,
        img: jax.Array,  # (B, H, W, 3) float
        depth: jax.Array,  # (B, H, W, 1) sparse depth map
        img_indices: jax.Array,  # (B, N, 2) int32
        point_mask: jax.Array,  # (B, N) bool
        train: bool = False,
        with_features: bool = True,
    ) -> Tuple[Dict[str, jax.Array], jax.Array, Dict[str, jax.Array]]:
        h, w = img.shape[1], img.shape[2]
        pad_h = (-h) % 16
        pad_w = (-w) % 16
        if pad_h or pad_w:
            pad = ((0, 0), (0, pad_h), (0, pad_w), (0, 0))
            img = jnp.pad(img, pad)
            depth = jnp.pad(depth, pad)

        # Fused dual stem: both 7x7 stride-1 stem convolutions run as ONE
        # block-diagonal conv over the 4-channel concat — exactly equivalent
        # (the cross blocks are zero) and ~2x faster, because Cin-starved
        # convs are latency-bound, not FLOP-bound, on the MXU.
        stem_rgb = StemParams(3, frozen_bn=self.frozen_batch_norm, name="stem_rgb")
        stem_depth = StemParams(1, name="stem_depth")
        k = jnp.zeros((7, 7, 4, 128), self.compute_dtype)
        k = k.at[:, :, :3, :64].set(stem_rgb().astype(self.compute_dtype))
        k = k.at[:, :, 3:, 64:].set(stem_depth().astype(self.compute_dtype))
        x4 = jnp.concatenate([img, depth], -1).astype(self.compute_dtype)
        stem_out = jax.lax.conv_general_dilated(
            x4, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        rgb_stem = stem_rgb(stem_out[..., :64], train)
        depth_stem = stem_depth(stem_out[..., 64:], train)

        rgb_feats = ResNet34Encoder(
            num_channels=3,
            compute_dtype=self.compute_dtype,
            frozen_bn=self.frozen_batch_norm,
            skip_stem=True,
            name="rgb_backbone",
        )(rgb_stem, train)
        depth_feats = ResNet34Encoder(
            num_channels=1,
            compute_dtype=self.compute_dtype,
            skip_stem=True,
            name="depth_backbone",
        )(depth_stem, train)

        # decoder (channels mirror the reference: 512*2 -> 256 -> ... -> 64)
        x = UpStage(256, self.compute_dtype, name="up5")(
            jnp.concatenate([depth_feats[4], rgb_feats[4]], -1), train
        )
        x = FuseStage(256, self.compute_dtype, name="fuse4")(
            jnp.concatenate([depth_feats[3], x, rgb_feats[3]], -1), train
        )
        x = UpStage(128, self.compute_dtype, name="up4")(x, train)
        x = FuseStage(128, self.compute_dtype, name="fuse3")(
            jnp.concatenate([depth_feats[2], x, rgb_feats[2]], -1), train
        )
        x = UpStage(64, self.compute_dtype, name="up3")(x, train)
        x = FuseStage(64, self.compute_dtype, name="fuse2")(
            jnp.concatenate([depth_feats[1], x, rgb_feats[1]], -1), train
        )
        x = UpStage(64, self.compute_dtype, name="up2")(x, train)
        x_cat = jnp.concatenate([depth_feats[0], x, rgb_feats[0]], -1)

        # Fused head path.  dec_conv_stage1 has no BN/activation and feeds
        # two LINEAR 1x1 heads (reference 2d_net/model.py:123-130,160-180),
        # so conv3x3(cat, Wd) @ Kh == conv3x3(cat, Wd @ Kh) exactly: compose
        # the weights and convolve straight to 2 * num_classes channels.
        # The composed form does ~5x fewer FLOPs, writes 64/12x less HBM at
        # full resolution, and (with with_features=False) drops the 64-wide
        # full-res conv from forward AND backward entirely.  Gradients flow
        # through the composition, so training is unchanged.
        nc = self.num_classes
        dec_k, dec_b = _DecConvParams(x_cat.shape[-1], 64, name="dec_conv_stage1")()
        k_main, b_main = _HeadConvParams(64, nc, name="head_conv")()
        k_aux, b_aux = _HeadConvParams(64, nc, name="aux_conv")()
        k_heads = jnp.concatenate([k_main[0, 0], k_aux[0, 0]], axis=-1)  # (64, 2nc)
        w12 = jnp.einsum("hwio,od->hwid", dec_k, k_heads)  # (3, 3, cat, 2nc)
        b12 = dec_b @ k_heads  # (2nc,)
        hp = img.shape[1]
        if self.pallas_head and head2d.supports(hp, img.shape[2], h, w, 2 * nc):
            # conv + crop + pool in one VMEM-resident Pallas kernel, fed the
            # three concat pieces directly (skips materializing x_cat too)
            y = head2d.head_pool(
                [depth_feats[0], x, rgb_feats[0]], w12, b12, h, w,
                self.compute_dtype,
            )
        else:
            y = jax.lax.conv_general_dilated(
                x_cat.astype(self.compute_dtype),
                w12.astype(self.compute_dtype),
                (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).astype(jnp.float32) + b12
            y = _avg_pool_5x5(y[:, :h, :w, :])  # crop padding, pool both

        if with_features:
            segm_last = (
                jax.lax.conv_general_dilated(
                    x_cat.astype(self.compute_dtype),
                    dec_k.astype(self.compute_dtype),
                    (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ).astype(jnp.float32) + dec_b
            )[:, :h, :w, :]
        else:
            segm_last = None

        # main head
        seg_logit_2d = y[..., :nc] + b_main
        seg_logit = lift_image_features(seg_logit_2d, img_indices, point_mask)

        # aux head (L2G_classifier_2D)
        seg_logit_avg_2d = y[..., nc:] + b_aux
        seg_logit_avg = lift_image_features(seg_logit_avg_2d, img_indices, point_mask)

        preds = {"seg_logit": seg_logit, "seg_logit_2d": seg_logit_2d}
        aux = {"seg_logit_avg": seg_logit_avg, "seg_logit_avg_2d": seg_logit_avg_2d}
        return preds, segm_last, aux
