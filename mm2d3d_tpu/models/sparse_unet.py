"""SCN-style sparse 3D U-Net + Net3DSeg, as pure flax modules.

Capability parity with the reference 3D branch
(``/root/reference/experiments_*/rgbd_rgbxyz_sigmoid_for_rgb/3d_net/model.py:23-95``
and ``.../3d_net/scn_unet.py:8-126``):

- UNetSCN: InputLayer(mode=4 mean) -> SubmConv(in->m) -> recursive U-Net over
  planes [(n+1)*m for n in range(num_planes)] with VGG (BN+ReLU->SubmConv) or
  residual blocks, stride-2 down / stride-2 deconv up with channel-concat
  skips -> BN+ReLU -> OutputLayer.
- Net3DSeg: sigmoid gate over per-point RGB features (Linear(3->1)), gated
  feats fed to the U-Net; main Linear head + aux point head
  (L2G_classifier_3D); the gate is returned as per-point "confidence".

TPU-first differences: the irregular topology (voxel tables, neighbor maps)
is built once per step (`ops.hierarchy`) and passed in; the modules are pure
(no in-place gating of the input batch, cf. reference pitfall at
``3d_net/model.py:48``); compute in bf16, params/BN in fp32.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.hierarchy import Hierarchy
from ..ops.spconv import (
    down_conv2,
    masked_batch_norm_stats,
    subm_conv3,
    up_conv2,
)
from ..ops.voxelize import VoxelGrid, pool_features, unpool_features


def _conv_init(ntaps: int):
    # He-normal over the full receptive field (ntaps * cin), matching the
    # SparseConvNet convolution initialization scheme.
    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0] * shape[1] if len(shape) == 3 else shape[0]
        std = (2.0 / fan_in) ** 0.5
        return jax.random.normal(key, shape, dtype) * std

    return init


class MaskedBatchNorm(nn.Module):
    """BatchNorm over active (valid) rows only, with running stats.

    Equivalent of scn.BatchNormLeakyReLU/BatchNormReLU's normalization part
    (activation handled by callers). eps/momentum follow SCN defaults.
    """

    momentum: float = 0.9
    eps: float = 1e-4

    @nn.compact
    def __call__(self, x: jax.Array, valid: jax.Array, train: bool) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", jnp.zeros, (c,))
        ra_var = self.variable("batch_stats", "var", jnp.ones, (c,))

        if train:
            mean, var = masked_batch_norm_stats(x, valid)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(x.dtype)


class SubmConv(nn.Module):
    """Parameterized submanifold 3x3x3 conv (weights (27, cin, cout))."""

    cout: int
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, level):
        w = self.param("kernel", _conv_init(27), (27, x.shape[-1], self.cout))
        return subm_conv3(x, level, w, self.compute_dtype)


class DownConv(nn.Module):
    cout: int
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, trans):
        w = self.param("kernel", _conv_init(8), (8, x.shape[-1], self.cout))
        return down_conv2(x, trans, w, self.compute_dtype)


class UpConv(nn.Module):
    cout: int
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, trans):
        w = self.param("kernel", _conv_init(8), (8, x.shape[-1], self.cout))
        return up_conv2(x, trans, w, self.compute_dtype)


class VGGBlock(nn.Module):
    """Pre-activation block: BN -> ReLU -> SubmConv (SCN VGG style)."""

    cout: int
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, level, train):
        y = MaskedBatchNorm(name="bn")(x, level.valid, train)
        y = nn.relu(y)
        return SubmConv(self.cout, self.compute_dtype, name="conv")(y, level)


class ResidualBlock(nn.Module):
    """SCN residual block: shortcut + (BN-ReLU-Conv) x 2."""

    cout: int
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, level, train):
        cin = x.shape[-1]
        if cin == self.cout:
            shortcut = x
        else:
            w = self.param("nin_kernel", _conv_init(1), (cin, self.cout))
            shortcut = x @ w
        y = MaskedBatchNorm(name="bn1")(x, level.valid, train)
        y = nn.relu(y)
        y = SubmConv(self.cout, self.compute_dtype, name="conv1")(y, level)
        y = MaskedBatchNorm(name="bn2")(y, level.valid, train)
        y = nn.relu(y)
        y = SubmConv(self.cout, self.compute_dtype, name="conv2")(y, level)
        return shortcut + y


class SparseUNet(nn.Module):
    """Iterative re-expression of scn.UNet's recursion (scn_unet.py:55-84).

    encoder level l: reps blocks; then BN-ReLU + stride-2 conv to level l+1.
    decoder level l: BN-ReLU + deconv from level l+1, concat [enc_l, up],
    then reps blocks (first takes 2*planes[l] channels).
    """

    planes: Sequence[int]
    reps: int = 1
    residual: bool = False
    compute_dtype: Any = jnp.bfloat16

    def _block(self, name):
        cls = ResidualBlock if self.residual else VGGBlock
        return lambda cout: cls(cout, self.compute_dtype, name=name)

    @nn.compact
    def __call__(self, x: jax.Array, hier: Hierarchy, train: bool) -> jax.Array:
        num_levels = len(self.planes)
        assert len(hier.levels) >= num_levels

        # encoder
        enc = []
        for l in range(num_levels):
            level = hier.levels[l]
            if l > 0:
                y = MaskedBatchNorm(name=f"down_bn_{l}")(x, hier.levels[l - 1].valid, train)
                y = nn.relu(y)
                x = DownConv(self.planes[l], self.compute_dtype, name=f"down_{l}")(
                    y, hier.transitions[l - 1]
                )
            for r in range(self.reps):
                x = self._block(f"enc_{l}_{r}")(self.planes[l])(x, level, train)
            enc.append(x)

        # decoder
        x = enc[-1]
        for l in range(num_levels - 2, -1, -1):
            y = MaskedBatchNorm(name=f"up_bn_{l}")(x, hier.levels[l + 1].valid, train)
            y = nn.relu(y)
            up = UpConv(self.planes[l], self.compute_dtype, name=f"up_{l}")(
                y, hier.transitions[l]
            )
            x = jnp.concatenate([enc[l], up], axis=-1)
            for r in range(self.reps):
                x = self._block(f"dec_{l}_{r}")(self.planes[l])(x, hier.levels[l], train)
        return x


class UNetSCN3D(nn.Module):
    """Full UNetSCN equivalent (scn_unet.py:90-126), minus the In/OutputLayer
    which live in `ops.voxelize` (the caller pools/unpools)."""

    in_channels: int = 1
    m: int = 16
    block_reps: int = 1
    residual_blocks: bool = False
    full_scale: int = 4096
    num_planes: int = 7
    compute_dtype: Any = jnp.bfloat16

    @property
    def out_channels(self):
        return self.m

    @nn.compact
    def __call__(self, voxel_feats: jax.Array, hier: Hierarchy, train: bool):
        planes = [(n + 1) * self.m for n in range(self.num_planes)]
        x = SubmConv(self.m, self.compute_dtype, name="input_conv")(
            voxel_feats, hier.levels[0]
        )
        x = SparseUNet(
            planes,
            reps=self.block_reps,
            residual=self.residual_blocks,
            compute_dtype=self.compute_dtype,
            name="unet",
        )(x, hier, train)
        x = MaskedBatchNorm(name="out_bn")(x, hier.levels[0].valid, train)
        x = nn.relu(x)
        return x


class Net3DSeg(nn.Module):
    """3D branch: sigmoid-gated RGB point feats -> sparse U-Net -> dual heads.

    Pure-functional port of the reference Net3DSeg (3d_net/model.py:23-58):
    the gate is applied out-of-place and always returned as "confidence"
    (the reference only returns it in the vkitti variant — pitfall #2 in
    SURVEY.md §5).
    """

    num_classes: int
    dual_head: bool = True
    in_channels: int = 3
    m: int = 16
    block_reps: int = 1
    residual_blocks: bool = False
    full_scale: int = 4096
    num_planes: int = 7
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        point_feats: jax.Array,  # (P, in_channels) per-point features (RGB)
        grid: VoxelGrid,
        hier: Hierarchy,
        train: bool = False,
    ) -> Tuple[Dict[str, jax.Array], jax.Array, Dict[str, jax.Array]]:
        gate = nn.Dense(1, name="linear_rgb_mask")(point_feats.astype(jnp.float32))
        gate = nn.sigmoid(gate)
        gated = point_feats * gate

        voxel_feats = pool_features(grid, gated)  # InputLayer mode=4 (mean)
        trunk = UNetSCN3D(
            in_channels=self.in_channels,
            m=self.m,
            block_reps=self.block_reps,
            residual_blocks=self.residual_blocks,
            full_scale=self.full_scale,
            num_planes=self.num_planes,
            compute_dtype=self.compute_dtype,
            name="net_3d",
        )(voxel_feats, hier, train)
        point_out = unpool_features(grid, trunk)  # OutputLayer -> (P, m)

        seg_logit = nn.Dense(self.num_classes, name="linear")(point_out)
        preds = {"seg_logit": seg_logit, "confidence": gate}

        aux = {
            "feats": point_out,
            "seg_logit_point": nn.Dense(self.num_classes, name="aux_linear_point")(
                point_out
            ),
        }
        return preds, point_out, aux
