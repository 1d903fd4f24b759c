"""Sparse convolution compute ops: gather -> dense matmul (MXU-friendly).

Equivalents of SparseConvNet's CUDA kernels
(``scn.SubmanifoldConvolution`` / ``scn.Convolution`` /
``scn.Deconvolution``, cf.
``/root/reference/experiments_*/rgbd_rgbxyz_sigmoid_for_rgb/3d_net/scn_unet.py``)
recast for TPU:

- Neighbor features are gathered into a (V, K*Cin) matrix and hit with ONE
  (K*Cin, Cout) matmul.  With K=27 taps the contraction dim is 27*Cin
  (432..3024 for the reference channel counts 16..112), which tiles far
  better onto the 128x128 MXU than K separate tiny matmuls.
- Missing neighbors index a zero pad row — no branches, no dynamic shapes.
- Compute in bf16 with fp32 accumulation (preferred_element_type).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .hierarchy import GridLevel, LevelTransition


def _pad_zero_row(feats: jax.Array) -> jax.Array:
    return jnp.concatenate(
        [feats, jnp.zeros((1, feats.shape[-1]), feats.dtype)], axis=0
    )


def _matmul(a: jax.Array, b: jax.Array, compute_dtype) -> jax.Array:
    # fp32 compute means full-precision (parity/testing); bf16 rides the MXU.
    precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    return jnp.dot(
        a.astype(compute_dtype),
        b.astype(compute_dtype),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def subm_conv3(
    feats: jax.Array,
    level: GridLevel,
    weight: jax.Array,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Submanifold 3x3x3 convolution: active sites only, no dilation.

    Args:
      feats: (V, Cin) voxel features at `level`.
      weight: (27, Cin, Cout), tap order = `hierarchy.OFFSETS_27`.
    Returns: (V, Cout) fp32.
    """
    v, cin = feats.shape
    cout = weight.shape[-1]
    padded = _pad_zero_row(feats)
    gathered = padded[level.nbr.reshape(-1)].reshape(v, 27 * cin)
    return _matmul(gathered, weight.reshape(27 * cin, cout), compute_dtype)


def down_conv2(
    fine_feats: jax.Array,
    trans: LevelTransition,
    weight: jax.Array,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Strided downsample conv (filter 2, stride 2): fine -> coarse sites.

    Args:
      fine_feats: (Vf, Cin).
      weight: (8, Cin, Cout), tap order = `hierarchy.OFFSETS_8`.
    Returns: (Vc, Cout) fp32.
    """
    vf, cin = fine_feats.shape
    vc = trans.child.shape[0]
    cout = weight.shape[-1]
    padded = _pad_zero_row(fine_feats)
    gathered = padded[trans.child.reshape(-1)].reshape(vc, 8 * cin)
    return _matmul(gathered, weight.reshape(8 * cin, cout), compute_dtype)


def up_conv2(
    coarse_feats: jax.Array,
    trans: LevelTransition,
    weight: jax.Array,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Transposed stride-2 conv restoring the saved fine site set.

    Every fine site has exactly one coarse parent and one tap offset, so the
    op is: gather parent features, apply all 8 tap matrices densely, select
    the row's tap (take_along_axis).  8x FLOPs over the minimum but fully
    dense — a win on the MXU at these channel widths.

    Args:
      coarse_feats: (Vc, Cin).
      weight: (8, Cin, Cout) — taps indexed by the fine site's off_id.
    Returns: (Vf, Cout) fp32.
    """
    vf = trans.parent.shape[0]
    cin = coarse_feats.shape[-1]
    cout = weight.shape[-1]
    padded = _pad_zero_row(coarse_feats)
    g = padded[trans.parent]  # (Vf, Cin)
    all_taps = _matmul(g, weight.transpose(1, 0, 2).reshape(cin, 8 * cout),
                       compute_dtype).reshape(vf, 8, cout)
    return jnp.take_along_axis(
        all_taps, trans.off_id[:, None, None].astype(jnp.int32), axis=1
    )[:, 0, :]


def linear(feats: jax.Array, weight: jax.Array, bias=None,
           compute_dtype=jnp.bfloat16) -> jax.Array:
    """Per-site 1x1 linear (scn.NetworkInNetwork / nn.Linear equivalent)."""
    out = _matmul(feats, weight, compute_dtype)
    if bias is not None:
        out = out + bias
    return out


def masked_batch_norm_stats(feats: jax.Array, valid: jax.Array):
    """Mean/var over valid rows only (BN over active sites, like scn.BatchNorm*).

    Returns fp32 (mean, var) of shape (C,).
    """
    f32 = feats.astype(jnp.float32)
    m = valid[:, None].astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(f32 * m, axis=0) / n
    var = jnp.sum(jnp.square(f32 - mean) * m, axis=0) / n
    return mean, var
