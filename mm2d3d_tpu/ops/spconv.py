"""Sparse convolution compute ops: gather -> dense matmul (MXU-friendly).

Equivalents of SparseConvNet's CUDA kernels
(``scn.SubmanifoldConvolution`` / ``scn.Convolution`` /
``scn.Deconvolution``, cf.
``/root/reference/experiments_*/rgbd_rgbxyz_sigmoid_for_rgb/3d_net/scn_unet.py``)
recast for TPU:

- Per conv: ONE gather of all tap neighborhoods (K, V, Cin), ONE batched
  matmul against (K, Cin, Cout) weights, ONE tap reduction.  Missing
  neighbors index a zero pad row — no branches, no dynamic shapes.
- CUSTOM VJPs replace XLA's scatter-add adjoints (7x slower than forward on
  TPU) with gather-based transposes:
    * submanifold 3^3: adjoint = submanifold conv with negated taps
      (nbr[u, 26-k] pairs with nbr[v, k]) and transposed tap matrices;
    * stride-2 down conv and stride-2 deconv are each other's transposes
      (child map one way, parent/off_id map the other).
  Backward therefore costs ~2 forwards instead of ~7.
- Compute in bf16 with fp32 accumulation; fp32 inputs use full-precision
  matmuls (parity/testing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .hierarchy import GridLevel, LevelTransition

# Debug-only fault injection (tools/check_flagship_learning.py --mutate):
# when True the 3-tier submanifold adjoint SKIPS the compacted mid+heavy
# tiers — the FORWARD stays exact while gradients silently lose the tail
# contributions, exactly the bug class the flagship loss-trajectory band
# must catch (no CPU test compiles this graph).  Never set in production.
_DEBUG_DROP_COMPACT_TIERS_BWD = False


def _pad_zero_row(feats: jax.Array) -> jax.Array:
    return jnp.concatenate(
        [feats, jnp.zeros((1, feats.shape[-1]), feats.dtype)], axis=0
    )


def _precision(dtype):
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _matmul(a: jax.Array, b: jax.Array, compute_dtype) -> jax.Array:
    return jnp.dot(
        a.astype(compute_dtype),
        b.astype(compute_dtype),
        preferred_element_type=jnp.float32,
        precision=_precision(compute_dtype),
    )


def _int_zero(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def _tap_gather_matmul(feats: jax.Array, idx_t: jax.Array, weight: jax.Array):
    """sum_k take(feats_pad, idx_t[k]) @ weight[k]  ->  (V, Cout) fp32.

    feats: (V, Cin); idx_t: (K, V) with V = missing; weight: (K, Cin, Cout).
    XLA issues the gather (HBM random access is hardware-bound either way);
    the tap contraction runs in the fused Pallas kernel on TPU.
    """
    from .pallas.tapsum import tapsum

    padded = _pad_zero_row(feats)
    g = jnp.take(padded, idx_t, axis=0)  # (K, V, Cin)
    return tapsum(g, weight)


def _tap_weight_grad(feats: jax.Array, idx_t: jax.Array, g: jax.Array):
    """d_weight[k] = take(feats_pad, idx_t[k])^T @ g  ->  (K, Cin, Cout)."""
    padded = _pad_zero_row(feats)
    gk = jnp.take(padded, idx_t, axis=0)  # (K, V, Cin)
    return jax.lax.dot_general(
        gk, g.astype(gk.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(feats.dtype),
    )  # (K, Cin, Cout)


# ---------------------------------------------------------------------------
# submanifold 3x3x3
# ---------------------------------------------------------------------------

@jax.custom_vjp
def _subm_apply(feats, weight, nbr_t):
    return _tap_gather_matmul(feats, nbr_t, weight)


def _subm_fwd(feats, weight, nbr_t):
    from .pallas.tapsum import tapsum

    # Gather once; save the gathered neighborhoods as the residual.  The
    # weight gradient needs exactly this tensor, and re-gathering it in the
    # backward pass would cost another 27V descriptor-bound gather — far
    # more than the HBM to keep it alive.
    padded = _pad_zero_row(feats)
    gathered = jnp.take(padded, nbr_t, axis=0)  # (K, V, Cin)
    out = tapsum(gathered, weight)
    return out, (gathered, weight, nbr_t)


def _subm_bwd(res, g):
    gathered, weight, nbr_t = res
    g = g.astype(gathered.dtype)
    # adjoint conv: negated taps (row 26-k) with transposed matrices
    w_flip = weight[::-1].swapaxes(1, 2)
    d_feats = _tap_gather_matmul(g, nbr_t, w_flip).astype(gathered.dtype)
    d_weight = jax.lax.dot_general(
        gathered, g,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(gathered.dtype),
    ).astype(weight.dtype)  # (K, Cin, Cout)
    return d_feats, d_weight, _int_zero(nbr_t)


_subm_apply.defvjp(_subm_fwd, _subm_bwd)


# --- slot-compacted variant (see ops/pallas/bandmm.py for the rationale):
# gathers only the H per-voxel hit slots instead of all 27 tap rows; the
# whole conv (center tap included, as band 13 of the banded matrix) is ONE
# banded matmul.  Exact as long as the slot table did not drop hits
# (`GridLevel.slot_overflow` == 0, monitored).

def _masked(feats, valid):
    return jnp.where(valid[:, None], feats, jnp.zeros_like(feats))


@jax.custom_vjp
def _subm_apply_slots(feats, weight, slot_src, slot_tap, valid):
    from .pallas.bandmm import slot_conv_apply

    padded = _pad_zero_row(feats)
    x_src = jnp.take(padded, slot_src, axis=0)  # (H, V, Cin)
    return slot_conv_apply(_masked(feats, valid), x_src, slot_tap, weight)


def _subm_slots_fwd(feats, weight, slot_src, slot_tap, valid):
    from .pallas.bandmm import slot_conv_apply

    padded = _pad_zero_row(feats)
    x_src = jnp.take(padded, slot_src, axis=0)  # (H, V, Cin) — kept as the
    # residual: the weight gradient needs exactly this tensor (cf. _subm_fwd)
    out = slot_conv_apply(_masked(feats, valid), x_src, slot_tap, weight)
    return out, (x_src, feats, weight, slot_src, slot_tap, valid)


def _subm_slots_bwd(res, g):
    from .pallas.bandmm import slot_conv_apply, slot_conv_dw

    x_src, feats, weight, slot_src, slot_tap, valid = res
    g = g.astype(feats.dtype)
    # adjoint conv: same slot table read at the destination column, with
    # negated taps (row 26-k) and transposed matrices — exactly the dense
    # path's adjoint structure (_subm_bwd), compacted.  Band 13 of the
    # flipped weights is weight[13]^T, so the center adjoint folds in too.
    w_flip = weight[::-1].swapaxes(1, 2)
    g_pad = _pad_zero_row(g)
    g_src = jnp.take(g_pad, slot_src, axis=0)  # (H, V, Cout)
    d_feats = slot_conv_apply(_masked(g, valid), g_src, slot_tap, w_flip)
    # dw row 13 = masked(feats)^T @ g — the center band of the same E tile
    d_weight = slot_conv_dw(_masked(feats, valid), x_src, slot_tap, g)
    return (
        d_feats.astype(feats.dtype),
        d_weight.astype(weight.dtype),
        _int_zero(slot_src),
        _int_zero(slot_tap),
        _int_zero(valid),
    )


_subm_apply_slots.defvjp(_subm_slots_fwd, _subm_slots_bwd)


# --- split-phase variant (hierarchy.build_slots_split): a short slot table
# for all voxels plus a compacted overflow table for the few heavy voxels.
# Exact up to h_max hits/voxel; phase-2 output rows are scatter-added at the
# compacted row indices (a tiny scatter: Vh ~ V/16 rows).

def _scatter_add_rows(out, idx, rows):
    v = out.shape[0]
    padded = jnp.concatenate([out, jnp.zeros((1, out.shape[1]), out.dtype)], 0)
    return padded.at[jnp.minimum(idx, v)].add(rows)[:v]


def _gather_add_rows(out, inv, rows):
    """out[v] += rows[inv[v]] (inv == len(rows) means no contribution).

    The inverse-map formulation of `_scatter_add_rows`: scatter rows cost
    ~4x gather rows on this chip, so whenever the compacted tier holds more
    than ~V/4 rows the V-row gather is cheaper — and it fuses into the
    elementwise consumer, which a scatter never does.
    """
    padded = jnp.concatenate(
        [rows, jnp.zeros((1, rows.shape[1]), rows.dtype)], 0
    )
    return out + jnp.take(padded, inv, axis=0)


def _slots2_raw(feats, weight, s1, t1, idx, s2, t2, valid):
    from .pallas.bandmm import slot_conv_apply

    padded = _pad_zero_row(feats)
    x1 = jnp.take(padded, s1, axis=0)  # (h_lo, V, Ci)
    out = slot_conv_apply(_masked(feats, valid), x1, t1, weight)
    x2 = jnp.take(padded, s2, axis=0)  # (H2, Vh, Ci)
    o2 = slot_conv_apply(None, x2, t2, weight, tap_lo=s1.shape[0])  # (Vh, Co)
    return _scatter_add_rows(out, idx, o2), x1, x2


@jax.custom_vjp
def _subm_apply_slots2(feats, weight, s1, t1, idx, s2, t2, valid):
    return _slots2_raw(feats, weight, s1, t1, idx, s2, t2, valid)[0]


def _subm_slots2_fwd(feats, weight, s1, t1, idx, s2, t2, valid):
    out, x1, x2 = _slots2_raw(feats, weight, s1, t1, idx, s2, t2, valid)
    return out, (x1, x2, feats, weight, s1, t1, idx, s2, t2, valid)


def _subm_slots2_bwd(res, g):
    from .pallas.bandmm import slot_conv_apply, slot_conv_dw

    x1, x2, feats, weight, s1, t1, idx, s2, t2, valid = res
    g = g.astype(feats.dtype)
    w_flip = weight[::-1].swapaxes(1, 2)
    g_pad = _pad_zero_row(g)
    h_lo = s1.shape[0]
    # adjoint conv through the same split tables (cf. _subm_slots_bwd)
    g1 = jnp.take(g_pad, s1, axis=0)
    d_feats = slot_conv_apply(_masked(g, valid), g1, t1, w_flip)
    g2 = jnp.take(g_pad, s2, axis=0)
    d2 = slot_conv_apply(None, g2, t2, w_flip, tap_lo=h_lo)  # (Vh, Ci)
    d_feats = _scatter_add_rows(d_feats, idx, d2)

    g_hi = jnp.take(g_pad, idx, axis=0)  # (Vh, Co)
    d_weight = slot_conv_dw(_masked(feats, valid), x1, t1, g) + slot_conv_dw(
        None, x2, t2, g_hi, tap_lo=h_lo
    )
    return (
        d_feats.astype(feats.dtype),
        d_weight.astype(weight.dtype),
        _int_zero(s1), _int_zero(t1), _int_zero(idx),
        _int_zero(s2), _int_zero(t2), _int_zero(valid),
    )


_subm_apply_slots2.defvjp(_subm_slots2_fwd, _subm_slots2_bwd)


# --- 3-tier variant (hierarchy.build_slots_tiered): tier 1 sized near the
# MEAN hit count for all voxels, plus two compacted overflow tiers.  Same
# adjoint structure as the 2-tier form, one more scatter-added phase.

def _slots3_raw(feats, weight, s1, t1, im, invm, sm, tm, ih, sh, th, valid):
    from .pallas.bandmm import slot_conv_apply

    padded = _pad_zero_row(feats)
    x1 = jnp.take(padded, s1, axis=0)  # (h1, V, Ci)
    out = slot_conv_apply(_masked(feats, valid), x1, t1, weight)
    xm = jnp.take(padded, sm, axis=0)  # (Hm, Vm, Ci)
    om = slot_conv_apply(None, xm, tm, weight, tap_lo=s1.shape[0])
    # mid tier: gather-side add (Vm is a large fraction of V; a Vm-row
    # scatter costs more than a V-row gather, cf. _gather_add_rows)
    out = _gather_add_rows(out, invm, om)
    xh = jnp.take(padded, sh, axis=0)  # (Hh, Vh, Ci)
    oh = slot_conv_apply(
        None, xh, th, weight, tap_lo=s1.shape[0] + sm.shape[0]
    )
    return _scatter_add_rows(out, ih, oh), x1, xm, xh


@jax.custom_vjp
def _subm_apply_slots3(feats, weight, s1, t1, im, invm, sm, tm, ih, sh, th,
                       valid):
    return _slots3_raw(
        feats, weight, s1, t1, im, invm, sm, tm, ih, sh, th, valid
    )[0]


def _subm_slots3_fwd(feats, weight, s1, t1, im, invm, sm, tm, ih, sh, th,
                     valid):
    out, x1, xm, xh = _slots3_raw(
        feats, weight, s1, t1, im, invm, sm, tm, ih, sh, th, valid
    )
    return out, (x1, xm, xh, feats, weight, s1, t1, im, invm, sm, tm, ih, sh,
                 th, valid)


def _subm_slots3_bwd(res, g):
    from .pallas.bandmm import slot_conv_apply, slot_conv_dw

    (x1, xm, xh, feats, weight, s1, t1, im, invm, sm, tm, ih, sh, th,
     valid) = res
    g = g.astype(feats.dtype)
    w_flip = weight[::-1].swapaxes(1, 2)
    g_pad = _pad_zero_row(g)
    h1, hm = s1.shape[0], sm.shape[0]
    # adjoint conv through the same tier tables (cf. _subm_slots2_bwd)
    g1 = jnp.take(g_pad, s1, axis=0)
    d_feats = slot_conv_apply(_masked(g, valid), g1, t1, w_flip)
    if not _DEBUG_DROP_COMPACT_TIERS_BWD:
        gm = jnp.take(g_pad, sm, axis=0)
        d_feats = _gather_add_rows(
            d_feats, invm, slot_conv_apply(None, gm, tm, w_flip, tap_lo=h1)
        )
        gh = jnp.take(g_pad, sh, axis=0)
        d_feats = _scatter_add_rows(
            d_feats, ih, slot_conv_apply(None, gh, th, w_flip, tap_lo=h1 + hm)
        )

    g_m = jnp.take(g_pad, im, axis=0)  # (Vm, Co)
    g_h = jnp.take(g_pad, ih, axis=0)  # (Vh, Co)
    d_weight = slot_conv_dw(_masked(feats, valid), x1, t1, g)
    if not _DEBUG_DROP_COMPACT_TIERS_BWD:
        d_weight = (
            d_weight
            + slot_conv_dw(None, xm, tm, g_m, tap_lo=h1)
            + slot_conv_dw(None, xh, th, g_h, tap_lo=h1 + hm)
        )
    return (
        d_feats.astype(feats.dtype),
        d_weight.astype(weight.dtype),
        _int_zero(s1), _int_zero(t1), _int_zero(im), _int_zero(invm),
        _int_zero(sm), _int_zero(tm), _int_zero(ih), _int_zero(sh),
        _int_zero(th), _int_zero(valid),
    )


_subm_apply_slots3.defvjp(_subm_slots3_fwd, _subm_slots3_bwd)


def subm_conv3(
    feats: jax.Array,
    level: GridLevel,
    weight: jax.Array,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Submanifold 3x3x3 convolution: active sites only, no dilation.

    Uses the slot-compacted path when the level carries slot tables
    (`hierarchy.build_slots`), else the dense 27-tap gather.

    Args:
      feats: (V, Cin) voxel features at `level`.
      weight: (27, Cin, Cout), tap order = `hierarchy.OFFSETS_27`.
    Returns: (V, Cout) fp32.
    """
    from .pallas.bandmm import _on_tpu

    cin = feats.shape[-1]
    if (
        level.slot_src is not None
        and cin % 8
        and compute_dtype != jnp.float32
        and _on_tpu()
    ):
        # sublane-align the input conv's 3 channels so the slot path runs
        # in the Pallas kernel (zero rows in the weight change nothing)
        pad = (-cin) % 8
        feats = jnp.pad(feats, ((0, 0), (0, pad)))
        weight = jnp.pad(weight, ((0, 0), (0, pad), (0, 0)))
    if level.slot_srcm is not None:
        return _subm_apply_slots3(
            feats.astype(compute_dtype), weight.astype(compute_dtype),
            level.slot_src, level.slot_tap,
            level.slot_idxm, level.slot_invm, level.slot_srcm,
            level.slot_tapm,
            level.slot_idx, level.slot_src2, level.slot_tap2, level.valid,
        )
    if level.slot_src2 is not None:
        return _subm_apply_slots2(
            feats.astype(compute_dtype), weight.astype(compute_dtype),
            level.slot_src, level.slot_tap, level.slot_idx,
            level.slot_src2, level.slot_tap2, level.valid,
        )
    if level.slot_src is not None:
        return _subm_apply_slots(
            feats.astype(compute_dtype), weight.astype(compute_dtype),
            level.slot_src, level.slot_tap, level.valid,
        )
    return _subm_apply(
        feats.astype(compute_dtype), weight.astype(compute_dtype), level.nbr
    )


# ---------------------------------------------------------------------------
# stride-2 down conv / deconv (mutual transposes)
# ---------------------------------------------------------------------------

def _per_tap_matmul(x, off_id, weight):
    """y[v] = x[v] @ weight[off_id[v]]  ->  (V, Co) fp32.

    The banded-matrix form (ops.pallas.bandmm with H = 1, K = 8): each tile
    scatters x into its tap band in VMEM and runs one deep-K MXU matmul.
    The broadcast-matmul + one-hot-einsum formulation this replaces
    materialized an (8, V, Co) fp32 tap tensor in HBM per strided conv
    (~33 MB at the flagship level-0 size).
    """
    from .pallas.bandmm import slot_conv_apply

    return slot_conv_apply(None, x[None], off_id[None], weight)


def _up_apply_raw(coarse_feats, weight, parent, off_id):
    """out_f[v] = coarse[parent[v]] @ weight[off_id[v]]  (fp32)."""
    vc = coarse_feats.shape[0]
    padded = _pad_zero_row(coarse_feats)
    xg = jnp.take(padded, jnp.minimum(parent, vc), axis=0)  # (Vf, Ci)
    # dumped parents gather the zero pad row, so their output is zero for
    # any off_id value
    return _per_tap_matmul(xg, off_id, weight)


def _down_seg_raw(fine_feats, weight, parent, off_id, vc):
    """out[c] = sum_{f in children(c)} fine[f] @ weight[off_id[f]].

    The fine table is Morton-sorted, so `parent` is nondecreasing (invalid
    rows on the trailing dump segment): the whole strided conv is one
    banded per-tap matmul and ONE sorted segment-sum — zero gathers and
    zero scatters (the gather formulation paid 8 descriptor-bound rows per
    parent; ~1.6 ms/fwd over the hierarchy at the flagship size).
    """
    y = _per_tap_matmul(fine_feats, off_id, weight)
    return jax.ops.segment_sum(
        y, parent, num_segments=vc + 1, indices_are_sorted=True
    )[:vc]


def _down_dw(fine_feats, off_id, gp):
    """d_weight[k] = sum over fine rows with off_id==k of fine x g[parent]."""
    from .pallas.bandmm import slot_conv_dw

    return slot_conv_dw(
        None, fine_feats[None], off_id[None], gp, k_taps=8
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _down_apply(fine_feats, weight, parent, off_id, vc):
    return _down_seg_raw(fine_feats, weight, parent, off_id, vc)


def _down_fwd(fine_feats, weight, parent, off_id, vc):
    out = _down_seg_raw(fine_feats, weight, parent, off_id, vc)
    return out, (fine_feats, weight, parent, off_id)


def _down_bwd(vc, res, g):
    fine_feats, weight, parent, off_id = res
    g = g.astype(fine_feats.dtype)
    # transpose of down conv = deconv through (parent, off_id)
    d_fine = _up_apply_raw(g, weight.swapaxes(1, 2), parent, off_id).astype(
        fine_feats.dtype
    )
    gp = jnp.take(_pad_zero_row(g), jnp.minimum(parent, vc), axis=0)
    d_weight = _down_dw(fine_feats, off_id, gp).astype(weight.dtype)
    return (d_fine, d_weight, _int_zero(parent), _int_zero(off_id))


_down_apply.defvjp(_down_fwd, _down_bwd)


# --- slot-compacted strided conv (hierarchy.build_child_slots): parents
# have ~1.5-2.2 children on average, so gather h_lo child rows instead of 8,
# with heavy parents routed through the compacted exact table.

def _down_slots_raw(fine_feats, weight, s1, t1, idx, s2, t2):
    from .pallas.bandmm import slot_conv_apply

    padded = _pad_zero_row(fine_feats)
    x1 = jnp.take(padded, s1, axis=0)  # (h_lo, Vc, Ci)
    out = slot_conv_apply(None, x1, t1, weight)
    x2 = jnp.take(padded, s2, axis=0)  # (h2, Vh, Ci)
    o2 = slot_conv_apply(None, x2, t2, weight, tap_lo=s1.shape[0])
    return _scatter_add_rows(out, idx, o2), x1, x2


@jax.custom_vjp
def _down_apply_slots(fine_feats, weight, s1, t1, idx, s2, t2, parent, off_id):
    return _down_slots_raw(fine_feats, weight, s1, t1, idx, s2, t2)[0]


def _down_slots_fwd(fine_feats, weight, s1, t1, idx, s2, t2, parent, off_id):
    out, x1, x2 = _down_slots_raw(fine_feats, weight, s1, t1, idx, s2, t2)
    return out, (x1, x2, weight, t1, idx, t2, parent, off_id)


def _down_slots_bwd(res, g):
    from .pallas.bandmm import slot_conv_dw

    x1, x2, weight, t1, idx, t2, parent, off_id = res
    g = g.astype(x1.dtype)
    # transpose of down conv = deconv through (parent, off_id), as dense
    d_fine = _up_apply_raw(g, weight.swapaxes(1, 2), parent, off_id).astype(
        x1.dtype
    )
    g_hi = jnp.take(_pad_zero_row(g), idx, axis=0)  # (Vh, Co)
    d_weight = (
        slot_conv_dw(None, x1, t1, g, k_taps=8)
        + slot_conv_dw(None, x2, t2, g_hi, k_taps=8, tap_lo=t1.shape[0])
    ).astype(weight.dtype)
    # s1/s2 are not kept as residuals; their zero-tangents are built from
    # t1/t2, which share their (h, V) int32 shape by construction
    # (hierarchy.build_child_slots emits src/tap pairs together)
    return (d_fine, d_weight, _int_zero(t1), _int_zero(t1), _int_zero(idx),
            _int_zero(t2), _int_zero(t2), _int_zero(parent), _int_zero(off_id))


_down_apply_slots.defvjp(_down_slots_fwd, _down_slots_bwd)


def down_conv2(
    fine_feats: jax.Array,
    trans: LevelTransition,
    weight: jax.Array,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Strided downsample conv (filter 2, stride 2): fine -> coarse sites.

    weight: (8, Cin, Cout), tap order = `hierarchy.OFFSETS_8`.
    """
    if trans.cslot_src is not None:
        return _down_apply_slots(
            fine_feats.astype(compute_dtype), weight.astype(compute_dtype),
            trans.cslot_src, trans.cslot_tap, trans.cslot_idx,
            trans.cslot_src2, trans.cslot_tap2, trans.parent, trans.off_id,
        )
    return _down_apply(
        fine_feats.astype(compute_dtype), weight.astype(compute_dtype),
        trans.parent, trans.off_id, trans.child.shape[0],
    )


@jax.custom_vjp
def _up_apply(coarse_feats, weight, parent, off_id):
    return _up_apply_raw(coarse_feats, weight, parent, off_id)


def _up_fwd(coarse_feats, weight, parent, off_id):
    out = _up_apply(coarse_feats, weight, parent, off_id)
    return out, (coarse_feats, weight, parent, off_id)


def _up_bwd(res, g):
    coarse_feats, weight, parent, off_id = res
    vc = coarse_feats.shape[0]
    g = g.astype(coarse_feats.dtype)
    # transpose of deconv = down conv through (parent, off_id): the same
    # sorted segment-sum as _down_seg_raw (zero gathers/scatters)
    d_coarse = _down_seg_raw(
        g, weight.swapaxes(1, 2), parent, off_id, vc
    ).astype(coarse_feats.dtype)
    # d_weight[k] = sum over fine rows with off_id==k of coarse[parent] x g
    padded = _pad_zero_row(coarse_feats)
    gp = jnp.take(padded, jnp.minimum(parent, vc), axis=0)  # (Vf, Cin)
    d_weight = _down_dw(gp, off_id, g).astype(weight.dtype)
    return (d_coarse, d_weight, _int_zero(parent), _int_zero(off_id))


_up_apply.defvjp(_up_fwd, _up_bwd)


@jax.custom_vjp
def _up_apply_slots(coarse_feats, weight, parent, off_id, s1, t1, idx, s2, t2):
    return _up_apply_raw(coarse_feats, weight, parent, off_id)


def _up_slots_fwd(coarse_feats, weight, parent, off_id, s1, t1, idx, s2, t2):
    out = _up_apply_raw(coarse_feats, weight, parent, off_id)
    return out, (coarse_feats, weight, parent, off_id, s1, t1, idx, s2, t2)


def _up_slots_bwd(res, g):
    from .pallas.bandmm import slot_conv_apply

    coarse_feats, weight, parent, off_id, s1, t1, idx, s2, t2 = res
    g = g.astype(coarse_feats.dtype)
    # transpose of deconv = down conv through the (slot-compacted) child map
    w_t = weight.swapaxes(1, 2)
    g_pad = _pad_zero_row(g)
    g1 = jnp.take(g_pad, s1, axis=0)  # (h_lo, Vc, Co)
    d_coarse = slot_conv_apply(None, g1, t1, w_t)
    g2 = jnp.take(g_pad, s2, axis=0)
    d_coarse = _scatter_add_rows(
        d_coarse, idx, slot_conv_apply(None, g2, t2, w_t, tap_lo=t1.shape[0])
    ).astype(coarse_feats.dtype)
    # d_weight[k] = sum over fine rows with off_id==k of coarse[parent] x g
    vc = coarse_feats.shape[0]
    padded = _pad_zero_row(coarse_feats)
    gp = jnp.take(padded, jnp.minimum(parent, vc), axis=0)  # (Vf, Cin)
    d_weight = _down_dw(gp, off_id, g).astype(weight.dtype)
    return (d_coarse, d_weight, _int_zero(parent), _int_zero(off_id),
            _int_zero(s1), _int_zero(t1), _int_zero(idx), _int_zero(s2),
            _int_zero(t2))


_up_apply_slots.defvjp(_up_slots_fwd, _up_slots_bwd)


def up_conv2(
    coarse_feats: jax.Array,
    trans: LevelTransition,
    weight: jax.Array,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Transposed stride-2 conv restoring the saved fine site set.

    weight: (8, Cin, Cout) — taps indexed by the fine site's off_id.
    """
    if trans.cslot_src is not None:
        return _up_apply_slots(
            coarse_feats.astype(compute_dtype), weight.astype(compute_dtype),
            trans.parent, trans.off_id, trans.cslot_src, trans.cslot_tap,
            trans.cslot_idx, trans.cslot_src2, trans.cslot_tap2,
        )
    return _up_apply(
        coarse_feats.astype(compute_dtype), weight.astype(compute_dtype),
        trans.parent, trans.off_id,
    )


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------

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
