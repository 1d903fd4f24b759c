"""Pallas kernels: slot-compacted submanifold convolution.

Motivation (measured on the target chip, see PERFORMANCE.md): the dense
rulebook conv gathers 27 x V feature rows per layer, but LiDAR occupancy is
so sparse that only ~2-7 of the 26 off-center taps hit per voxel.  Row
gathers are descriptor-bound (~0.46 G rows/s from VMEM-resident tables), so
the dense form wastes ~75% of its time gathering the zero pad row.

The slot-compacted form gathers only `H` "slots" per voxel (H = per-level
cap on off-center hits, built once per topology in `ops.hierarchy
.build_slots`) and applies the per-slot tap weight on-chip:

    out[v] = x[v] @ w[13]                        (center tap: no gather)
           + sum_h  x[slot_src[h, v]] @ w[slot_tap[h, v]]

The per-row dynamic weight selection would break MXU batching, so the
kernel computes ALL 27 tap products for each gathered row in VMEM and
mask-selects the right one:

    X3     = x_src[h] @ w_flat            # (T, 27*Co)  one MXU matmul
    masked = X3 * (col_tap == tap[h])     # select the row's tap column band
    out   += masked @ R                   # (27*Co, Co) band-sum, MXU

The 27x FLOP inflation is free at these channel widths (the MXU is
latency-starved anyway); what matters is that X3 never leaves VMEM and the
HBM gather count drops from 27*V to H*V rows.

Equivalent of SparseConvNet's SubmanifoldConvolution rulebook application
(``/root/reference/.../3d_net/scn_unet.py:26-53``), restructured for the
TPU memory system.  Falls back to a pure-XLA einsum off TPU (tests/CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MISS_TAP = 27  # empty-slot tap value for 27-tap tables (matches no tap
# column; K-tap tables use K as the miss value — col_tap is always < K)


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _band_sum_matrix(cout: int, k_taps: int = 27, dtype=jnp.float32) -> jax.Array:
    """R (K*Co, Co): sums the K Co-wide column bands."""
    eye = np.eye(cout, dtype=np.float32)
    r = np.tile(eye, (k_taps, 1))
    return jnp.asarray(r, dtype)


def _wflat(weight: jax.Array) -> jax.Array:
    """(K, Ci, Co) -> (Ci, K*Co), tap-major column bands."""
    k, ci, co = weight.shape
    return weight.transpose(1, 0, 2).reshape(ci, k * co)


# ---------------------------------------------------------------------------
# forward / d_input kernel: out[v] = sum_h x_src[h, v] @ w[tap[h, v]]
# ---------------------------------------------------------------------------

def _apply_kernel(x_ref, tap_ref, w_ref, r_ref, o_ref, *, n_slots: int):
    t, n_cols = x_ref.shape[1], w_ref.shape[1]
    co = r_ref.shape[1]
    col_tap = jax.lax.broadcasted_iota(jnp.int32, (t, n_cols), 1) // co

    def body(h, acc):
        x_h = x_ref[pl.ds(h, 1)][0]
        tap_h = tap_ref[pl.ds(h, 1)][0]
        x3 = jnp.dot(x_h, w_ref[:], preferred_element_type=jnp.float32)
        masked = jnp.where(col_tap == tap_h[:, None], x3, 0.0)
        return acc + jnp.dot(masked, r_ref[:],
                             preferred_element_type=jnp.float32)

    o_ref[:] = jax.lax.fori_loop(
        0, n_slots, body, jnp.zeros((t, co), jnp.float32)
    )


@functools.partial(jax.jit, static_argnames=("tile",))
def _apply_pallas(x_src, tap, wflat, r, tile):
    h, v, ci = x_src.shape
    n_cols, co = r.shape
    grid = (v // tile,)
    return pl.pallas_call(
        functools.partial(_apply_kernel, n_slots=h),
        grid=grid,
        in_specs=[
            pl.BlockSpec((h, tile, ci), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ci, n_cols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_cols, co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, co), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((v, co), jnp.float32),
    )(x_src, tap, wflat, r)


def _apply_xla(x_src, tap, weight):
    """Reference/CPU formulation of the slot application."""
    prec = (jax.lax.Precision.HIGHEST if x_src.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    # (H, V, K) one-hot of each slot's tap; empty slots (tap=K) hit nothing
    onehot = jax.nn.one_hot(tap, weight.shape[0], dtype=jnp.float32)
    # products for every tap of every slot row, then select
    taps = jax.lax.dot_general(
        x_src, weight,
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # (H, V, 27, Co)
    return jnp.einsum("hvk,hvkc->vc", onehot, taps)


def slot_apply(x_src: jax.Array, tap: jax.Array, weight: jax.Array) -> jax.Array:
    """sum_h x_src[h] @ weight[tap[h]] -> (V, Co) fp32.

    Args:
      x_src: (H, V, Ci) gathered slot features (empty slots = zero rows).
      tap: (H, V) int32 tap ids in [0, K); K marks an empty slot.
      weight: (K, Ci, Co) tap matrices (K = 27 for submanifold 3^3 — w[13]
        unused there, the center is handled by the caller without a gather —
        or 8 for the strided down conv's child taps).
    """
    h, v, ci = x_src.shape
    co = weight.shape[-1]
    tile = 512 if co <= 32 else 256
    # fp32 keeps HIGHEST-precision XLA matmuls (parity/testing) — the
    # kernel's MXU dots run at default (bf16-pass) precision
    if not _on_tpu() or h == 0 or x_src.dtype == jnp.float32:
        return _apply_xla(x_src, tap, weight)
    # pad V up to the tile size (empty slots contribute nothing) rather than
    # silently falling back to the XLA formulation, which materializes
    # (H, V, 27, Co)-scale products — a large performance cliff for
    # non-tile-aligned capacities
    vp = -(-v // tile) * tile
    if vp != v:
        x_src = jnp.pad(x_src, ((0, 0), (0, vp - v), (0, 0)))
        tap = jnp.pad(
            tap, ((0, 0), (0, vp - v)), constant_values=weight.shape[0]
        )
    out = _apply_pallas(
        x_src, tap, _wflat(weight).astype(x_src.dtype),
        _band_sum_matrix(co, weight.shape[0]), tile,
    )
    return out[:v]


# ---------------------------------------------------------------------------
# d_weight kernel: dw[k] = sum_{h,v: tap[h,v]=k} x_src[h, v] (x) g[v]
# ---------------------------------------------------------------------------

def _dw_kernel(x_ref, tap_ref, g_ref, rt_ref, o_ref, *, n_slots: int):
    i = pl.program_id(0)
    t = x_ref.shape[1]
    n_cols = rt_ref.shape[1]
    co = g_ref.shape[1]
    g3 = jnp.dot(g_ref[:], rt_ref[:], preferred_element_type=jnp.float32)
    col_tap = jax.lax.broadcasted_iota(jnp.int32, (t, n_cols), 1) // co

    def body(h, acc):
        x_h = x_ref[pl.ds(h, 1)][0]
        tap_h = tap_ref[pl.ds(h, 1)][0]
        masked = jnp.where(col_tap == tap_h[:, None], g3, 0.0)
        return acc + jax.lax.dot_general(
            x_h.astype(jnp.float32), masked,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Ci, 27*Co)

    contrib = jax.lax.fori_loop(
        0, n_slots, body, jnp.zeros(o_ref.shape, jnp.float32)
    )

    @pl.when(i == 0)
    def _init():
        o_ref[:] = contrib

    @pl.when(i > 0)
    def _acc():
        o_ref[:] = o_ref[:] + contrib


@functools.partial(jax.jit, static_argnames=("tile",))
def _dw_pallas(x_src, tap, g, rt, tile):
    h, v, ci = x_src.shape
    co, n_cols = rt.shape
    grid = (v // tile,)
    return pl.pallas_call(
        functools.partial(_dw_kernel, n_slots=h),
        grid=grid,
        in_specs=[
            pl.BlockSpec((h, tile, ci), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, co), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((co, n_cols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ci, n_cols), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ci, n_cols), jnp.float32),
    )(x_src, tap, g, rt)


def _dw_xla(x_src, tap, g, k_taps):
    prec = (jax.lax.Precision.HIGHEST if x_src.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    onehot = jax.nn.one_hot(tap, k_taps, dtype=jnp.float32)  # (H, V, K)
    return jnp.einsum(
        "hvk,hvc,vd->kcd", onehot, x_src.astype(jnp.float32),
        g.astype(jnp.float32), precision=prec,
    )  # (K, Ci, Co)


def slot_dw(x_src: jax.Array, tap: jax.Array, g: jax.Array,
            k_taps: int = 27) -> jax.Array:
    """Weight gradient of `slot_apply` -> (K, Ci, Co) fp32 (the center row
    is 0 for submanifold tables; the caller adds it gather-free)."""
    h, v, ci = x_src.shape
    co = g.shape[-1]
    tile = 512 if co <= 32 else 256
    # fp32 -> XLA path at HIGHEST precision (cf. slot_apply)
    if not _on_tpu() or h == 0 or x_src.dtype == jnp.float32:
        return _dw_xla(x_src, tap, g, k_taps)
    vp = -(-v // tile) * tile
    if vp != v:  # tile-pad (cf. slot_apply); padded slots match no tap band
        x_src = jnp.pad(x_src, ((0, 0), (0, vp - v), (0, 0)))
        tap = jnp.pad(tap, ((0, 0), (0, vp - v)), constant_values=k_taps)
        g = jnp.pad(g, ((0, vp - v), (0, 0)))
    rt = _band_sum_matrix(co, k_taps).T.astype(g.dtype)  # (Co, K*Co)
    dwflat = _dw_pallas(x_src, tap, g.astype(x_src.dtype), rt, tile)
    return dwflat.reshape(ci, k_taps, co).transpose(1, 0, 2)
