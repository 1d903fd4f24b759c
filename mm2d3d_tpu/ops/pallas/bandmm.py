"""Pallas kernel: slot-compacted sparse conv as ONE banded matmul.

Replaces the first-generation slot kernel (`slotconv.py`, now retired)
whose tap dispatch computed all 27 tap products per gathered row and
mask-selected one — 27x wasted MXU work that dominated the conv at small
channel widths (measured ~1.2 ms/call at V=65k, C=16; the whole 3D branch
spent ~15 ms in those kernels).

This formulation moves the tap dispatch into the LAYOUT instead: each grid
tile builds a banded neighborhood matrix in VMEM

    E[t, k*Ci : (k+1)*Ci] = sum_h  where(tap[h, t] == k, x_src[h, t], 0)

(VPU selects — slots are tap-sorted, so slot h only feeds bands k >= h,
which prunes the compare count), then applies the whole convolution as ONE
MXU matmul with a deep contraction:

    out[t] = E[t] @ w_flat          # (tile, K*Ci) @ (K*Ci, Co)

The center tap needs no gather: its band is the (validity-masked) center
features themselves, so `E[:, 13*Ci:14*Ci] = x_center` folds it in for
free.  The weight gradient reuses the same E tile: dw = sum_tiles E^T @ g.
(The kernels actually run in the TRANSPOSED orientation — voxels on the
512-wide lane dimension — see the lane-alignment note below; the math
above is unchanged.)

Equivalent of SparseConvNet's SubmanifoldConvolution rulebook application
(``/root/reference/.../3d_net/scn_unet.py:26-53``), restructured for the
TPU memory system.  Off TPU (tests/CPU) and for fp32 parity runs it falls
back to an identical-layout XLA formulation at HIGHEST precision.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MISS_TAP = 27  # empty-slot tap value for 27-tap tables (matches no band;
# K-tap tables use K as the miss value — band index is always < K)

_CENTER = 13  # OFFSETS_27 index of (0, 0, 0)


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


# --- transposed (lane-aligned) kernels: feature blocks are (Ci, tile) with
# the voxel axis on the 512-wide lane dimension, so every tap-compare select
# uses full vector lanes (the (tile, Ci) orientation pads Ci=16..48 channels
# up to 128 lanes and wastes ~8x VPU work), and the band concat lands on
# aligned sublane boundaries.  Measured ~2x faster than the row-major
# orientation at the flagship widths.

def _build_e_t(xm_ref, x_ref, tap_ref, *, k_taps: int, tap_lo: int):
    """The transposed banded matrix for one tile: (k_taps * Ci, tile)."""
    h = x_ref.shape[0] if x_ref is not None else 0
    if x_ref is not None:
        ci, t = x_ref.shape[1], x_ref.shape[2]
        dt = x_ref.dtype
    else:
        ci, t = xm_ref.shape
        dt = xm_ref.dtype
    zero = jnp.zeros((ci, t), dt)
    bands = []
    for k in range(k_taps):
        if k_taps == 27 and k == _CENTER:
            bands.append(xm_ref[:] if xm_ref is not None else zero)
            continue
        acc = None
        for hh in range(h):
            if k < tap_lo + hh:
                continue
            tap_h = tap_ref[pl.ds(hh, 1)][0]  # (t,) on lanes
            x_h = x_ref[pl.ds(hh, 1)][0]  # (ci, t)
            sel = jnp.where(tap_h[None, :] == k, x_h, zero)
            acc = sel if acc is None else acc + sel
        bands.append(zero if acc is None else acc)
    return jnp.concatenate(bands, axis=0)


def _apply_kernel_t(*refs, k_taps: int, tap_lo: int, has_center: bool,
                    has_slots: bool):
    if has_center and has_slots:
        xm_ref, x_ref, tap_ref, w_ref, o_ref = refs
    elif has_center:
        xm_ref, w_ref, o_ref = refs
        x_ref = tap_ref = None
    else:
        x_ref, tap_ref, w_ref, o_ref = refs
        xm_ref = None
    e = _build_e_t(xm_ref, x_ref, tap_ref, k_taps=k_taps, tap_lo=tap_lo)
    # (Co, K*Ci) @ (K*Ci, tile) -> (Co, tile)
    o_ref[:] = jnp.dot(w_ref[:], e, preferred_element_type=jnp.float32)


def _dw_kernel_t(*refs, k_taps: int, tap_lo: int, has_center: bool,
                 has_slots: bool):
    i = pl.program_id(0)
    if has_center and has_slots:
        xm_ref, x_ref, tap_ref, g_ref, o_ref = refs
    elif has_center:
        xm_ref, g_ref, o_ref = refs
        x_ref = tap_ref = None
    else:
        x_ref, tap_ref, g_ref, o_ref = refs
        xm_ref = None
    e = _build_e_t(xm_ref, x_ref, tap_ref, k_taps=k_taps, tap_lo=tap_lo)
    # gT (Co, tile) x e (K*Ci, tile) contracted on lanes -> (Co, K*Ci)
    contrib = jax.lax.dot_general(
        g_ref[:], e,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == 0)
    def _init():
        o_ref[:] = contrib

    @pl.when(i > 0)
    def _acc():
        o_ref[:] = o_ref[:] + contrib


_TILE = 512


def _pad_v(arrs, v, k_taps):
    vp = -(-v // _TILE) * _TILE
    if vp == v:
        return arrs, v
    xm, x_src, tap, rest = arrs
    if xm is not None:
        xm = jnp.pad(xm, ((0, vp - v), (0, 0)))
    if x_src is not None:
        x_src = jnp.pad(x_src, ((0, 0), (0, vp - v), (0, 0)))
        tap = jnp.pad(tap, ((0, 0), (0, vp - v)), constant_values=k_taps)
    if rest is not None:
        rest = jnp.pad(rest, ((0, vp - v), (0, 0)))
    return (xm, x_src, tap, rest), vp


@functools.partial(jax.jit, static_argnames=("k_taps", "tap_lo"))
def _apply_pallas(xm, x_src, tap, wflat, k_taps, tap_lo):
    v = xm.shape[0] if xm is not None else x_src.shape[1]
    ci = xm.shape[1] if xm is not None else x_src.shape[2]
    co = wflat.shape[1]
    (xm, x_src, tap, _), vp = _pad_v((xm, x_src, tap, None), v, k_taps)
    h = 0 if x_src is None else x_src.shape[0]
    specs, args = [], []
    if xm is not None:
        specs.append(pl.BlockSpec((ci, _TILE), lambda i: (0, i),
                                  memory_space=pltpu.VMEM))
        args.append(xm.T)
    if x_src is not None:
        specs += [
            pl.BlockSpec((h, ci, _TILE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ]
        args += [x_src.transpose(0, 2, 1), tap]
    specs.append(pl.BlockSpec((co, k_taps * ci), lambda i: (0, 0),
                              memory_space=pltpu.VMEM))
    args.append(wflat.T)
    out_t = pl.pallas_call(
        functools.partial(
            _apply_kernel_t, k_taps=k_taps, tap_lo=tap_lo,
            has_center=xm is not None, has_slots=x_src is not None,
        ),
        grid=(vp // _TILE,),
        in_specs=specs,
        out_specs=pl.BlockSpec((co, _TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((co, vp), jnp.float32),
    )(*args)
    return out_t.T[:v]


@functools.partial(jax.jit, static_argnames=("k_taps", "tap_lo"))
def _dw_pallas(xm, x_src, tap, g, k_taps, tap_lo):
    ci = xm.shape[1] if xm is not None else x_src.shape[2]
    v = g.shape[0]
    co = g.shape[1]
    (xm, x_src, tap, g), vp = _pad_v((xm, x_src, tap, g), v, k_taps)
    h = 0 if x_src is None else x_src.shape[0]
    specs, args = [], []
    if xm is not None:
        specs.append(pl.BlockSpec((ci, _TILE), lambda i: (0, i),
                                  memory_space=pltpu.VMEM))
        args.append(xm.T)
    if x_src is not None:
        specs += [
            pl.BlockSpec((h, ci, _TILE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ]
        args += [x_src.transpose(0, 2, 1), tap]
    specs.append(pl.BlockSpec((co, _TILE), lambda i: (0, i),
                              memory_space=pltpu.VMEM))
    args.append(g.T)
    out = pl.pallas_call(
        functools.partial(
            _dw_kernel_t, k_taps=k_taps, tap_lo=tap_lo,
            has_center=xm is not None, has_slots=x_src is not None,
        ),
        grid=(vp // _TILE,),
        in_specs=specs,
        out_specs=pl.BlockSpec((co, k_taps * ci), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((co, k_taps * ci), jnp.float32),
    )(*args)
    return out.T


# ---------------------------------------------------------------------------
# XLA reference formulation (CPU / fp32-parity path) — identical band layout
# ---------------------------------------------------------------------------

def _build_e_xla(x_src, tap, k_taps):
    """Slot bands only — the center band is handled as its own (tiny)
    matmul: folding it in with a scatter-add on the (V, K, Ci) einsum
    output costs far more than it saves."""
    h, v, ci = x_src.shape
    onehot = jax.nn.one_hot(tap, k_taps, dtype=x_src.dtype)  # (H, V, K)
    e = jnp.einsum("hvk,hvc->vkc", onehot, x_src)
    return e.reshape(v, k_taps * ci)


def _apply_xla(xm, x_src, tap, weight):
    k_taps, ci, co = weight.shape
    dt = (xm if xm is not None else x_src).dtype
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    out = None
    if x_src is not None:
        e = _build_e_xla(x_src, tap, k_taps)
        out = jnp.dot(e, weight.reshape(k_taps * ci, co),
                      preferred_element_type=jnp.float32, precision=prec)
    if xm is not None:
        ctr = jnp.dot(xm, weight[_CENTER],
                      preferred_element_type=jnp.float32, precision=prec)
        out = ctr if out is None else out + ctr
    return out


def _dw_xla(xm, x_src, tap, g, k_taps):
    dt = (xm if xm is not None else x_src).dtype
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    ci = xm.shape[1] if xm is not None else x_src.shape[2]
    co = g.shape[-1]
    if x_src is not None:
        e = _build_e_xla(x_src, tap, k_taps)
        dw = jax.lax.dot_general(
            e, g.astype(dt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).reshape(k_taps, ci, co)
    else:
        dw = jnp.zeros((k_taps, ci, co), jnp.float32)
    if xm is not None:
        dw13 = jax.lax.dot_general(
            xm, g.astype(dt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dw = dw.at[_CENTER].add(dw13)
    return dw


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------

def slot_conv_apply(
    xm: Optional[jax.Array],
    x_src: Optional[jax.Array],
    tap: Optional[jax.Array],
    weight: jax.Array,
    tap_lo: int = 0,
) -> jax.Array:
    """sum_h x_src[h] @ weight[tap[h]]  (+ xm @ weight[13])  ->  (V, Co) fp32.

    Args:
      xm: (V, Ci) validity-masked center features, or None (overflow-table
        calls, where the center contribution lives in the phase-1 call).
        Only meaningful for 27-tap weights.
      x_src: (H, V, Ci) gathered slot features (empty slots = zero rows),
        or None for a center-only application.
      tap: (H, V) int32 band ids in [0, K); K marks an empty slot.
      weight: (K, Ci, Co) tap matrices — K = 27 for submanifold 3^3, 8 for
        the strided conv's child taps.
      tap_lo: static lower bound on tap[0] (overflow tables hold slots
        h_lo.. of the per-voxel hit sequence, so their taps start at h_lo).
    """
    k_taps, ci, co = weight.shape
    dt = (xm if xm is not None else x_src).dtype
    # ci % 8: Mosaic's sublane broadcast (the tap-mask select) only handles
    # sublane-aligned channel blocks — the Ci=3 input conv takes the XLA path
    if not _on_tpu() or dt == jnp.float32 or ci % 8:
        return _apply_xla(xm, x_src, tap, weight)
    wflat = weight.reshape(k_taps * ci, co).astype(dt)
    return _apply_pallas(xm, x_src, tap, wflat, k_taps, tap_lo)


def slot_conv_dw(
    xm: Optional[jax.Array],
    x_src: Optional[jax.Array],
    tap: Optional[jax.Array],
    g: jax.Array,
    k_taps: int = 27,
    tap_lo: int = 0,
) -> jax.Array:
    """Weight gradient of `slot_conv_apply` -> (K, Ci, Co) fp32 (row 13
    included iff `xm` was given)."""
    dt = (xm if xm is not None else x_src).dtype
    ci = xm.shape[1] if xm is not None else x_src.shape[2]
    if not _on_tpu() or dt == jnp.float32 or ci % 8:
        return _dw_xla(xm, x_src, tap, g, k_taps)
    dw = _dw_pallas(xm, x_src, tap, g.astype(dt), k_taps, tap_lo)
    return dw.reshape(k_taps, ci, -1)
