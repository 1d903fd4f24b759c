"""Pallas kernel: 3x3 stride-2 max pool (the ResNet stem pool).

XLA's reduce_window on the (B, 240, 400, 64) bf16 stem output measures
~3.3 ms per encoder — ~6x off the memory roofline for a 98 MB read /
25 MB write op — and the round-2 shift-max/stride-slice rewrites lost
even harder by breaking fusion around the stem (PERFORMANCE.md).  The
stem output must materialize in HBM regardless (it doubles as the
stride-1 decoder skip), so a strip-mined VMEM kernel can read it once at
full bandwidth without disturbing the surrounding fusions.

Separable max over a halo strip: each grid step owns 8 output rows,
reading its 18-row input window as two 16-row blocks of the (-inf)-padded
input (overlapping BlockSpecs of the same operand — Pallas allows aliased
reads).  Vertical 3-max with stride 2 via sublane reshapes, then the same
trick along W.

Backward stays XLA's select-and-scatter (first-argmax semantics, torch
parity): `maxpool3x3s2` wraps the kernel in a custom_vjp whose bwd is the
autodiff of the lax.reduce_window reference — x is the residual, so the
forward is never recomputed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8  # output rows per grid step


def _ref_pool(x: jax.Array) -> jax.Array:
    """lax.reduce_window reference (torch MaxPool2d(3, 2, 1) semantics)."""
    # NB: -inf (not finfo.min) — jax only special-cases reduce_window with
    # a -inf init as the differentiable max pool (select-and-scatter VJP)
    neg = (
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
        else jnp.iinfo(x.dtype).min
    )
    return jax.lax.reduce_window(
        x, neg, jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def _kernel(xa_ref, xb_ref, xc_ref, o_ref):
    # rows [0, 18) of this strip's padded input window arrive as three
    # 8-row blocks, pre-flattened to (8, Wp*C): the lane dimension stays
    # full (a (rows, Wp, 64) layout pads 64 -> 128 lanes and doubles every
    # intermediate — that blew the scoped-VMEM budget) and every op here is
    # sublane-only (Mosaic cannot unflatten lanes, so the W-stride-2 stage
    # lives in XLA on the 2.3x-smaller vertical output).  Strided slices
    # are avoided (reshape-and-index instead).
    rows = jnp.concatenate([xa_ref[0], xb_ref[0], xc_ref[0][:2]], axis=0)
    n = rows.shape[-1]
    ev = rows[0:16].reshape(8, 2, n).max(axis=1)  # max(r[2i], r[2i+1])
    r2 = rows[2:18].reshape(8, 2, n)[:, 0]  # r[2i + 2]
    o_ref[0] = jnp.maximum(ev, r2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pool_pallas(x: jax.Array, interpret: bool = False) -> jax.Array:
    b, h, w, c = x.shape
    ho, wo = (h + 1) // 2, (w + 1) // 2
    neg = jnp.finfo(x.dtype).min
    # pad: 1 leading row/col, plus enough trailing rows that every 18-row
    # window stays in bounds at 8-row block granularity
    n_strips = -(-ho // _ROWS)
    # strip j reads 8-row blocks {2j, 2j+1, 2j+2} = padded rows [16j, 16j+24)
    hp = 16 * n_strips + 8
    wp = 2 * wo + 2
    xpad = jnp.full((b, hp, wp, c), neg, x.dtype)
    xpad = jax.lax.dynamic_update_slice(xpad, x, (0, 1, 1, 0))
    # flatten (Wp, C) onto lanes for the row stage (see _kernel)
    xflat = xpad.reshape(b, hp, wp * c)

    row_spec = lambda off: pl.BlockSpec(  # noqa: E731
        (1, 8, wp * c), lambda i, j, off=off: (i, 2 * j + off, 0),
        memory_space=pltpu.VMEM,
    )
    v = pl.pallas_call(
        _kernel,
        grid=(b, n_strips),
        in_specs=[row_spec(0), row_spec(1), row_spec(2)],
        out_specs=pl.BlockSpec((1, _ROWS, wp * c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_strips * _ROWS, wp * c), x.dtype),
        interpret=interpret,
    )(xflat, xflat, xflat)
    # horizontal stage in XLA on the vertical output (2x fewer rows):
    # out[j] = max(v[2j], v[2j+1], v[2j+2])
    v = v[:, :ho].reshape(b, ho, wp, c)
    pair = v[:, :, : 2 * wo].reshape(b, ho, wo, 2, c).max(axis=3)
    v2 = v[:, :, 2 : 2 * wo + 2].reshape(b, ho, wo, 2, c)[:, :, :, 0]
    return jnp.maximum(pair, v2)


def _use_pallas(x) -> bool:
    return (
        jax.default_backend() in ("tpu", "axon")
        and x.dtype == jnp.bfloat16
        and x.shape[-1] % 8 == 0
    )


@jax.custom_vjp
def maxpool3x3s2(x: jax.Array) -> jax.Array:
    """3x3 stride-2 pad-1 max pool; Pallas forward on TPU bf16, XLA
    select-and-scatter backward (exact reduce_window adjoint)."""
    if _use_pallas(x):
        return _pool_pallas(x)
    return _ref_pool(x)


def _fwd(x):
    return maxpool3x3s2(x), x


def _bwd(x, g):
    # the reduce_window VJP consumes (x, g) via select-and-scatter-add; the
    # forward pool is NOT recomputed (x itself is the residual)
    _, vjp = jax.vjp(_ref_pool, x)
    return (vjp(g)[0],)


maxpool3x3s2.defvjp(_fwd, _bwd)
