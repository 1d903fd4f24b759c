"""Pallas kernel: fused per-tap matmul-accumulate for sparse convolutions.

Computes ``out[v] = sum_k g[k, v] @ w[k]`` for the gathered tap tensor
``g (K, V, Cin)`` and tap weights ``w (K, Cin, Cout)``.

Why a kernel: XLA lowers this contraction to a batched matmul that
MATERIALIZES the (K, V, Cout) per-tap products in HBM plus a reduction pass
(~2 x K x V x Cout x 4B of traffic).  This kernel keeps the accumulator in
VMEM: each V-tile streams its K taps through the MXU and writes only the
(V, Cout) result — K x less HBM write traffic on the conv hot path.

Notes:
- A Pallas kernel for the GATHER itself was evaluated and rejected: Mosaic's
  VMEM dynamic gather requires index shape == operand shape, and HBM random
  access is hardware-bound (~2ns/row) regardless of who issues it.  XLA's
  native gather feeds this kernel instead.
- Falls back to the pure-XLA formulation on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 512


def _xla_tapsum(g: jax.Array, w: jax.Array, precision) -> jax.Array:
    taps = jax.lax.dot_general(
        g, w,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return jnp.sum(taps, axis=0)


def _kernel(g_ref, w_ref, o_ref, *, k_taps: int):
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for k in range(k_taps):
        acc += jnp.dot(
            g_ref[k], w_ref[k], preferred_element_type=jnp.float32
        )
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("tile",))
def _tapsum_pallas(g: jax.Array, w: jax.Array, tile: int) -> jax.Array:
    k_taps, v, cin = g.shape
    cout = w.shape[-1]
    grid = (v // tile,)
    return pl.pallas_call(
        functools.partial(_kernel, k_taps=k_taps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((k_taps, tile, cin), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_taps, cin, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((v, cout), jnp.float32),
    )(g, w)


def _use_pallas() -> bool:
    # Measured on v5e: the Pallas kernel matches XLA at level 0 (isolated:
    # 1.54 vs 1.61 ms) but loses ~7% end-to-end across the U-Net's deeper
    # levels (smaller V tiles, wider channels), because XLA already fuses
    # the tap reduction without materializing the (K, V, Cout) intermediate
    # on this toolchain.  Kept selectable for toolchains where it wins.
    import os

    return os.environ.get("MM2D3D_USE_PALLAS_TAPSUM") == "1"


def tapsum(g: jax.Array, w: jax.Array, precision=None) -> jax.Array:
    """sum_k g[k] @ w[k] -> (V, Cout) fp32; optional Pallas kernel on TPU."""
    k_taps, v, cin = g.shape
    on_tpu = jax.default_backend() in ("tpu", "axon")
    tile = DEFAULT_TILE
    if (
        not on_tpu
        or v % tile != 0
        or g.dtype == jnp.float32
        or not _use_pallas()
    ):
        # fp32 path keeps HIGHEST-precision XLA matmuls (parity/testing)
        return _xla_tapsum(
            g, w,
            jax.lax.Precision.HIGHEST
            if g.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT,
        )
    return _tapsum_pallas(g, w, tile)
