"""Fused 2D head: conv3x3 -> crop -> 5x5 avg-pool in one Pallas kernel.

The composed head of the 2D branch (``models.net2d``: dec_conv_stage1
composed with the two linear 1x1 heads, reference
``2d_net/model.py:104-180``) produces only 2 * num_classes channels at full
resolution.  In plain XLA every materialization of that narrow tensor pays
the TPU's minor-dim lane padding (12 -> 128, ~10.7x HBM amplification), and
the 5x5 pool's shifted reads multiply that traffic — measured ~2.6-3.3 ms
of the fused forward at the flagship size for ~0.4 ms of math.

This kernel streams H-strips of the three 64-channel inputs through VMEM:

    y9   = concat(x0, x1, x2) @ w9          # one matmul, N = 9 * C2 lanes
    y    = sum_t shift_t(y9[..., t-block])  # 3x3 tap reduction, in VMEM
    y    = crop(y + b12, h_real, w_real)    # rows/cols outside -> 0
    out  = avg_pool5x5(y)                   # separable shift-adds, in VMEM

and writes the pooled (B, H, W, C2) result once.  The write still pays the
minor-dim lane padding (a packed layout would avoid it, but Mosaic cannot
lane-concat sub-128 pieces), yet all INTERMEDIATE full-res tensors stay in
VMEM — the XLA formulation materializes several of them padded.

Halo handling: each grid step receives its 16-row main block plus 8-row
prev/next halo blocks of every input (three BlockSpecs per input; boundary
blocks are clamped and masked in-kernel), so strips overlap in reads
without any HBM-side padding copy.

Equivalence: bf16 inputs, fp32 accumulation — same numeric class as the
XLA conv path it replaces (`_head_pool_ref`, kept for CPU/fp32 parity and
as the custom-VJP backward).

STATUS — opt-in, default OFF (``MM2D3D_PALLAS_HEAD=1``).  Standalone the
kernel wins 2x (6.5 vs 12.4 ms at the flagship head size, fed
materialized inputs), but in the fused forward it LOSES 199 -> 162
scans/s: the three (B, 240, 400, 64) bf16 decoder-tail inputs (~98 MB
each at batch 8) must fully materialize in HBM to serve the kernel's
halo BlockSpecs, and each is read ~2x (main + halo blocks), while the
XLA path lets the producers fuse/stream into the conv.  Another instance
of the repo-wide lesson: standalone kernel wins do not transfer when
they break producer fusion (PERFORMANCE.md, negative results).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_STRIP = 16  # pooled output rows per grid step
_HALO = 8  # halo block rows (covers conv + pool reach of 3)


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def supports(hp: int, wp: int, h_real: int, w_real: int, c2: int) -> bool:
    """Static-shape conditions for the fused kernel.

    The strip BlockSpec walks ``hp`` in 16-row steps and the output crop
    slices ``[:h_real, :w_real]``, so the real extents must fit inside the
    padded ones — otherwise the main block would index past the input."""
    return (
        hp % _STRIP == 0
        and c2 >= 8
        and 0 < h_real <= hp
        and 0 < w_real <= wp
    )


def _kernel(*refs, hp, wp, h_real, w_real, c2, cins):
    (x_blocks, w_ref, b_ref, o_ref) = (refs[:-3], refs[-3], refs[-2], refs[-1])
    s = pl.program_id(1)
    n_in = len(cins)
    # assemble the 32-row (prev 8 | main 16 | next 8) strip per input,
    # flattened to (rows * wp, cin) for the matmul
    rows = 2 * _HALO + _STRIP

    # conv rows needed: a in [0, 24) <-> global g = STRIP*s - 4 + a reads
    # input rows g-1..g+1 = local rows [a+3, a+5] of the 32-row strip
    # (local row l <-> global STRIP*s - 8 + l).
    y9 = None
    for i in range(n_in):
        prev_r, main_r, next_r = x_blocks[3 * i : 3 * i + 3]
        x = jnp.concatenate(
            [prev_r[0], main_r[0], next_r[0]], axis=0
        )  # (32, wp, cin)
        # zero rows whose true global row is outside [0, hp) (clamped
        # boundary halo blocks deliver wrong-but-masked data)
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
        g_row = _STRIP * s - _HALO + l_iota
        x = jnp.where((g_row >= 0) & (g_row < hp), x, 0)
        xs = x[4:28]  # conv input rows for y9 rows a in [0, 24)
        w_i = w_ref[sum(cins[:i]) : sum(cins[: i + 1])]  # (cin, 9 * c2)
        part = jax.lax.dot_general(
            xs.reshape(24 * wp, cins[i]), w_i,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y9 = part if y9 is None else y9 + part
    y9 = y9.reshape(24, wp, 9 * c2)

    # 3x3 tap reduction -> conv output rows m in [0, 20), global
    # c = STRIP*s - 2 + m.  Conv row c tap (di, dj) reads input row
    # c - 1 + di = y9 row a = m + 1 + di, col j - 1 + dj.
    zcol = jnp.zeros((24, 1, 9 * c2), jnp.float32)
    y9p = jnp.concatenate([zcol, y9, zcol], axis=1)  # (24, wp + 2, 9c2)
    y12 = None
    for t in range(9):
        di, dj = t // 3, t % 3
        sl = y9p[di + 1 : di + 21, dj : dj + wp, t * c2 : (t + 1) * c2]
        y12 = sl if y12 is None else y12 + sl
    y12 = y12 + b_ref[0][None, None, :]

    # crop: conv rows/cols outside [0, h_real) x [0, w_real) are zero for
    # the pool
    m_iota = jax.lax.broadcasted_iota(jnp.int32, (20, 1, 1), 0)
    c_row = _STRIP * s - 2 + m_iota
    keep = (c_row >= 0) & (c_row < h_real)
    if w_real < wp:
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (1, wp, 1), 1)
        keep = keep & (w_iota < w_real)
    y12 = jnp.where(keep, y12, 0.0)

    # separable 5x5 sum: rows first (pooled row p reads y12 rows p..p+4),
    # then cols with zero padding
    hsum = (
        y12[0:_STRIP] + y12[1 : _STRIP + 1] + y12[2 : _STRIP + 2]
        + y12[3 : _STRIP + 3] + y12[4 : _STRIP + 4]
    )  # (16, wp, c2)
    zc2 = jnp.zeros((_STRIP, 2, c2), jnp.float32)
    hp2 = jnp.concatenate([zc2, hsum, zc2], axis=1)  # (16, wp + 4, c2)
    pooled = (
        hp2[:, 0:wp] + hp2[:, 1 : wp + 1] + hp2[:, 2 : wp + 2]
        + hp2[:, 3 : wp + 3] + hp2[:, 4 : wp + 4]
    ) * (1.0 / 25.0)

    o_ref[0] = pooled


def _head_pool_pallas(
    inputs, w9, b12, hp, wp, h_real, w_real, c2, interpret=False
):
    b = inputs[0].shape[0]
    cins = tuple(x.shape[-1] for x in inputs)
    n_strips = -(-h_real // _STRIP)
    n_hblocks = hp // _HALO

    in_specs = []
    args = []
    for x in inputs:
        cin = x.shape[-1]
        in_specs += [
            pl.BlockSpec(
                (1, _HALO, wp, cin),
                lambda bi, si: (bi, jnp.maximum(2 * si - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, _STRIP, wp, cin),
                lambda bi, si: (bi, si, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, _HALO, wp, cin),
                lambda bi, si: (
                    bi, jnp.minimum(2 * si + 2, n_hblocks - 1), 0, 0
                ),
                memory_space=pltpu.VMEM,
            ),
        ]
        args.append(x)
    in_specs += [
        pl.BlockSpec((sum(cins), 9 * c2), lambda bi, si: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c2), lambda bi, si: (0, 0),
                     memory_space=pltpu.VMEM),
    ]

    out = pl.pallas_call(
        functools.partial(
            _kernel, hp=hp, wp=wp, h_real=h_real, w_real=w_real, c2=c2,
            cins=cins,
        ),
        grid=(b, n_strips),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, _STRIP, wp, c2),
            lambda bi, si: (bi, si, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, n_strips * _STRIP, wp, c2), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,  # CPU parity tests (tests/test_pallas.py)
    )(*[a for triple in ([x, x, x] for x in args) for a in triple],
      w9, b12[None])
    return out[:, :h_real, :w_real, :]


def _head_pool_ref(inputs, w12, b12, h_real, w_real, compute_dtype):
    """XLA reference: conv + bias, crop, 5x5 count-include-pad avg pool."""
    x_cat = jnp.concatenate(inputs, axis=-1)
    prec = (jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    y = jax.lax.conv_general_dilated(
        x_cat.astype(compute_dtype), w12.astype(compute_dtype), (1, 1),
        "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec,
    ).astype(jnp.float32) + b12
    y = y[:, :h_real, :w_real, :]

    def shift_sum5(t, axis):
        n = t.shape[axis]
        padc = [(0, 0)] * t.ndim
        padc[axis] = (2, 2)
        tp = jnp.pad(t, padc)
        o = jax.lax.slice_in_dim(tp, 0, n, axis=axis)
        for d in range(1, 5):
            o = o + jax.lax.slice_in_dim(tp, d, d + n, axis=axis)
        return o

    return shift_sum5(shift_sum5(y, 1), 2) * (1.0 / 25.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _head_pool(xs, w12, b12, h_real, w_real, compute_dtype):
    inputs = list(xs)
    hp, wp = inputs[0].shape[1], inputs[0].shape[2]
    c2 = w12.shape[-1]
    if (
        _on_tpu()
        and compute_dtype != jnp.float32
        and supports(hp, wp, h_real, w_real, c2)
    ):
        w9 = jnp.concatenate(
            [w12[i, j] for i in range(3) for j in range(3)], axis=-1
        ).astype(compute_dtype)  # (cin_total, 9 * c2)
        return _head_pool_pallas(
            [x.astype(compute_dtype) for x in inputs], w9,
            b12.astype(jnp.float32), hp, wp, h_real, w_real, c2,
        )
    return _head_pool_ref(inputs, w12, b12, h_real, w_real, compute_dtype)


def _head_pool_fwd(xs, w12, b12, h_real, w_real, compute_dtype):
    out = _head_pool(xs, w12, b12, h_real, w_real, compute_dtype)
    return out, (xs, w12, b12)


def _head_pool_bwd(h_real, w_real, compute_dtype, res, g):
    xs, w12, b12 = res
    _, vjp = jax.vjp(
        lambda xs_, w_, b_: _head_pool_ref(
            list(xs_), w_, b_, h_real, w_real, compute_dtype
        ),
        xs, w12, b12,
    )
    return vjp(g)


_head_pool.defvjp(_head_pool_fwd, _head_pool_bwd)


def head_pool(
    inputs: Sequence[jax.Array],  # each (B, Hp, Wp, Ci)
    w12: jax.Array,  # (3, 3, sum(Ci), C2)
    b12: jax.Array,  # (C2,) pre-pool bias
    h_real: int,
    w_real: int,
    compute_dtype=jnp.bfloat16,
):
    """Fused conv3x3 + crop + 5x5 avg-pool of the composed 2D head.

    Returns (B, h_real, w_real, C2) fp32."""
    return _head_pool(tuple(inputs), w12, b12, h_real, w_real, compute_dtype)
