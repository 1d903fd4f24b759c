"""Pallas kernel: fused octree neighbor propagation + tier-1 slot build.

`ops.hierarchy.propagate_nbr` derives a fine level's 27-neighbor table from
the coarse level's by parity-driven selects over gathered child tables, and
`build_slots_tiered` then compacts that table into per-voxel hit slots.  As
XLA graphs these are ~350 tiny dependent (V,)-wide select/compare ops per
level — measured ~3.7 ms/level standalone at the flagship level-0 size,
~10x off the VPU roofline, because every op is a separate HBM-roundtripping
HLO (the descriptor-bound gathers that FEED them cost only ~2.1 ms).

This kernel fuses everything after the gathers into one VMEM pass per
512-voxel tile:

    for each tap k (ascending, center = trivial):
        col_k   = parity-select over the 8 gathered child-table candidates
        nbr[k]  = col_k
        slot[h] = col_k  where  hit(col_k) and running_count == h   (h < h1)
        count  += hit(col_k)

emitting the dense neighbor table, the tier-1 slot tables, and the per-voxel
hit count in one shot.  The mid/heavy overflow tiers need a global
compaction (cross-tile cumsum), so they stay in XLA — but they reuse the
`cnt` output instead of recounting, and tier-1 (the (h1, V)-sized bulk of
the work) never re-reads the dense table.

Semantics are pinned to `hierarchy.propagate_nbr` + `hierarchy._rank_slots`
(ascending-k slot order, center tap excluded, src miss = V, tap miss = 27);
parity is tested against them in tests/test_pallas.py.  Equivalent of the
rulebook construction inside SparseConvNet's C++ hash tables
(``/root/reference/.../3d_net/scn_unet.py:26-87``), restructured for the
TPU vector unit.
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 512
_CENTER = 13  # OFFSETS_27 index of (0, 0, 0)

# (dx, dy, dz) in lexicographic order — must match hierarchy.OFFSETS_27.
_OFFSETS = list(itertools.product((-1, 0, 1), repeat=3))


def _axis_sel(d: int, p: int):
    """Per-axis (parent-block index a, child slot s) for tap offset d
    (mirrors hierarchy.propagate_nbr.axis_sel)."""
    a = 0 if d == -1 else (1 if d == 1 else 1 - p)
    s = p if d == 0 else 1 - p
    return a, s


def _prop_kernel(crows_ref, par_ref, valid_ref,
                 nbr_ref, src_ref, tap_ref, cnt_ref, *, h1: int, vf: int):
    i = pl.program_id(0)
    t = nbr_ref.shape[1]
    rows = i * t + jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)

    parx = par_ref[0:1, :] == 1
    pary = par_ref[1:2, :] == 1
    parz = par_ref[2:3, :] == 1

    def tree(c):
        def m(b, c0, c1):
            return jnp.where(b, c1, c0)

        return m(
            parx,
            m(pary, m(parz, c[(0, 0, 0)], c[(0, 0, 1)]),
              m(parz, c[(0, 1, 0)], c[(0, 1, 1)])),
            m(pary, m(parz, c[(1, 0, 0)], c[(1, 0, 1)]),
              m(parz, c[(1, 1, 0)], c[(1, 1, 1)])),
        )

    miss_src = jnp.full((1, t), vf, jnp.int32)
    cnt = jnp.zeros((1, t), jnp.int32)
    srcs = [miss_src for _ in range(h1)]
    taps = [jnp.full((1, t), 27, jnp.int32) for _ in range(h1)]

    for k, (dx, dy, dz) in enumerate(_OFFSETS):
        if k == _CENTER:
            nbr_ref[k : k + 1, :] = jnp.where(
                valid_ref[0:1, :] != 0, rows, vf
            )
            continue
        cand = {}
        for px, py, pz in itertools.product((0, 1), repeat=3):
            ax, sx = _axis_sel(dx, px)
            ay, sy = _axis_sel(dy, py)
            az, sz = _axis_sel(dz, pz)
            blk = ax * 4 + ay * 2 + az
            slot = sx * 4 + sy * 2 + sz
            cand[(px, py, pz)] = crows_ref[blk, slot : slot + 1, :]
        col = tree(cand)
        nbr_ref[k : k + 1, :] = col
        hit = col != vf
        for h in range(h1):
            m = hit & (cnt == h)
            srcs[h] = jnp.where(m, col, srcs[h])
            taps[h] = jnp.where(m, k, taps[h])
        cnt = cnt + hit.astype(jnp.int32)

    src_ref[:] = jnp.concatenate(srcs, axis=0)
    tap_ref[:] = jnp.concatenate(taps, axis=0)
    cnt_ref[:] = cnt


@functools.partial(
    jax.jit, static_argnames=("h1", "vf", "interpret")
)
def propagate_slots_kernel(
    crows_t: jax.Array,  # (8, 8, Vp) gathered child-table candidates
    par: jax.Array,  # (3, Vp) int32 parity bits of the fine coords
    valid: jax.Array,  # (1, Vp) int32 fine-row validity
    h1: int,
    vf: int,
    interpret: bool = False,
):
    """Returns (nbr (27, Vp), src1 (h1, Vp), tap1 (h1, Vp), cnt (1, Vp)).

    Vp must be a multiple of the 512 tile (callers pad; padded columns must
    carry vf-sentinel candidates and valid = 0)."""
    vp = crows_t.shape[2]
    assert vp % _TILE == 0, vp
    grid = (vp // _TILE,)
    kernel = functools.partial(_prop_kernel, h1=h1, vf=vf)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, 8, _TILE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((27, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h1, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h1, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((27, vp), jnp.int32),
            jax.ShapeDtypeStruct((h1, vp), jnp.int32),
            jax.ShapeDtypeStruct((h1, vp), jnp.int32),
            jax.ShapeDtypeStruct((1, vp), jnp.int32),
        ],
        interpret=interpret,
    )(crows_t, par, valid)
