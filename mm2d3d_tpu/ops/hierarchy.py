"""Sparse-grid hierarchy: per-level voxel tables + static rulebooks.

TPU-native replacement for SparseConvNet's per-layer hash-map/rulebook
machinery (`scn.SubmanifoldConvolution` / `scn.Convolution` /
`scn.Deconvolution`, cf.
``/root/reference/experiments_*/rgbd_rgbxyz_sigmoid_for_rgb/3d_net/scn_unet.py:26-87``).

Key design idea: all irregular index computation is hoisted into ONE
hierarchy build per step.  Each U-Net level gets

- a sorted voxel table (``GridLevel``),
- a 27-neighbor index table ``nbr`` (V, 27) shared by every submanifold
  conv at that level (SCN rebuilds its rulebook per layer; here it is
  computed once and reused), and
- parent/child maps between adjacent levels for the strided conv /
  deconv pair (``LevelTransition``).

The convolutions themselves (`ops.spconv`) are then pure dense
gather->matmul ops that XLA maps onto the MXU.
"""

from __future__ import annotations

import itertools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import keys as K
from .voxelize import VoxelGrid, voxelize

# Fixed kernel-offset orderings (define the weight layouts of spconv ops).
OFFSETS_27 = np.array(
    list(itertools.product((-1, 0, 1), repeat=3)), dtype=np.int32
)  # (27, 3), lexicographic; index 13 is the center (0,0,0)
OFFSETS_8 = np.array(
    list(itertools.product((0, 1), repeat=3)), dtype=np.int32
)  # (8, 3); off_id = 4*dx + 2*dy + dz


@struct.dataclass
class GridLevel:
    key_hi: jax.Array  # (V,) int32 sorted pair keys
    key_lo: jax.Array  # (V,) int32
    coords: jax.Array  # (V, 3) int32
    batch: jax.Array  # (V,) int32
    valid: jax.Array  # (V,) bool
    num_voxels: jax.Array  # () int32
    nbr: jax.Array  # (V, 27) int32 in [0, V]; V = missing neighbor
    full_scale: int = struct.field(pytree_node=False)

    @property
    def capacity(self) -> int:
        return self.key_hi.shape[0]


@struct.dataclass
class LevelTransition:
    """Maps between a fine level (f) and the next coarser level (c)."""

    parent: jax.Array  # (Vf,) int32 in [0, Vc]; Vc = dump for invalid rows
    off_id: jax.Array  # (Vf,) int32 in [0, 8); child offset within parent
    child: jax.Array  # (Vc, 8) int32 in [0, Vf]; Vf = missing child


@struct.dataclass
class Hierarchy:
    levels: Tuple[GridLevel, ...]
    transitions: Tuple[LevelTransition, ...]  # len = len(levels) - 1


def build_nbr(grid: VoxelGrid) -> jax.Array:
    """27-neighbor index table for submanifold 3x3x3 convolution."""
    v = grid.capacity
    fs = grid.full_scale
    offs = jnp.asarray(OFFSETS_27)
    qc = grid.coords[:, None, :] + offs[None, :, :]  # (V, 27, 3)
    ok = (
        grid.valid[:, None]
        & (qc >= 0).all(-1)
        & (qc < fs).all(-1)
    )
    hi_q = grid.batch[:, None] * fs + qc[..., 0]
    lo_q = qc[..., 1] * fs + qc[..., 2]
    hi_q, lo_q = K.mask_invalid(hi_q, lo_q, ok)
    nbr = K.lookup_pairs(
        grid.key_hi, grid.key_lo, hi_q.reshape(-1), lo_q.reshape(-1), missing=v
    ).reshape(v, 27)
    return nbr


def _level_from_grid(grid: VoxelGrid) -> GridLevel:
    return GridLevel(
        key_hi=grid.key_hi,
        key_lo=grid.key_lo,
        coords=grid.coords,
        batch=grid.batch,
        valid=grid.valid,
        num_voxels=grid.num_voxels,
        nbr=build_nbr(grid),
        full_scale=grid.full_scale,
    )


def coarsen(level: GridLevel, capacity: Optional[int] = None):
    """Build the next-coarser level (stride-2, filter-2 downsample sites).

    A coarse site exists iff it has >= 1 active fine child — exactly the
    active-site rule of ``scn.Convolution(3, a, b, 2, 2, False)``.
    """
    vf = level.capacity
    coarse_coords = level.coords >> 1
    grid_c = voxelize(
        coarse_coords,
        level.batch,
        level.valid,
        level.full_scale // 2,
        capacity=capacity,
    )
    vc = grid_c.capacity
    parent = grid_c.p2v  # (Vf,) in [0, Vc]
    rel = level.coords & 1
    off_id = rel[:, 0] * 4 + rel[:, 1] * 2 + rel[:, 2]

    child = jnp.full((vc + 1, 8), vf, jnp.int32)
    child = child.at[parent, off_id].set(jnp.arange(vf, dtype=jnp.int32))[:vc]

    trans = LevelTransition(parent=parent, off_id=off_id, child=child)
    return _level_from_grid(grid_c), trans


def build_hierarchy(
    grid: VoxelGrid,
    num_levels: int,
    capacities: Optional[Sequence[int]] = None,
) -> Hierarchy:
    """Build all U-Net levels from the level-0 voxel grid.

    Args:
      grid: output of `ops.voxelize.voxelize` at full resolution.
      num_levels: number of U-Net levels (reference: num_planes = 7).
      capacities: per-level row capacities (len num_levels); defaults to the
        level-0 capacity everywhere (safe but not the cheapest).
    """
    levels = [_level_from_grid(grid)]
    transitions = []
    for l in range(1, num_levels):
        cap = capacities[l] if capacities is not None else None
        lvl, trans = coarsen(levels[-1], capacity=cap)
        levels.append(lvl)
        transitions.append(trans)
    return Hierarchy(levels=tuple(levels), transitions=tuple(transitions))
