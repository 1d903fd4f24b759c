"""Voxelizer parity vs a brute-force numpy oracle.

Oracle semantics follow SparseConvNet InputLayer(mode=4)/OutputLayer
(`/root/reference/.../3d_net/scn_unet.py:113,117`): dedup integer coords,
average features per voxel, remember the point->voxel map.
"""

import jax.numpy as jnp
import numpy as np

from mm2d3d_tpu.ops.voxelize import voxelize, pool_features, unpool_features

FULL_SCALE = 64


def _morton(b, x, y, z):
    """Independent bit-by-bit (batch, morton) key for order checks."""
    b, x, y, z = int(b), int(x), int(y), int(z)
    m = 0
    for k in range(12):
        m |= ((z >> k) & 1) << (3 * k)
        m |= ((y >> k) & 1) << (3 * k + 1)
        m |= ((x >> k) & 1) << (3 * k + 2)
    return (b << 36) | m


def _oracle(coords, batch, valid, feats):
    """Returns morton-sorted unique sites, mean feats, per-point voxel key."""
    table = {}
    for i in range(len(coords)):
        if not valid[i]:
            continue
        key = (batch[i], *coords[i])
        table.setdefault(key, []).append(feats[i])
    skeys = sorted(table.keys(), key=lambda k: _morton(*k))
    means = np.stack([np.mean(table[k], axis=0) for k in skeys]) if skeys else np.zeros((0, feats.shape[1]))
    return skeys, means


def _rand_points(rng, p, b, c, frac_valid=0.8, dup_frac=0.5):
    coords = rng.randint(0, FULL_SCALE, size=(p, 3)).astype(np.int32)
    # force duplicates
    ndup = int(p * dup_frac)
    coords[p - ndup :] = coords[rng.randint(0, p - ndup, ndup)]
    batch = rng.randint(0, b, size=(p,)).astype(np.int32)
    valid = rng.rand(p) < frac_valid
    feats = rng.randn(p, c).astype(np.float32)
    return coords, batch, valid, feats


def test_voxelize_matches_oracle(rng):
    p, b, c = 257, 3, 4
    coords, batch, valid, feats = _rand_points(rng, p, b, c)
    grid = voxelize(jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid), FULL_SCALE)

    skeys, means = _oracle(coords, batch, valid, feats)
    nvox = int(grid.num_voxels)
    assert nvox == len(skeys)

    got_keys = [
        (int(grid.batch[i]), *map(int, grid.coords[i])) for i in range(nvox)
    ]
    assert got_keys == skeys  # sorted table order

    pooled = np.asarray(pool_features(grid, jnp.asarray(feats)))
    np.testing.assert_allclose(pooled[:nvox], means, rtol=1e-5, atol=1e-5)

    # padding rows are zero / invalid
    assert not np.any(np.asarray(grid.valid)[nvox:])
    np.testing.assert_array_equal(pooled[nvox:], 0.0)

    # p2v maps each valid point to the row with its coords
    p2v = np.asarray(grid.p2v)
    gcoords = np.asarray(grid.coords)
    gbatch = np.asarray(grid.batch)
    for i in range(p):
        if valid[i]:
            r = p2v[i]
            assert r < nvox
            assert tuple(gcoords[r]) == tuple(coords[i]) and gbatch[r] == batch[i]
        else:
            assert p2v[i] == grid.capacity


def test_unpool_roundtrip(rng):
    p, b, c = 128, 2, 5
    coords, batch, valid, feats = _rand_points(rng, p, b, c, dup_frac=0.0)
    grid = voxelize(jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid), FULL_SCALE)
    pooled = pool_features(grid, jnp.asarray(feats))
    back = np.asarray(unpool_features(grid, pooled))
    # with no duplicates, mean == original feature for valid points
    np.testing.assert_allclose(back[valid], feats[valid], rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(back[~valid], 0.0)


def test_out_of_range_points_dropped(rng):
    coords = np.array([[0, 0, 0], [FULL_SCALE, 0, 0], [-1, 2, 3], [5, 5, 5]], np.int32)
    batch = np.zeros(4, np.int32)
    valid = np.ones(4, bool)
    grid = voxelize(jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid), FULL_SCALE)
    assert int(grid.num_voxels) == 2
    p2v = np.asarray(grid.p2v)
    assert p2v[1] == grid.capacity and p2v[2] == grid.capacity


def test_capacity_overflow_drops_extras(rng):
    p = 64
    coords = np.stack([np.arange(p), np.zeros(p), np.zeros(p)], 1).astype(np.int32)
    batch = np.zeros(p, np.int32)
    valid = np.ones(p, bool)
    grid = voxelize(jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid), FULL_SCALE, capacity=16)
    assert int(grid.num_voxels) == 16
    p2v = np.asarray(grid.p2v)
    assert np.sum(p2v == 16) == p - 16  # overflow points -> dump row
