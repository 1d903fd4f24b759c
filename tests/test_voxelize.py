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


def test_presorted_voxelize_matches_sorted(rng):
    """voxelize(presorted=True) on host-Morton-sorted samples == the
    device-sorted path on the same (unsorted) points, table for table."""
    from mm2d3d_tpu.data.base import morton_sort_perm

    b, n, fs = 3, 256, 64
    coords = rng.randint(0, fs, size=(b, n, 3)).astype(np.int32)
    valid = rng.rand(b, n) < 0.85
    # host layout: per-sample morton sort, invalid at tails
    sc = np.empty_like(coords)
    sv = np.zeros_like(valid)
    for i in range(b):
        perm = morton_sort_perm(coords[i], valid[i], fs)
        sc[i] = coords[i][perm]
        sv[i] = valid[i][perm]
    bidx = np.repeat(np.arange(b, dtype=np.int32), n)

    g_ref = voxelize(jnp.asarray(coords.reshape(-1, 3)), jnp.asarray(bidx),
                     jnp.asarray(valid.reshape(-1)), fs)
    g_pre = voxelize(jnp.asarray(sc.reshape(-1, 3)), jnp.asarray(bidx),
                     jnp.asarray(sv.reshape(-1)), fs, presorted=True)
    assert int(g_ref.num_voxels) == int(g_pre.num_voxels)
    for field in ("key_hi", "key_lo", "coords", "batch", "valid", "counts"):
        np.testing.assert_array_equal(
            np.asarray(getattr(g_ref, field)), np.asarray(getattr(g_pre, field)),
            err_msg=field)
    # p2v maps each (permuted) point to the same voxel key
    k_ref = np.asarray(g_ref.key_lo)
    p2v_ref = np.asarray(g_ref.p2v).reshape(b, n)
    p2v_pre = np.asarray(g_pre.p2v).reshape(b, n)
    for i in range(b):
        perm = morton_sort_perm(coords[i], valid[i], fs)
        np.testing.assert_array_equal(p2v_ref[i][perm], p2v_pre[i])
    # THE CONTRACT, not just the semantics: every segment-op id sequence
    # must be nondecreasing, or indices_are_sorted=True silently corrupts
    # the table on TPU (CPU ignores the hint, so a values-only test cannot
    # catch it — this regression shipped a ~10x-collapsed hierarchy to the
    # TPU build while the whole CPU suite stayed green).
    for g in (g_ref, g_pre):
        seg = np.asarray(g.seg_sorted)
        assert (np.diff(seg) >= 0).all(), "seg_sorted must be monotone"
    # mode-4 pooling agrees (the presorted grid pools without any gather)
    feats = rng.randn(b, n, 3).astype(np.float32)
    sf = np.stack([feats[i][morton_sort_perm(coords[i], valid[i], fs)]
                   for i in range(b)])
    f_ref = pool_features(g_ref, jnp.asarray(feats.reshape(-1, 3)))
    f_pre = pool_features(g_pre, jnp.asarray(sf.reshape(-1, 3)))
    np.testing.assert_allclose(np.asarray(f_ref), np.asarray(f_pre),
                               rtol=1e-5, atol=1e-5)


def test_collate_sorts_and_records_perm(rng):
    """collate(full_scale=...) Morton-sorts each sample and point_perm
    restores the original order."""
    from mm2d3d_tpu.data.base import collate

    n_raw, n_pts, fs = 150, 256, 64
    samples = []
    for i in range(2):
        samples.append(dict(
            img=np.zeros((8, 8, 3), np.float32),
            depth=np.zeros((8, 8), np.float32),
            coords=rng.randint(0, fs, size=(n_raw, 3)).astype(np.int32),
            img_indices=rng.randint(0, 8, size=(n_raw, 2)).astype(np.int32),
            feats=rng.randn(n_raw, 3).astype(np.float32),
            seg_label=rng.randint(0, 5, size=(n_raw,)).astype(np.int32),
        ))
    batch = collate(samples, n_pts, full_scale=fs)
    assert batch.coords_sorted and batch.point_perm is not None
    from mm2d3d_tpu.ops import keys as K

    for i in range(2):
        hi, lo = K.pack(jnp.asarray(batch.coords[i]),
                        jnp.zeros((n_pts,), jnp.int32), fs)
        hi = np.asarray(hi)[np.asarray(batch.point_mask[i])]
        lo = np.asarray(lo)[np.asarray(batch.point_mask[i])]
        keys = list(zip(hi.tolist(), lo.tolist()))
        assert keys == sorted(keys), "valid rows not morton-sorted"
        # perm restores the original arrays
        perm = np.asarray(batch.point_perm[i])
        orig = np.empty_like(np.asarray(batch.feats[i]))
        orig[perm] = np.asarray(batch.feats[i])
        np.testing.assert_array_equal(orig[:n_raw], samples[i]["feats"])
