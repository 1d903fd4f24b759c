"""C++ host ops vs their device (jax) mirrors — must agree bit-for-bit."""

import jax.numpy as jnp
import numpy as np
import pytest

from mm2d3d_tpu import native
from mm2d3d_tpu.ops.hierarchy import build_hierarchy
from mm2d3d_tpu.ops.voxelize import voxelize

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)

FULL_SCALE = 64


def _points(rng, p=400, b=2):
    coords = rng.randint(0, FULL_SCALE, (p, 3)).astype(np.int32)
    coords[p // 2 :] = np.clip(
        coords[rng.randint(0, p // 2, p - p // 2)]
        + rng.randint(-1, 2, (p - p // 2, 3)),
        0, FULL_SCALE - 1,
    )
    batch = rng.randint(0, b, (p,)).astype(np.int32)
    valid = (rng.rand(p) < 0.9).astype(np.uint8)
    return coords, batch, valid


def test_voxelize_matches_device(rng):
    coords, batch, valid = _points(rng)
    cap = len(coords)
    vc, vb, p2v, counts, nvox = native.voxelize_dedup(
        coords, batch, valid, FULL_SCALE, cap
    )
    grid = voxelize(
        jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid.astype(bool)),
        FULL_SCALE, capacity=cap,
    )
    assert nvox == int(grid.num_voxels)
    np.testing.assert_array_equal(vc[:nvox], np.asarray(grid.coords)[:nvox])
    np.testing.assert_array_equal(vb[:nvox], np.asarray(grid.batch)[:nvox])
    np.testing.assert_array_equal(p2v, np.asarray(grid.p2v))
    np.testing.assert_array_equal(counts[:nvox], np.asarray(grid.counts)[:nvox])


def test_nbr_and_transition_match_device(rng):
    coords, batch, valid = _points(rng)
    cap = len(coords)
    grid = voxelize(
        jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid.astype(bool)),
        FULL_SCALE, capacity=cap,
    )
    hier = build_hierarchy(grid, num_levels=2)
    nvox = int(grid.num_voxels)

    vc = np.asarray(grid.coords)
    vb = np.asarray(grid.batch)
    nbr = native.build_nbr27(vc, vb, nvox, cap, FULL_SCALE)
    np.testing.assert_array_equal(nbr, np.asarray(hier.levels[0].nbr).T)

    lvl1 = hier.levels[1]
    nvox1 = int(lvl1.num_voxels)
    parent, off_id, child = native.build_transition(
        vc, vb, nvox, cap,
        np.asarray(lvl1.coords), np.asarray(lvl1.batch), nvox1, lvl1.capacity,
        FULL_SCALE // 2,
    )
    t = hier.transitions[0]
    np.testing.assert_array_equal(parent[:nvox], np.asarray(t.parent)[:nvox])
    np.testing.assert_array_equal(off_id[:nvox], np.asarray(t.off_id)[:nvox])
    np.testing.assert_array_equal(child, np.asarray(t.child))


def test_image_ops(rng):
    img = (rng.rand(30, 40, 3) * 255).astype(np.uint8)
    out = native.bilinear_resize(img, (15, 20))
    from mm2d3d_tpu.data.augment import bilinear_resize as np_resize

    ref = np_resize(img, (15, 20))
    np.testing.assert_allclose(out, ref, atol=1e-3)

    idx = np.stack([rng.randint(0, 15, 50), rng.randint(0, 20, 50)], 1).astype(np.int64)
    depths = rng.rand(50).astype(np.float32)
    labels = rng.randint(0, 6, 50).astype(np.int64)
    dm, lm = native.depth_label_maps(idx, depths, labels, (15, 20))
    from mm2d3d_tpu.data.augment import build_depth_and_label_maps

    dm_ref, lm_ref = build_depth_and_label_maps(idx, depths, labels, (15, 20))
    np.testing.assert_allclose(dm, dm_ref)
    np.testing.assert_array_equal(lm, lm_ref)
