"""C++ host ops vs their device (jax) mirrors — must agree bit-for-bit."""

import jax
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


def test_native_slots_match_numpy_and_device(rng):
    """C++ build_slots_tiered == the numpy mirror == the device builder,
    on a random topology with heavy-tailed hit counts (clustered coords
    force many off-center neighbors)."""
    if not native.available():
        pytest.skip("native lib unavailable")
    from mm2d3d_tpu.data.host_topology import (
        _build_slots_split_np, _build_slots_tiered_np,
    )
    from mm2d3d_tpu.ops.hierarchy import build_slots_split, build_slots_tiered

    fs, cap = 32, 512
    coords = rng.randint(0, 12, (900, 3)).astype(np.int32)  # dense cluster
    bidx = np.zeros(900, np.int32)
    valid = np.ones(900, bool)
    vc, vb, _, _, nvox = native.voxelize_dedup(coords, bidx, valid, fs, cap)
    nbr_rows = native.build_nbr27(vc, vb, nvox, cap, fs)  # (cap, 27)
    nbr = np.ascontiguousarray(nbr_rows.T)  # tap-major, like the device

    h1, h2, h_max, vm, vh = 3, 6, 26, 96, 16
    got = native.build_slots_tiered(nbr_rows, h1, h2, h_max, vm, vh)
    ref = _build_slots_tiered_np(nbr, h1, h2, h_max, vm, vh)
    dev = jax.tree_util.tree_map(
        np.asarray, build_slots_tiered(jnp.asarray(nbr), h1, h2, h_max, vm, vh)
    )
    names = ["src1", "tap1", "idxm", "invm", "srcm", "tapm", "idxh",
             "srch", "taph", "dropped"]
    for name, g, r, d in zip(names, got, ref, dev):
        np.testing.assert_array_equal(g, r, err_msg=f"native-vs-numpy {name}")
        np.testing.assert_array_equal(g, d, err_msg=f"native-vs-device {name}")

    # 2-tier split through the same C++ entry (h2 == h_max, no far tier)
    s1, t1, idx, _, s2, t2, _, _, _, dropped = native.build_slots_tiered(
        nbr_rows, 4, 26, 26, 64, 0
    )
    ref2 = _build_slots_split_np(nbr, 4, 26, 64)
    dev2 = jax.tree_util.tree_map(
        np.asarray, build_slots_split(jnp.asarray(nbr), 4, 26, 64)
    )
    for name, g, r, d in zip(
        ["src1", "tap1", "idx", "src2", "tap2", "dropped"],
        (s1, t1, idx, s2, t2, dropped), ref2, dev2,
    ):
        np.testing.assert_array_equal(g, r, err_msg=f"split native-vs-np {name}")
        np.testing.assert_array_equal(g, d, err_msg=f"split native-vs-dev {name}")
