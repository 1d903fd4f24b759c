"""Sparse conv ops vs brute-force numpy oracles.

Oracle semantics follow SparseConvNet:
- SubmanifoldConvolution(3, a, b, 3, False): output at active sites only,
  summing W_k @ f[site + off_k] over active neighbors.
- Convolution(3, a, b, 2, 2, False): coarse site active iff >=1 active child;
  output sums over its active children's taps.
- Deconvolution(3, a, b, 2, 2, False): restores fine sites; each fine site
  reads its parent through its tap matrix.
(cf. /root/reference/.../3d_net/scn_unet.py:26-87)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm2d3d_tpu.ops.hierarchy import (
    OFFSETS_8,
    OFFSETS_27,
    build_hierarchy,
)
from mm2d3d_tpu.ops.spconv import down_conv2, subm_conv3, up_conv2
from mm2d3d_tpu.ops.voxelize import voxelize

FULL_SCALE = 32


def _setup(rng, p=200, b=2, cin=6):
    coords = rng.randint(0, FULL_SCALE, size=(p, 3)).astype(np.int32)
    # cluster points so neighbors actually exist
    coords[p // 2 :] = np.clip(
        coords[rng.randint(0, p // 2, p - p // 2)]
        + rng.randint(-1, 2, (p - p // 2, 3)),
        0,
        FULL_SCALE - 1,
    )
    batch = rng.randint(0, b, size=(p,)).astype(np.int32)
    valid = rng.rand(p) < 0.9
    grid = voxelize(jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid), FULL_SCALE)
    hier = build_hierarchy(grid, num_levels=3)
    lvl0 = hier.levels[0]
    nvox = int(lvl0.num_voxels)
    feats = rng.randn(lvl0.capacity, cin).astype(np.float32)
    feats[nvox:] = 0.0
    return hier, feats, nvox


def _sites(level):
    n = int(level.num_voxels)
    c = np.asarray(level.coords)[:n]
    b = np.asarray(level.batch)[:n]
    return {(b[i], *c[i]): i for i in range(n)}


def test_subm_conv_oracle(rng):
    hier, feats, nvox = _setup(rng)
    lvl = hier.levels[0]
    cin, cout = feats.shape[1], 5
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.1

    out = np.asarray(subm_conv3(jnp.asarray(feats), lvl, jnp.asarray(w), compute_dtype=jnp.float32))

    table = _sites(lvl)
    for key, i in list(table.items())[:50]:
        bidx, x, y, z = key
        expect = np.zeros(cout, np.float32)
        for k, (dx, dy, dz) in enumerate(OFFSETS_27):
            nk = (bidx, x + dx, y + dy, z + dz)
            j = table.get(nk)
            if j is not None:
                expect += feats[j] @ w[k]
        np.testing.assert_allclose(out[i], expect, rtol=1e-4, atol=1e-4)
    # padding rows produce zeros
    np.testing.assert_allclose(out[nvox:], 0.0, atol=1e-6)


def test_down_up_conv_oracle(rng):
    hier, feats, nvox = _setup(rng)
    lvl0, lvl1 = hier.levels[0], hier.levels[1]
    trans = hier.transitions[0]
    cin, cout = feats.shape[1], 4
    w = rng.randn(8, cin, cout).astype(np.float32) * 0.1

    down = np.asarray(down_conv2(jnp.asarray(feats), trans, jnp.asarray(w), compute_dtype=jnp.float32))

    fine = _sites(lvl0)
    coarse = _sites(lvl1)
    # coarse active set == unique fine>>1
    assert set(coarse.keys()) == {(b, x // 2, y // 2, z // 2) for b, x, y, z in fine}

    for key, i in list(coarse.items())[:40]:
        bidx, x, y, z = key
        expect = np.zeros(cout, np.float32)
        for k, (dx, dy, dz) in enumerate(OFFSETS_8):
            ck = (bidx, 2 * x + dx, 2 * y + dy, 2 * z + dz)
            j = fine.get(ck)
            if j is not None:
                expect += feats[j] @ w[k]
        np.testing.assert_allclose(down[i], expect, rtol=1e-4, atol=1e-4)

    # up: each fine site reads its parent through its tap
    cfeats = rng.randn(lvl1.capacity, cout).astype(np.float32)
    cfeats[int(lvl1.num_voxels):] = 0.0
    w_up = rng.randn(8, cout, 3).astype(np.float32) * 0.1
    up = np.asarray(up_conv2(jnp.asarray(cfeats), trans, jnp.asarray(w_up), compute_dtype=jnp.float32))
    for key, i in list(fine.items())[:40]:
        bidx, x, y, z = key
        pj = coarse[(bidx, x // 2, y // 2, z // 2)]
        k = 4 * (x & 1) + 2 * (y & 1) + (z & 1)
        np.testing.assert_allclose(up[i], cfeats[pj] @ w_up[k], rtol=1e-4, atol=1e-4)


def test_hierarchy_levels_shrink(rng):
    hier, _, _ = _setup(rng, p=400)
    counts = [int(l.num_voxels) for l in hier.levels]
    assert counts[0] >= counts[1] >= counts[2] > 0
    assert hier.levels[1].full_scale == FULL_SCALE // 2
    assert hier.levels[2].full_scale == FULL_SCALE // 4


def test_propagated_nbr_matches_search(rng):
    """Octree-propagated neighbor tables == per-level binary-search tables.

    build_hierarchy searches only the coarsest level and propagates down
    (hierarchy.propagate_nbr); with non-overflowing capacities the result
    must be bit-identical to searching every level directly.
    """
    from mm2d3d_tpu.ops.hierarchy import build_nbr

    cases = [
        dict(p=400, hi=31, fs=32, b=2, cap=512, nlvl=4),
        dict(p=120, hi=63, fs=64, b=1, cap=256, nlvl=6),  # down to 1^3
        dict(p=64, hi=3, fs=64, b=2, cap=128, nlvl=3),  # dense tiny cube
    ]
    for case in cases:
        coords = rng.randint(0, case["hi"] + 1, size=(case["p"], 3)).astype(np.int32)
        batch = rng.randint(0, case["b"], size=(case["p"],)).astype(np.int32)
        valid = rng.rand(case["p"]) < 0.9
        grid = voxelize(
            jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid),
            case["fs"], capacity=case["cap"],
        )
        hier = build_hierarchy(
            grid, num_levels=case["nlvl"],
            capacities=(case["cap"],) * case["nlvl"],
        )
        for l, lvl in enumerate(hier.levels):
            assert int(lvl.num_voxels) < lvl.capacity, "test premise: no overflow"
            np.testing.assert_array_equal(
                np.asarray(lvl.nbr), np.asarray(build_nbr(lvl)),
                err_msg=f"case {case} level {l}",
            )


def test_propagated_nbr_all_invalid(rng):
    from mm2d3d_tpu.ops.hierarchy import build_nbr

    grid = voxelize(
        jnp.zeros((32, 3), jnp.int32), jnp.zeros(32, jnp.int32),
        jnp.zeros(32, bool), 64, capacity=64,
    )
    hier = build_hierarchy(grid, 3, capacities=(64, 64, 64))
    for lvl in hier.levels:
        np.testing.assert_array_equal(
            np.asarray(lvl.nbr), np.asarray(build_nbr(lvl))
        )


def test_subm_conv_slots_match_dense(rng):
    """Slot-compacted path == dense path (fp32): generous caps, zero drops."""
    hier, feats, nvox = _setup(rng)
    grid_lvl = hier.levels[0]
    cin, cout = feats.shape[1], 5
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)

    from mm2d3d_tpu.ops.hierarchy import build_slots

    src, tap, dropped = build_slots(grid_lvl.nbr, 26)
    assert int(dropped) == 0
    slotted = grid_lvl.replace(slot_src=src, slot_tap=tap, slot_overflow=dropped)

    dense = subm_conv3(jnp.asarray(feats), grid_lvl, w, compute_dtype=jnp.float32)
    slots = subm_conv3(jnp.asarray(feats), slotted, w, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(slots), np.asarray(dense),
                               rtol=1e-4, atol=1e-5)


def test_subm_conv_slot_overflow_counted(rng):
    """A too-small slot cap reports exactly the dropped-hit count."""
    hier, feats, nvox = _setup(rng)
    lvl = hier.levels[0]
    from mm2d3d_tpu.ops.hierarchy import build_slots

    nbr = np.asarray(lvl.nbr)
    v = nbr.shape[1]
    hits = (nbr < v).sum(0) - (nbr[13] < v).astype(np.int64)  # off-center
    for h in (1, 3):
        _, _, dropped = build_slots(lvl.nbr, h)
        assert int(dropped) == int(np.maximum(hits - h, 0).sum())


def test_host_slot_build_matches_device(rng):
    """Numpy slot build (host topology path) == device build, same order."""
    hier, _, _ = _setup(rng)
    lvl = hier.levels[0]
    from mm2d3d_tpu.data.host_topology import _build_slots_np
    from mm2d3d_tpu.ops.hierarchy import build_slots

    for h in (4, 12, 26):
        src_d, tap_d, drop_d = build_slots(lvl.nbr, h)
        src_h, tap_h, drop_h = _build_slots_np(np.asarray(lvl.nbr), h)
        np.testing.assert_array_equal(np.asarray(src_d), src_h)
        np.testing.assert_array_equal(np.asarray(tap_d), tap_h)
        assert int(drop_d) == int(drop_h)


def test_build_nbr_dense_map_matches_search(rng):
    """Dense occupancy-map lookup == binary-search lookup."""
    from mm2d3d_tpu.ops.hierarchy import build_nbr

    hier, _, _ = _setup(rng)
    for lvl in hier.levels:
        a = np.asarray(build_nbr(lvl))
        b = np.asarray(build_nbr(lvl, num_batches=4))
        np.testing.assert_array_equal(a, b)


def test_default_slot_caps_cover_flagship_scans():
    """The default slot specs must not drop hits on realistic scans at any
    level (h_max=26 rules out tail drops structurally; this guards the
    tier compaction caps, calibrated with ~2x headroom on seeds 0-3)."""
    from mm2d3d_tpu.data.synthetic import make_batch
    from mm2d3d_tpu.train.batch import build_topology

    batch = jax.tree_util.tree_map(
        jnp.asarray,
        make_batch(np.random.RandomState(1), batch_size=8, height=64,
                   width=64, n_points=8192, num_classes=6, full_scale=4096),
    )
    _, hier = jax.jit(lambda b: build_topology(b, 4096, 7))(batch)
    for lvl in hier.levels:
        if lvl.slot_overflow is not None:
            assert int(lvl.slot_overflow) == 0


def test_dense_slot_profile_covers_kitti_scans():
    """64-beam KITTI-family scans overflow the flagship tier caps (measured
    ~34k dropped hits/batch — gradient-corrupting); the `dense` profile the
    KITTI configs select must cover them with zero overflow."""
    from mm2d3d_tpu.data.synthetic import make_batch
    from mm2d3d_tpu.train.batch import build_topology

    batch = jax.tree_util.tree_map(
        jnp.asarray,
        make_batch(np.random.RandomState(0), batch_size=4, height=64,
                   width=64, n_points=10240, num_classes=10,
                   full_scale=4096, variant="kitti"),
    )
    _, hier = jax.jit(
        lambda b: build_topology(b, 4096, 7, slot_profile="dense")
    )(batch)
    for lvl in hier.levels:
        if lvl.slot_overflow is not None:
            assert int(lvl.slot_overflow) == 0


def test_split_slot_conv_matches_dense(rng):
    """Split-phase slot conv (build_slots_split) == dense 27-tap conv on a
    densely occupied grid where many voxels exceed h_lo hits."""
    from mm2d3d_tpu.ops.spconv import _subm_apply, _subm_apply_slots2

    p, b = 600, 2
    coords = rng.randint(0, 8, size=(p, 3)).astype(np.int32)  # dense 8^3
    batch = rng.randint(0, b, size=(p,)).astype(np.int32)
    valid = rng.rand(p) < 0.95
    grid = voxelize(jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid), 8)
    hier = build_hierarchy(
        grid, num_levels=2,
        slot_caps=((4, 26, grid.capacity), None),
    )
    lvl = hier.levels[0]
    assert lvl.slot_src2 is not None
    assert int(lvl.slot_overflow) == 0  # h_max=26 can never drop
    # the dense grid must actually exercise phase 2
    assert int((np.asarray(lvl.slot_idx) < lvl.capacity).sum()) > 10

    cin, cout = 6, 5
    feats = rng.randn(lvl.capacity, cin).astype(np.float32)
    feats[int(lvl.num_voxels):] = 0.0
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.1

    dense = _subm_apply(jnp.asarray(feats), jnp.asarray(w), lvl.nbr)
    split = subm_conv3(jnp.asarray(feats), lvl, jnp.asarray(w), compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(split), np.asarray(dense), rtol=1e-4, atol=1e-4)


def test_split_slot_conv_grads_match_dense(rng):
    """Custom VJP of the split-phase conv == autodiff of the dense conv."""
    from mm2d3d_tpu.ops.spconv import _subm_apply

    p, b = 400, 1
    coords = rng.randint(0, 8, size=(p, 3)).astype(np.int32)
    batch = np.zeros(p, np.int32)
    valid = np.ones(p, bool)
    grid = voxelize(jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid), 8)
    hier = build_hierarchy(grid, num_levels=1, slot_caps=((3, 26, grid.capacity),))
    lvl = hier.levels[0]
    assert int((np.asarray(lvl.slot_idx) < lvl.capacity).sum()) > 5

    cin, cout = 4, 3
    feats = rng.randn(lvl.capacity, cin).astype(np.float32)
    feats[int(lvl.num_voxels):] = 0.0
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.1
    g_out = rng.randn(lvl.capacity, cout).astype(np.float32)

    def loss_split(f, ww):
        return jnp.sum(subm_conv3(f, lvl, ww, compute_dtype=jnp.float32) * g_out)

    def loss_dense(f, ww):
        return jnp.sum(_subm_apply(f, ww, lvl.nbr) * g_out)

    gf_s, gw_s = jax.grad(loss_split, argnums=(0, 1))(jnp.asarray(feats), jnp.asarray(w))
    gf_d, gw_d = jax.grad(loss_dense, argnums=(0, 1))(jnp.asarray(feats), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gf_s), np.asarray(gf_d), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_s), np.asarray(gw_d), rtol=1e-3, atol=1e-4)


@pytest.mark.slow  # opt-in child-slot path; compiles a second conv variant
def test_child_slot_down_up_conv_match_dense(rng):
    """Slot-compacted strided down conv / deconv adjoint == dense child-table
    path, for forward values and both gradients."""
    from mm2d3d_tpu.ops.spconv import _down_apply, _up_apply

    p, b = 500, 2
    coords = rng.randint(0, 16, size=(p, 3)).astype(np.int32)
    batch = rng.randint(0, b, size=(p,)).astype(np.int32)
    valid = rng.rand(p) < 0.9
    grid = voxelize(jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid), 16)
    hier = build_hierarchy(grid, num_levels=2, child_slot_caps="default")
    trans = hier.transitions[0]
    assert trans.cslot_src is not None
    assert int(trans.cslot_overflow) == 0
    vf, vc = hier.levels[0].capacity, hier.levels[1].capacity

    cin, cout = 6, 5
    feats = rng.randn(vf, cin).astype(np.float32)
    feats[int(hier.levels[0].num_voxels):] = 0.0
    w = rng.randn(8, cin, cout).astype(np.float32) * 0.1
    gc = rng.randn(vc, cout).astype(np.float32)

    def loss_slot(f, ww):
        return jnp.sum(down_conv2(f, trans, ww, compute_dtype=jnp.float32) * gc)

    def loss_dense(f, ww):
        return jnp.sum(_down_apply(f, ww, trans.parent, trans.off_id, vc) * gc)

    np.testing.assert_allclose(
        np.asarray(down_conv2(jnp.asarray(feats), trans, jnp.asarray(w),
                              compute_dtype=jnp.float32)),
        np.asarray(_down_apply(jnp.asarray(feats), jnp.asarray(w),
                               trans.parent, trans.off_id, vc)),
        rtol=1e-4, atol=1e-4)
    gs = jax.grad(loss_slot, argnums=(0, 1))(jnp.asarray(feats), jnp.asarray(w))
    gd = jax.grad(loss_dense, argnums=(0, 1))(jnp.asarray(feats), jnp.asarray(w))
    for a, bb in zip(gs, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=1e-3, atol=1e-4)

    # up conv: forward identical by construction; check d_coarse adjoint
    cfeats = rng.randn(vc, cout).astype(np.float32)
    cfeats[int(hier.levels[1].num_voxels):] = 0.0
    wu = rng.randn(8, cout, cin).astype(np.float32) * 0.1
    gf = rng.randn(vf, cin).astype(np.float32)

    def uloss_slot(f, ww):
        return jnp.sum(up_conv2(f, trans, ww, compute_dtype=jnp.float32) * gf)

    def uloss_dense(f, ww):
        from mm2d3d_tpu.ops.spconv import _up_apply
        return jnp.sum(_up_apply(f, ww, trans.parent, trans.off_id) * gf)

    np.testing.assert_allclose(
        np.asarray(up_conv2(jnp.asarray(cfeats), trans, jnp.asarray(wu),
                            compute_dtype=jnp.float32)),
        np.asarray(_up_apply(jnp.asarray(cfeats), jnp.asarray(wu),
                             trans.parent, trans.off_id)),
        rtol=1e-4, atol=1e-4)
    gs = jax.grad(uloss_slot, argnums=(0, 1))(jnp.asarray(cfeats), jnp.asarray(wu))
    gd = jax.grad(uloss_dense, argnums=(0, 1))(jnp.asarray(cfeats), jnp.asarray(wu))
    for a, bb in zip(gs, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=1e-3, atol=1e-4)


def test_tiered_slot_conv_matches_dense(rng):
    """3-tier slot conv (build_slots_tiered) == dense 27-tap conv, values
    and both gradients, on a dense grid exercising all three tiers."""
    from mm2d3d_tpu.ops.spconv import _subm_apply

    p, b = 700, 2
    coords = rng.randint(0, 8, size=(p, 3)).astype(np.int32)  # dense 8^3
    batch = rng.randint(0, b, size=(p,)).astype(np.int32)
    valid = rng.rand(p) < 0.95
    grid = voxelize(jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid), 8)
    hier = build_hierarchy(
        grid, num_levels=1,
        slot_caps=((2, 5, 26, grid.capacity, grid.capacity),),
    )
    lvl = hier.levels[0]
    assert lvl.slot_srcm is not None
    assert int(lvl.slot_overflow) == 0  # h_max=26 can never drop
    # the dense grid must exercise both overflow tiers
    assert int((np.asarray(lvl.slot_idxm) < lvl.capacity).sum()) > 10
    assert int((np.asarray(lvl.slot_idx) < lvl.capacity).sum()) > 5

    cin, cout = 6, 5
    feats = rng.randn(lvl.capacity, cin).astype(np.float32)
    feats[int(lvl.num_voxels):] = 0.0
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.1
    g_out = rng.randn(lvl.capacity, cout).astype(np.float32)

    dense = _subm_apply(jnp.asarray(feats), jnp.asarray(w), lvl.nbr)
    tiered = subm_conv3(jnp.asarray(feats), lvl, jnp.asarray(w),
                        compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(tiered), np.asarray(dense),
                               rtol=1e-4, atol=1e-4)

    def loss_tiered(f, ww):
        return jnp.sum(subm_conv3(f, lvl, ww, compute_dtype=jnp.float32) * g_out)

    def loss_dense(f, ww):
        return jnp.sum(_subm_apply(f, ww, lvl.nbr) * g_out)

    gf_t, gw_t = jax.grad(loss_tiered, argnums=(0, 1))(jnp.asarray(feats), jnp.asarray(w))
    gf_d, gw_d = jax.grad(loss_dense, argnums=(0, 1))(jnp.asarray(feats), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gf_t), np.asarray(gf_d), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_t), np.asarray(gw_d), rtol=1e-3, atol=1e-4)
