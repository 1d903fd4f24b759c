"""Custom-VJP sparse convs: gradients must match jax autodiff of a plain
(non-custom) reference formulation."""

import jax
import jax.numpy as jnp
import numpy as np

from mm2d3d_tpu.ops.hierarchy import build_hierarchy
from mm2d3d_tpu.ops.spconv import down_conv2, subm_conv3, up_conv2
from mm2d3d_tpu.ops.voxelize import voxelize

FULL_SCALE = 32


def _setup(rng, p=250, b=2, cin=5):
    coords = rng.randint(0, FULL_SCALE, (p, 3)).astype(np.int32)
    coords[p // 2 :] = np.clip(
        coords[rng.randint(0, p // 2, p - p // 2)]
        + rng.randint(-1, 2, (p - p // 2, 3)),
        0, FULL_SCALE - 1,
    )
    batch = rng.randint(0, b, (p,)).astype(np.int32)
    valid = rng.rand(p) < 0.9
    grid = voxelize(jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid), FULL_SCALE)
    hier = build_hierarchy(grid, num_levels=2)
    feats = rng.randn(grid.capacity, cin).astype(np.float32)
    feats[int(grid.num_voxels):] = 0
    return hier, jnp.asarray(feats)


def _plain_tap_conv(feats, idx, weight):
    """Reference formulation without custom VJP (autodiff scatters)."""
    padded = jnp.concatenate([feats, jnp.zeros((1, feats.shape[1]))], 0)
    g = jnp.take(padded, idx, axis=0)  # (K, V, Cin)
    return jnp.einsum("kvc,kcd->vd", g, weight,
                      precision=jax.lax.Precision.HIGHEST)


def _plain_up(coarse, weight, parent, off_id):
    vc = coarse.shape[0]
    padded = jnp.concatenate([coarse, jnp.zeros((1, coarse.shape[1]))], 0)
    gp = jnp.take(padded, jnp.minimum(parent, vc), axis=0)
    taps = jnp.einsum("vc,kcd->vkd", gp, weight,
                      precision=jax.lax.Precision.HIGHEST)
    sel = jnp.take_along_axis(taps, off_id[:, None, None], axis=1)[:, 0]
    return jnp.where((parent < vc)[:, None], sel, 0.0)


def _check_grads(f_custom, f_plain, args, wrt=(0, 1)):
    key = jax.random.PRNGKey(0)
    out = f_plain(*args)
    cot = jax.random.normal(key, out.shape)

    def loss(f):
        return lambda *a: jnp.sum(f(*a) * cot)

    g_custom = jax.grad(loss(f_custom), argnums=wrt)(*args)
    g_plain = jax.grad(loss(f_plain), argnums=wrt)(*args)
    for gc, gp in zip(g_custom, g_plain):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gp),
                                   rtol=1e-4, atol=1e-5)


def test_subm_conv_grads(rng):
    hier, feats = _setup(rng)
    lvl = hier.levels[0]
    w = jnp.asarray(rng.randn(27, feats.shape[1], 4).astype(np.float32) * 0.1)

    _check_grads(
        lambda f, ww: subm_conv3(f, lvl, ww, compute_dtype=jnp.float32),
        lambda f, ww: _plain_tap_conv(f, lvl.nbr, ww),
        (feats, w),
    )


def test_down_conv_grads(rng):
    hier, feats = _setup(rng)
    t = hier.transitions[0]
    w = jnp.asarray(rng.randn(8, feats.shape[1], 4).astype(np.float32) * 0.1)
    _check_grads(
        lambda f, ww: down_conv2(f, t, ww, compute_dtype=jnp.float32),
        lambda f, ww: _plain_tap_conv(f, t.child.T, ww),
        (feats, w),
    )


def test_up_conv_grads(rng):
    hier, _ = _setup(rng)
    t = hier.transitions[0]
    lvl1 = hier.levels[1]
    cfeats = rng.randn(lvl1.capacity, 6).astype(np.float32)
    cfeats[int(lvl1.num_voxels):] = 0
    cfeats = jnp.asarray(cfeats)
    w = jnp.asarray(rng.randn(8, 6, 3).astype(np.float32) * 0.1)
    _check_grads(
        lambda f, ww: up_conv2(f, t, ww, compute_dtype=jnp.float32),
        lambda f, ww: _plain_up(f, ww, t.parent, t.off_id),
        (cfeats, w),
    )


def test_subm_conv_slot_grads(rng):
    """Slot-path custom VJP == autodiff of the plain dense formulation."""
    from mm2d3d_tpu.ops.hierarchy import build_slots

    hier, feats = _setup(rng)
    lvl = hier.levels[0]
    src, tap, dropped = build_slots(lvl.nbr, 26)
    assert int(dropped) == 0
    slotted = lvl.replace(slot_src=src, slot_tap=tap, slot_overflow=dropped)
    w = jnp.asarray(rng.randn(27, feats.shape[1], 4).astype(np.float32) * 0.1)

    _check_grads(
        lambda f, ww: subm_conv3(f, slotted, ww, compute_dtype=jnp.float32),
        lambda f, ww: _plain_tap_conv(f, lvl.nbr, ww),
        (feats, w),
    )


def _setup_dense(rng, cin=5):
    """Geometry with a solid block so hit counts span all three tiers
    (interior block voxels have up to 26 off-center hits)."""
    gx, gy, gz = np.meshgrid(*[np.arange(6)] * 3, indexing="ij")
    block = np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.int32)
    rand = rng.randint(0, FULL_SCALE, (200, 3)).astype(np.int32)
    coords = np.concatenate([block + 8, rand])
    p = len(coords)
    batch = np.zeros(p, np.int32)
    valid = np.ones(p, bool)
    grid = voxelize(
        jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid), FULL_SCALE
    )
    hier = build_hierarchy(grid, num_levels=2)
    feats = rng.randn(grid.capacity, cin).astype(np.float32)
    feats[int(grid.num_voxels):] = 0
    return hier, jnp.asarray(feats)


def test_subm_conv_slots_split_grads(rng):
    """2-tier split-phase VJP (tier 1 + compacted overflow scatter) ==
    autodiff of the dense formulation.  Kills tier-dropping mutations in
    `_subm_slots2_bwd`."""
    from mm2d3d_tpu.ops.hierarchy import build_slots_split

    hier, feats = _setup_dense(rng)
    lvl = hier.levels[0]
    s1, t1, idx, s2, t2, dropped = build_slots_split(
        lvl.nbr, h_lo=2, h_max=26, vh_cap=lvl.capacity
    )
    assert int(dropped) == 0
    slotted = lvl.replace(
        slot_src=s1, slot_tap=t1, slot_overflow=dropped,
        slot_idx=idx, slot_src2=s2, slot_tap2=t2,
    )
    assert int(np.asarray((t2 != 27).sum())) > 0  # overflow tier populated
    w = jnp.asarray(rng.randn(27, feats.shape[1], 4).astype(np.float32) * 0.1)
    _check_grads(
        lambda f, ww: subm_conv3(f, slotted, ww, compute_dtype=jnp.float32),
        lambda f, ww: _plain_tap_conv(f, lvl.nbr, ww),
        (feats, w),
    )


def test_subm_conv_slots_tiered_grads(rng):
    """3-tier VJP (tier 1 + gather-added mid tier + scatter-added heavy
    tier) == autodiff of the dense formulation.  A dropped or mis-indexed
    tier in `_subm_slots3_bwd` fails this directly."""
    from mm2d3d_tpu.ops.hierarchy import build_slots_tiered

    hier, feats = _setup_dense(rng)
    lvl = hier.levels[0]
    s1, t1, im, invm, sm, tm, ih, sh, th, dropped = build_slots_tiered(
        lvl.nbr, h1=2, h2=5, h_max=26,
        vm_cap=lvl.capacity, vh_cap=lvl.capacity,
    )
    assert int(dropped) == 0
    slotted = lvl.replace(
        slot_src=s1, slot_tap=t1, slot_overflow=dropped,
        slot_idxm=im, slot_invm=invm, slot_srcm=sm, slot_tapm=tm,
        slot_idx=ih, slot_src2=sh, slot_tap2=th,
    )
    # sanity: both overflow tiers are actually populated on this geometry
    assert int(np.asarray((tm != 27).sum())) > 0
    assert int(np.asarray((th != 27).sum())) > 0
    w = jnp.asarray(rng.randn(27, feats.shape[1], 4).astype(np.float32) * 0.1)
    _check_grads(
        lambda f, ww: subm_conv3(f, slotted, ww, compute_dtype=jnp.float32),
        lambda f, ww: _plain_tap_conv(f, lvl.nbr, ww),
        (feats, w),
    )
