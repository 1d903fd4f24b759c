"""3D branch tests: Net3DSeg forward, gating semantics, purity."""

import jax
import jax.numpy as jnp
import numpy as np

from mm2d3d_tpu.models.sparse_unet import Net3DSeg
from mm2d3d_tpu.ops.hierarchy import build_hierarchy
from mm2d3d_tpu.ops.voxelize import voxelize

FULL_SCALE = 64
NUM_PLANES = 4


def _batch(rng, p=300, b=2):
    coords = rng.randint(0, FULL_SCALE, (p, 3)).astype(np.int32)
    batch = rng.randint(0, b, (p,)).astype(np.int32)
    valid = rng.rand(p) < 0.9
    feats = rng.rand(p, 3).astype(np.float32)
    grid = voxelize(jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid), FULL_SCALE)
    hier = build_hierarchy(grid, num_levels=NUM_PLANES)
    return grid, hier, jnp.asarray(feats), valid


def test_net3dseg_forward(rng):
    grid, hier, feats, valid = _batch(rng)
    model = Net3DSeg(
        num_classes=6, full_scale=FULL_SCALE, num_planes=NUM_PLANES,
        compute_dtype=jnp.float32,
    )
    variables = model.init(jax.random.PRNGKey(0), feats, grid, hier, False)
    (preds, point_feats, aux), _ = model.apply(
        variables, feats, grid, hier, False, mutable=["batch_stats"]
    )

    p = feats.shape[0]
    assert preds["seg_logit"].shape == (p, 6)
    assert preds["confidence"].shape == (p, 1)
    assert point_feats.shape == (p, 16)
    assert aux["seg_logit_point"].shape == (p, 6)
    assert np.isfinite(np.asarray(preds["seg_logit"])).all()
    conf = np.asarray(preds["confidence"])
    assert (conf > 0).all() and (conf < 1).all()  # sigmoid gate

    # purity: input feats unchanged (reference mutates the batch in-place,
    # 3d_net/model.py:48 — we must not)
    assert np.asarray(feats).max() <= 1.0

    # invalid points produce zero trunk features
    pf = np.asarray(point_feats)
    assert np.all(pf[~valid] == 0.0)


def test_net3dseg_train_mode_updates_stats(rng):
    grid, hier, feats, _ = _batch(rng, p=200)
    model = Net3DSeg(
        num_classes=6, full_scale=FULL_SCALE, num_planes=NUM_PLANES,
        compute_dtype=jnp.float32,
    )
    variables = model.init(jax.random.PRNGKey(0), feats, grid, hier, False)
    _, updates = model.apply(
        variables, feats, grid, hier, True, mutable=["batch_stats"]
    )
    # running stats must move in train mode
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
    )
    assert changed
