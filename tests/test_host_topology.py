"""Host (C++) topology pipeline == device (jax) topology, field by field."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm2d3d_tpu import native
from mm2d3d_tpu.data.synthetic import make_batch
from mm2d3d_tpu.data.host_topology import topology_for_batch
from mm2d3d_tpu.train.batch import build_topology

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_host_topology_matches_device():
    rng = np.random.RandomState(0)
    batch = make_batch(rng, batch_size=2, height=32, width=48, n_points=512,
                       num_classes=6, full_scale=256)
    grid_h, hier_h = topology_for_batch(batch, 256, 4)
    batch_j = jax.tree_util.tree_map(jnp.asarray, batch)
    grid_d, hier_d = jax.jit(lambda b: build_topology(b, 256, 4))(batch_j)

    np.testing.assert_array_equal(grid_h.p2v, np.asarray(grid_d.p2v))
    np.testing.assert_array_equal(grid_h.coords, np.asarray(grid_d.coords))
    np.testing.assert_array_equal(grid_h.counts, np.asarray(grid_d.counts))

    for lh, ld in zip(hier_h.levels, hier_d.levels):
        assert int(lh.num_voxels) == int(ld.num_voxels)
        np.testing.assert_array_equal(lh.coords, np.asarray(ld.coords))
        np.testing.assert_array_equal(lh.nbr, np.asarray(ld.nbr))
        np.testing.assert_array_equal(lh.key_hi, np.asarray(ld.key_hi))
    for th, td in zip(hier_h.transitions, hier_d.transitions):
        nf = len(th.off_id)
        np.testing.assert_array_equal(th.parent, np.asarray(td.parent))
        np.testing.assert_array_equal(th.child, np.asarray(td.child))


@pytest.mark.slow  # compiles the full train-step graph
def test_task_accepts_precomputed_topology():
    from mm2d3d_tpu.train.step import MM2D3DTask

    rng = np.random.RandomState(1)
    tiny = dict(height=32, width=48, n_points=128, num_classes=6, full_scale=256)
    src = make_batch(rng, batch_size=2, **tiny)
    trg = make_batch(rng, batch_size=2, **tiny)
    task = MM2D3DTask(num_classes=6, full_scale=256, num_planes=3, m=8,
                      compute_dtype=jnp.float32)
    srcd = jax.tree_util.tree_map(jnp.asarray, src)
    trgd = jax.tree_util.tree_map(jnp.asarray, trg)
    state = task.init_state(jax.random.PRNGKey(0), srcd)

    topo_src = topology_for_batch(src, 256, 3)
    topo_trg = topology_for_batch(trg, 256, 3)

    state_copy = jax.tree_util.tree_map(jnp.array, state)  # donation-safe copy
    s1, logs1 = task.jit_train_step(state_copy, srcd, trgd, jax.random.PRNGKey(1))
    s2, logs2 = task.jit_train_step_pre(
        state, srcd, trgd, jax.random.PRNGKey(1),
        jax.tree_util.tree_map(jnp.asarray, topo_src),
        jax.tree_util.tree_map(jnp.asarray, topo_trg),
    )
    # same topology -> identical losses
    for k in logs1:
        np.testing.assert_allclose(
            float(logs1[k]), float(logs2[k]), rtol=1e-5, atol=1e-6
        )
