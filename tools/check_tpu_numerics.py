"""On-device numerics check: the fused 3D forward with the Pallas kernels
vs the identical-layout XLA slot formulation, same bf16 dtype — catches
kernel regressions at real multi-level shapes.  Run on the TPU env:

    python tools/check_tpu_numerics.py

(batch 2 x 2048 points keeps the forced-XLA variant's compile time sane
over the tunneled backend while still exercising all 7 levels and every
slot tier; observed agreement is bit-exact.)"""
import sys
import os.path as osp
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
from mm2d3d_tpu.data.synthetic import make_batch
from mm2d3d_tpu.train.batch import build_topology
from mm2d3d_tpu.ops.pallas import bandmm as B
from __graft_entry__ import _flagship_task

rng = np.random.RandomState(0)
b = make_batch(rng, batch_size=2, height=225, width=400, n_points=2048,
               num_classes=6, full_scale=4096)
db = jax.tree_util.tree_map(jnp.asarray, b)
task = _flagship_task()
state = task.init_state(jax.random.PRNGKey(0), db)

def fwd3(p3, s3, bb):
    tp = build_topology(bb, task.full_scale, task.num_planes)
    pr, _, aux, _ = task._fwd3d(p3, s3, bb, *tp, False)
    return pr["seg_logit"], aux["seg_logit_point"]

lo_pal = jax.jit(fwd3)(state.params3d, state.stats3d, db)
lo_pal = jax.tree_util.tree_map(np.asarray, lo_pal)

orig = B._on_tpu
B._on_tpu = lambda: False  # force the XLA formulation
lo_xla = jax.jit(fwd3)(state.params3d, state.stats3d, db)
lo_xla = jax.tree_util.tree_map(np.asarray, lo_xla)
B._on_tpu = orig

for name, a, c in [("seg_logit", *zip(lo_pal, lo_xla))][0:1]:
    pass
for name, (a, c) in zip(["seg_logit", "aux_point"], zip(lo_pal, lo_xla)):
    diff = np.abs(a - c)
    denom = np.maximum(np.abs(c), 1e-3)
    rel = (diff / denom).max()
    print(f"{name}: max abs diff {diff.max():.4f}  max rel {rel:.4f}")
    assert np.isfinite(a).all() and np.isfinite(c).all()
    assert diff.max() < 0.35 and rel < 0.2, (name, diff.max(), rel)
print("FULL-SCALE PALLAS-vs-XLA OK (bf16 accumulation-order tolerance)")
