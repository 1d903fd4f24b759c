"""A/B head/pool optimization barriers in the full fused fwd."""
import sys, time
import numpy as np
sys.path.insert(0, ".")
ITERS = 20

def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    from __graft_entry__ import _flagship_task
    from mm2d3d_tpu.data.synthetic import make_batch
    from mm2d3d_tpu.models import net2d as N2
    from mm2d3d_tpu.train.batch import build_topology

    task = _flagship_task()
    b = make_batch(np.random.RandomState(0), batch_size=8, height=225,
                   width=400, n_points=8192, num_classes=6, full_scale=4096)
    db = jax.tree_util.tree_map(jnp.asarray, b)
    state = task.init_state(jax.random.PRNGKey(0), db)
    p = (state.params2d, state.params3d, state.stats2d, state.stats3d)

    def drain(x):
        return float(np.asarray(jnp.ravel(x)[0]))

    def forward(p2, p3, s2, s3, bb):
        topo = build_topology(bb, task.full_scale, task.num_planes)
        p2d, _, _, _ = task._fwd2d(p2, s2, bb, False)
        p3d, _, _, _ = task._fwd3d(p3, s3, bb, *topo, False)
        sm2 = jax.nn.softmax(p2d["seg_logit"].reshape(-1, task.num_classes), -1)
        sm3 = jax.nn.softmax(p3d["seg_logit"], -1)
        return (sm2 + sm3) / 2

    fns = {}
    for flag in (False, True):
        task.model2d = task.model2d.clone(pallas_head=flag)
        fns[flag] = jax.jit(forward)
        drain(fns[flag](*p, db))

    oa = np.asarray(fns[False](*p, db)); ob = np.asarray(fns[True](*p, db))
    print("max abs diff:", float(np.abs(oa - ob).max()))

    def timeit(name, f):
        for _ in range(2):
            drain(f(*p, db))
        t0 = time.perf_counter()
        o = None
        for _ in range(ITERS):
            o = f(*p, db)
        drain(o)
        dt = (time.perf_counter() - t0) / ITERS * 1000
        print(f"{name:28s} {dt:7.2f} ms  ({8 * 1000 / dt:.1f} scans/s)")

    for _ in range(2):
        timeit("A xla head", fns[False])
        timeit("B pallas head", fns[True])

if __name__ == "__main__":
    main()
