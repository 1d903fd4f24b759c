"""Standalone correctness + timing of the fused Pallas 2D head kernel."""
import sys, time
import numpy as np
sys.path.insert(0, ".")
ITERS = 30


def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    from mm2d3d_tpu.ops.pallas import head2d

    rng = np.random.RandomState(0)
    B, HP, WP, HR, WR, C2 = 8, 240, 400, 225, 400, 12
    xs = [jnp.asarray(rng.randn(B, HP, WP, 64) * 0.3, jnp.bfloat16)
          for _ in range(3)]
    w12 = jnp.asarray(rng.randn(3, 3, 192, C2) * 0.05, jnp.float32)
    b12 = jnp.asarray(rng.randn(C2) * 0.1, jnp.float32)

    f_pl = jax.jit(lambda *a: head2d._head_pool_pallas(
        [x.astype(jnp.bfloat16) for x in a[:3]],
        jnp.concatenate([a[3][i, j] for i in range(3) for j in range(3)],
                        -1).astype(jnp.bfloat16),
        a[4], HP, WP, HR, WR, C2))
    f_ref = jax.jit(lambda *a: head2d._head_pool_ref(
        list(a[:3]), a[3], a[4], HR, WR, jnp.bfloat16))

    o_pl = np.asarray(f_pl(*xs, w12, b12))
    o_ref = np.asarray(f_ref(*xs, w12, b12))
    scale = np.abs(o_ref).max()
    print("shapes:", o_pl.shape, o_ref.shape)
    print("max abs diff:", np.abs(o_pl - o_ref).max(), " scale:", scale)

    def drain(o):
        return float(np.asarray(jnp.ravel(o)[0]))

    def timeit(name, f, *a):
        for _ in range(3):
            drain(f(*a))
        t0 = time.perf_counter()
        o = None
        for _ in range(ITERS):
            o = f(*a)
        drain(o)
        print(f"{name:36s} {(time.perf_counter()-t0)/ITERS*1000:7.3f} ms")

    for _ in range(2):
        timeit("pallas fused head", f_pl, *xs, w12, b12)
        timeit("xla ref head", f_ref, *xs, w12, b12)


if __name__ == "__main__":
    main()
