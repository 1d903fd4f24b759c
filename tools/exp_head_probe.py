"""Standalone probes of the 2D head pipeline pieces."""
import sys, time
import numpy as np
sys.path.insert(0, ".")
ITERS = 30

def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    from mm2d3d_tpu.models.net2d import _avg_pool_5x5
    from mm2d3d_tpu.ops.lifting import lift_image_features

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 240, 400, 192), jnp.bfloat16)
    w12 = jnp.asarray(rng.randn(3, 3, 192, 12), jnp.bfloat16)
    w128 = jnp.asarray(rng.randn(3, 3, 192, 128), jnp.bfloat16)
    w9 = jnp.concatenate([w12[i, j] for i in range(3) for j in range(3)], -1)
    idx = jnp.asarray(rng.randint(0, 225, size=(8, 8192, 2)), jnp.int32)
    mask = jnp.ones((8, 8192), bool)

    def drain(o):
        return float(np.asarray(jnp.ravel(o)[0]))

    def timeit(name, f, *a):
        jf = jax.jit(f)
        for _ in range(3):
            drain(jf(*a))
        t0 = time.perf_counter()
        o = None
        for _ in range(ITERS):
            o = jf(*a)
        drain(o)
        print(f"{name:44s} {(time.perf_counter()-t0)/ITERS*1000:7.3f} ms")

    conv = lambda xx, ww: jax.lax.conv_general_dilated(
        xx, ww, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def full12(xx):
        y = conv(xx, w12).astype(jnp.float32)
        y = _avg_pool_5x5(y[:, :225, :400, :])
        return lift_image_features(y[..., :6], idx, mask)

    timeit("conv N=12 only", lambda xx: conv(xx, w12)[0, 0, 0], x)
    timeit("conv N=128 only", lambda xx: conv(xx, w128)[0, 0, 0], x)
    timeit("dot to 108 only", lambda xx: jnp.dot(
        xx, w9, preferred_element_type=jnp.float32)[0, 0, 0], x)
    timeit("conv N=12 + pool(fp32) + lift", full12, x)
    timeit("conv N=12 + pool(bf16) + lift", lambda xx: lift_image_features(
        _avg_pool_5x5(conv(xx, w12)[:, :225, :400, :])[..., :6].astype(jnp.float32),
        idx, mask), x)
    timeit("pool+lift only (fixed y12 fp32)",
           lambda yy: lift_image_features(_avg_pool_5x5(yy)[..., :6], idx, mask),
           jnp.asarray(rng.randn(8, 225, 400, 12), jnp.float32))

if __name__ == "__main__":
    main()


def main2():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    from mm2d3d_tpu.models.net2d import _avg_pool_5x5, _shift_sum5
    from mm2d3d_tpu.ops.lifting import lift_image_features

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 240, 400, 192), jnp.bfloat16)
    w12 = jnp.asarray(rng.randn(3, 3, 192, 12), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, 225, size=(8, 8192, 2)), jnp.int32)
    mask = jnp.ones((8, 8192), bool)

    def drain(o):
        return float(np.asarray(jnp.ravel(o)[0]))

    def timeit(name, f, *a):
        jf = jax.jit(f)
        for _ in range(3):
            drain(jf(*a))
        t0 = time.perf_counter()
        o = None
        for _ in range(ITERS):
            o = jf(*a)
        drain(o)
        print(f"{name:44s} {(time.perf_counter()-t0)/ITERS*1000:7.3f} ms")

    conv = lambda xx, ww: jax.lax.conv_general_dilated(
        xx, ww, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def b1(xx):  # barrier after conv only
        y = jax.lax.optimization_barrier(conv(xx, w12).astype(jnp.float32))
        y = _avg_pool_5x5(y[:, :225, :400, :])
        return lift_image_features(y[..., :6], idx, mask)

    def b2(xx):  # barrier after conv and after each pool pass
        y = jax.lax.optimization_barrier(conv(xx, w12).astype(jnp.float32))
        y = jax.lax.optimization_barrier(_shift_sum5(y[:, :225, :400, :], 1))
        y = _shift_sum5(y, 2) * (1.0 / 25.0)
        return lift_image_features(y[..., :6], idx, mask)

    def b3(xx):  # bf16 conv out, barriers, fp32 after pool
        y = jax.lax.optimization_barrier(conv(xx, w12))
        y = jax.lax.optimization_barrier(_shift_sum5(y[:, :225, :400, :], 1))
        y = (_shift_sum5(y, 2) * (1.0 / 25.0)).astype(jnp.float32)
        return lift_image_features(y[..., :6], idx, mask)

    for _ in range(2):
        timeit("barrier after conv", b1, x)
        timeit("barrier conv + pool pass 1", b2, x)
        timeit("bf16 + both barriers", b3, x)


if __name__ == "__main__" and len(sys.argv) > 1:
    main2()
