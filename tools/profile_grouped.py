"""Measure grouped-conv dual-encoder fusion vs two separate convs (in-graph).

The dual ResNet-34 encoders run the same conv shapes with different weights.
Packing them channel-wise (C -> 2C) and using feature_group_count=2 keeps
FLOPs identical while filling all 128 vector lanes (bf16 tiles are (16,128);
a 64-channel tensor wastes half of every load/store).  This tool measures
whether XLA's TPU lowering of grouped convs actually wins in-graph.

python tools/profile_grouped.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

ITERS = 10
CHAIN = 8  # chained convs per graph for marginal cost


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    def drain(x):
        return float(np.asarray(jnp.ravel(x)[0]))

    def marginal(name, fn, *args):
        # chained marginal cost: (t_CHAIN - t_1) / (CHAIN - 1)
        def chain_n(n):
            def g(*a):
                out = fn(*a)
                for _ in range(n - 1):
                    out = fn(out) if len(args) == 1 else fn(out, *args[1:])
                return out
            f = jax.jit(g)
            for _ in range(2):
                drain(f(*args))
            t0 = time.perf_counter()
            for _ in range(ITERS):
                o = f(*args)
            drain(o)
            return (time.perf_counter() - t0) / ITERS * 1000

        t1, tn = chain_n(1), chain_n(CHAIN)
        dt = (tn - t1) / (CHAIN - 1)
        print(f"{name:54s} {dt:8.3f} ms/conv")
        return dt

    B, H, W = 8, 120, 200
    key = jax.random.PRNGKey(0)
    x64 = jax.random.normal(key, (B, H, W, 64), jnp.bfloat16)
    x128 = jax.random.normal(key, (B, H, W, 128), jnp.bfloat16)
    k64 = jax.random.normal(key, (3, 3, 64, 64), jnp.bfloat16) * 0.05
    k128g = jax.random.normal(key, (3, 3, 64, 128), jnp.bfloat16) * 0.05
    k128d = jax.random.normal(key, (3, 3, 128, 128), jnp.bfloat16) * 0.05

    dn = ("NHWC", "HWIO", "NHWC")

    def conv(x, k, groups=1):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=dn,
            feature_group_count=groups,
        )

    print(f"== layer1 shape {B}x{H}x{W} ==")
    t_a = marginal("separate 64->64 (x1; need 2 of these)",
                   lambda x: conv(x, k64), x64)
    t_b = marginal("two separate 64->64 back-to-back",
                   lambda x: conv(conv(x, k64), k64), x64)
    t_g = marginal("grouped 128->128 g=2 (both encoders at once)",
                   lambda x: conv(x, k128g, 2), x128)
    t_d = marginal("dense 128->128 (block-diag, 2x FLOPs)",
                   lambda x: conv(x, k128d), x128)
    print(f"pair cost: separate {t_b:.3f} vs grouped {t_g:.3f} "
          f"vs blockdiag {t_d:.3f} ms")

    # full-res decoder conv: 192 -> 64 at 400x240
    x192 = jax.random.normal(key, (8, 240, 400, 192), jnp.bfloat16)
    k192 = jax.random.normal(key, (3, 3, 192, 64), jnp.bfloat16) * 0.05
    k192b = jax.random.normal(key, (3, 3, 192, 128), jnp.bfloat16) * 0.05
    marginal("dec_conv_stage1 192->64 @400x240",
             lambda x: conv(x, k192)[..., :64].astype(jnp.bfloat16) * 1.0
             if False else conv(x, k192), x192)
    marginal("dec 192->128 @400x240 (lane-full Cout)",
             lambda x: conv(x, k192b), x192)

    # layer2 shapes
    B2, H2, W2 = 8, 60, 100
    y128 = jax.random.normal(key, (B2, H2, W2, 128), jnp.bfloat16)
    y256 = jax.random.normal(key, (B2, H2, W2, 256), jnp.bfloat16)
    kk128 = jax.random.normal(key, (3, 3, 128, 128), jnp.bfloat16) * 0.05
    kk256g = jax.random.normal(key, (3, 3, 128, 256), jnp.bfloat16) * 0.05
    print(f"== layer2 shape {B2}x{H2}x{W2} ==")
    marginal("separate 128->128", lambda x: conv(x, kk128), y128)
    marginal("grouped 256->256 g=2", lambda x: conv(x, kk256g, 2), y256)

    # layer4 shapes (512ch, 15x25)
    B4, H4, W4 = 8, 15, 25
    z512 = jax.random.normal(key, (B4, H4, W4, 512), jnp.bfloat16)
    z1024 = jax.random.normal(key, (B4, H4, W4, 1024), jnp.bfloat16)
    kz512 = jax.random.normal(key, (3, 3, 512, 512), jnp.bfloat16) * 0.02
    kz1024g = jax.random.normal(key, (3, 3, 512, 1024), jnp.bfloat16) * 0.02
    print(f"== layer4 shape {B4}x{H4}x{W4} ==")
    marginal("separate 512->512", lambda x: conv(x, kz512), z512)
    marginal("grouped 1024->1024 g=2", lambda x: conv(x, kz1024g, 2), z1024)

    # stem: 4->128 at 400x240 (already fused block-diag today)
    x4 = jax.random.normal(key, (8, 240, 400, 4), jnp.bfloat16)
    ks = jax.random.normal(key, (7, 7, 4, 128), jnp.bfloat16) * 0.05
    print("== stem ==")
    marginal("fused stem 4->128 7x7 @400x240",
             lambda x: conv(jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 124)))[..., :4], ks)
             if False else conv(x, ks), x4)


if __name__ == "__main__":
    main()
