"""Per-shape in-graph conv efficiency (TF/s) for every conv family in the
2D branch.  python tools/profile_convshapes.py"""

from __future__ import annotations

import sys
import time

import numpy as np

ITERS = 10
CHAIN = 4

SHAPES = [
    # (name, B, H, W, Ci, Co, k, stride)
    ("layer2 128->128 @60x100", 8, 60, 100, 128, 128, 3, 1),
    ("layer3 256->256 @30x50", 8, 30, 50, 256, 256, 3, 1),
    ("layer4 512->512 @15x25", 8, 15, 25, 512, 512, 3, 1),
    ("fuse4 768->256 @30x50", 8, 30, 50, 768, 256, 3, 1),
    ("dec1 192->64 @240x400", 8, 240, 400, 192, 64, 3, 1),
    ("layer1 64->64 @120x200", 8, 120, 200, 64, 64, 3, 1),
]


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    def drain(x):
        return float(np.asarray(jnp.ravel(x)[0]))

    dn = ("NHWC", "HWIO", "NHWC")
    key = jax.random.PRNGKey(0)

    for name, b, h, w, ci, co, k, s in SHAPES:
        x = jax.random.normal(key, (b, h, w, ci), jnp.bfloat16)
        ks = [
            jax.random.normal(jax.random.PRNGKey(i), (k, k, ci, co),
                              jnp.bfloat16) * 0.05
            for i in range(CHAIN)
        ]
        # back-projection kernel to keep chaining when ci != co
        kb = jax.random.normal(jax.random.PRNGKey(99), (1, 1, co, ci),
                               jnp.bfloat16) * 0.05

        def convn(x_, n):
            y = x_
            for i in range(n):
                y = jax.lax.conv_general_dilated(
                    y, ks[i], (s, s), "SAME", dimension_numbers=dn)
                if co != ci or s != 1:
                    break  # no chaining possible
                y = y  # same shape, keep chaining
            return y

        if co == ci and s == 1:
            def run1(x_):
                return convn(x_, 1)

            def runN(x_):
                return convn(x_, CHAIN)
        else:
            # chain via cheap 1x1 back-projection (subtract its cost? it is
            # small vs the 3x3) — report marginal including it
            def run1(x_, _ks=ks):
                return jax.lax.conv_general_dilated(
                    x_, _ks[0], (s, s), "SAME", dimension_numbers=dn)

            def runN(x_, _ks=ks):
                y = x_
                for i in range(CHAIN):
                    z = jax.lax.conv_general_dilated(
                        y, _ks[i], (s, s), "SAME", dimension_numbers=dn)
                    if i < CHAIN - 1:
                        y = jax.lax.conv_general_dilated(
                            z, kb, (1, 1), "SAME", dimension_numbers=dn)
                return z

        f1, fn = jax.jit(run1), jax.jit(runN)
        for _ in range(2):
            drain(f1(x)); drain(fn(x))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            o = f1(x)
        drain(o)
        t1 = (time.perf_counter() - t0) / ITERS
        t0 = time.perf_counter()
        for _ in range(ITERS):
            o = fn(x)
        drain(o)
        tn = (time.perf_counter() - t0) / ITERS
        dt = (tn - t1) / (CHAIN - 1)
        oh = (h // s) * (w // s)
        flops = 2 * b * oh * k * k * ci * co
        print(f"{name:32s} {dt * 1e3:7.3f} ms/conv  {flops / dt / 1e12:6.1f} TF/s",
              flush=True)


if __name__ == "__main__":
    main()
