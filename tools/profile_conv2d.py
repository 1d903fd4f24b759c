"""Marginal-cost microbench of the 2D branch's conv shapes.

Tests the dual-encoder batching hypothesis: RGB and depth encoders run
the SAME conv shapes with different weights — can one grouped conv
(feature_group_count=2) beat two sequential convs at the Cin-starved
widths (64 ch), where the MXU's 128-wide tiles are half idle?

Usage: python tools/profile_conv2d.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

ITERS = 10
REPS = 6


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    sys.path.insert(0, ".")

    key = jax.random.PRNGKey(0)

    def drain(x):
        return float(np.asarray(jnp.ravel(x)[0]))

    def timed(f, *args):
        jf = jax.jit(f)
        for _ in range(2):
            drain(jf(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = jf(*args)
        drain(out)
        return (time.perf_counter() - t0) / ITERS * 1000

    def conv(x, w, fgc=1):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=fgc,
        )

    def marginal(name, x, w, fgc=1, flops=None):
        def chain(x, w, n=REPS):
            for _ in range(n):
                x = conv(x, w, fgc)
            return x

        t_n = timed(chain, x, w)
        t_1 = timed(lambda x, w: chain(x, w, 1), x, w)
        marg = (t_n - t_1) / (REPS - 1)
        tf = (flops / marg * 1e-9) if flops else 0
        print(f"{name:44s} {marg:7.3f} ms  {tf:6.1f} TF/s")
        return marg

    for h, w_, c in ((240, 400, 64), (120, 200, 64), (120, 200, 128)):
        x = jax.random.normal(key, (8, h, w_, c), jnp.bfloat16)
        x2 = jax.random.normal(key, (8, h, w_, 2 * c), jnp.bfloat16)
        wt = jax.random.normal(key, (3, 3, c, c), jnp.bfloat16) * 0.05
        wt2 = jax.random.normal(key, (3, 3, c, 2 * c), jnp.bfloat16) * 0.05
        fl = 8 * h * w_ * 9 * c * c * 2
        t1 = marginal(f"conv3x3 {c}->{c} @{h}x{w_}", x, wt, flops=fl)
        marginal(f"grouped fgc=2 {2*c}->{2*c} @{h}x{w_}", x2, wt2, fgc=2,
                 flops=2 * fl)
        print(f"  -> grouped vs 2x sequential: see above ({2 * t1:.3f} ms)")

    # the decoder's big full-res conv
    x = jax.random.normal(key, (8, 240, 400, 192), jnp.bfloat16)
    wt = jax.random.normal(key, (3, 3, 192, 64), jnp.bfloat16) * 0.05
    marginal("conv3x3 192->64 @240x400 (dec_stage1)", x, wt,
             flops=8 * 240 * 400 * 9 * 192 * 64 * 2)

    # NCHW alternative for the 64-ch full-res case
    xc = jax.random.normal(key, (8, 64, 240, 400), jnp.bfloat16)
    wc = jax.random.normal(key, (64, 64, 3, 3), jnp.bfloat16) * 0.05

    def conv_nchw(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )

    def chain_nchw(x, w, n=REPS):
        for _ in range(n):
            x = conv_nchw(x, w)
        return x

    t_n = timed(chain_nchw, xc, wc)
    t_1 = timed(lambda x, w: chain_nchw(x, w, 1), xc, wc)
    print(f"{'conv3x3 64->64 @240x400 NCHW':44s} {(t_n - t_1) / (REPS - 1):7.3f} ms")


if __name__ == "__main__":
    main()
