"""Cost of the Ci=3 input conv (XLA fallback path) vs a channel-padded
Ci=8 variant that takes the Pallas banded kernel.

bandmm.slot_conv_apply falls back to _apply_xla when ci % 8 != 0 (Mosaic's
sublane broadcast needs sublane-aligned channel blocks), so the 3->16 input
conv at V=65536 runs the einsum formulation.  Zero-padding channels 3->8 is
exact (extra weight rows multiply zero features) and re-enables the kernel.

Usage: python tools/exp_inputconv.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

BATCH = 8
N_POINTS = 8192
REPS = 8
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    sys.path.insert(0, ".")
    from mm2d3d_tpu.data.synthetic import make_batch
    from mm2d3d_tpu.ops import spconv
    from mm2d3d_tpu.train.batch import build_topology

    rng = np.random.RandomState(0)
    batch = make_batch(rng, batch_size=BATCH, height=225, width=400,
                       n_points=N_POINTS, num_classes=6, full_scale=4096)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

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

    grid, hier = jax.jit(lambda b: build_topology(b, 4096, 7))(batch)
    lev = hier.levels[0]
    v = lev.capacity
    key = jax.random.PRNGKey(0)
    x3 = jax.random.normal(key, (v, 3), jnp.bfloat16)
    w3 = jax.random.normal(key, (27, 3, 16), jnp.float32) * 0.1

    def chain3(x, w, n=REPS):
        y = x
        for _ in range(n):
            o = spconv.subm_conv3(y, lev, w).astype(jnp.bfloat16)
            y = jnp.concatenate([x[:, :2], o[:, :1]], axis=1)  # keep Ci=3
        return o

    t_n = timed(chain3, x3, w3)
    t_1 = timed(lambda x, w: chain3(x, w, 1), x3, w3)
    print(f"input conv Ci=3 (XLA path)     {(t_n - t_1) / (REPS - 1):7.3f} ms/conv",
          flush=True)

    x8 = jnp.pad(x3, ((0, 0), (0, 5)))
    w8 = jnp.pad(w3, ((0, 0), (0, 5), (0, 0)))

    def chain8(x, w, n=REPS):
        y = x
        for _ in range(n):
            o = spconv.subm_conv3(y, lev, w).astype(jnp.bfloat16)
            y = jnp.concatenate([x[:, :2], o[:, :1], x[:, 3:]], axis=1)
        return o

    t_n = timed(chain8, x8, w8)
    t_1 = timed(lambda x, w: chain8(x, w, 1), x8, w8)
    print(f"input conv Ci=8 (Pallas path)  {(t_n - t_1) / (REPS - 1):7.3f} ms/conv",
          flush=True)

    o3 = spconv.subm_conv3(x3, lev, w3)
    o8 = spconv.subm_conv3(x8, lev, w8)
    print("max |diff| pad vs unpadded:",
          float(jnp.max(jnp.abs(o3 - o8))))


if __name__ == "__main__":
    main()
