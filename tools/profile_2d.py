"""Stage breakdown of the 2D branch (graph-ablation methodology).

python tools/profile_2d.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

BATCH = 8
N_POINTS = 8192
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    sys.path.insert(0, ".")
    from mm2d3d_tpu.data.synthetic import make_batch
    from mm2d3d_tpu.models.resnet2d import ResNet34Encoder

    rng = np.random.RandomState(0)
    b = make_batch(rng, batch_size=BATCH, height=225, width=400,
                   n_points=N_POINTS, num_classes=6, full_scale=4096)
    img = jnp.asarray(np.pad(b.img, ((0, 0), (0, 15), (0, 0), (0, 0))))
    x64 = jax.random.normal(jax.random.PRNGKey(0),
                            (BATCH, 240, 400, 64), jnp.bfloat16)

    def drain(x):
        return float(np.asarray(jnp.ravel(x)[0]))

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        for _ in range(3):
            drain(f(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = f(*args)
        drain(out)
        dt = (time.perf_counter() - t0) / ITERS * 1000
        print(f"{name:40s} {dt:8.2f} ms")
        return dt

    enc = ResNet34Encoder(num_channels=3, skip_stem=True)
    ep = enc.init(jax.random.PRNGKey(0), x64, False)

    def one_encoder(x):
        feats = enc.apply(ep, x, False)
        return feats[-1]

    t_enc = timeit("one encoder (from stem out)", one_encoder, x64)

    def maxpool_only(x):
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    timeit("maxpool 3x3 s2 full res", maxpool_only, x64)

    # layer1 only: 3 blocks at 200x120x64
    x_l1 = jax.random.normal(jax.random.PRNGKey(1),
                             (BATCH, 120, 200, 64), jnp.bfloat16)

    from mm2d3d_tpu.models.resnet2d import BasicBlock

    class L1(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(3):
                x = BasicBlock(64, 1, name=f"b{i}")(x, False)
            return x

    l1 = L1()
    l1p = l1.init(jax.random.PRNGKey(0), x_l1)
    timeit("layer1 (3 blocks @200x120x64)", lambda x: l1.apply(l1p, x), x_l1)

    # full Net2DSeg forward via the task
    from __graft_entry__ import _flagship_task
    task = _flagship_task()
    db = jax.tree_util.tree_map(jnp.asarray, b)
    state = task.init_state(jax.random.PRNGKey(0), db)

    def fwd2d(p2, s2):
        pr, _, _, _ = task._fwd2d(p2, s2, db, False)
        return pr["seg_logit"]

    t2d = timeit("full 2D branch", fwd2d, state.params2d, state.stats2d)
    print(f"two encoders ~ {2 * t_enc:.2f} of {t2d:.2f} ms")


if __name__ == "__main__":
    main()
