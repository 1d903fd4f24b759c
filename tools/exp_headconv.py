"""In-graph marginal cost of the fused 2D head conv (N=12 at full res).

Ablation: full 2D fwd vs head-conv-replaced-by-slice vs N=128 head.
Interleaved to defeat drift.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
ITERS = 20


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from __graft_entry__ import _flagship_task
    from mm2d3d_tpu.data.synthetic import make_batch
    from mm2d3d_tpu.models import net2d as N2

    task = _flagship_task()
    b = make_batch(np.random.RandomState(0), batch_size=8, height=225,
                   width=400, n_points=8192, num_classes=6, full_scale=4096)
    db = jax.tree_util.tree_map(jnp.asarray, b)
    state = task.init_state(jax.random.PRNGKey(0), db)

    def drain(x):
        return float(np.asarray(jnp.ravel(x)[0]))

    def timeit(name, f, *a):
        jf = jax.jit(f)
        for _ in range(3):
            drain(jf(*a))
        t0 = time.perf_counter()
        o = None
        for _ in range(ITERS):
            o = jf(*a)
        drain(o)
        dt = (time.perf_counter() - t0) / ITERS * 1000
        print(f"{name:40s} {dt:7.2f} ms")

    def fwd2d(p2, s2, bb):
        pr, _, _, _ = task._fwd2d(p2, s2, bb, False)
        return pr["seg_logit"]

    # monkeypatchable head-conv width: wrap conv_general_dilated calls via
    # patching the module-level jax.lax reference inside net2d at trace time
    orig_conv = jax.lax.conv_general_dilated

    def make_patched(n_out):
        def patched(x, k, strides, padding, dimension_numbers=None, **kw):
            if k.shape[:2] == (3, 3) and k.shape[-1] == 12:
                if n_out == 0:  # ablate: cheap full-input reduction so no
                    # producer is dead-code-eliminated
                    return jnp.broadcast_to(
                        jnp.sum(x, axis=-1, keepdims=True),
                        x.shape[:-1] + (12,),
                    ).astype(x.dtype)
                if n_out != 12:
                    k = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, n_out - 12)))
                    return orig_conv(x, k, strides, padding,
                                     dimension_numbers=dimension_numbers,
                                     **kw)[..., :12]
            return orig_conv(x, k, strides, padding,
                             dimension_numbers=dimension_numbers, **kw)
        return patched

    fns = {}
    for tag, n_out in (("head N=12 (current)", 12), ("head ablated", 0),
                       ("head N=128 padded", 128)):
        N2.jax.lax.conv_general_dilated = make_patched(n_out)
        fns[tag] = jax.jit(lambda p2, s2, bb: fwd2d(p2, s2, bb))
        drain(fns[tag](state.params2d, state.stats2d, db))
    N2.jax.lax.conv_general_dilated = orig_conv

    for _ in range(2):
        for tag, f in fns.items():
            timeit(tag, f, state.params2d, state.stats2d, db)


if __name__ == "__main__":
    main()
