"""Isolate the L1 submanifold conv cost: gather vs kernel vs variant.

python tools/profile_l1.py
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
    from mm2d3d_tpu.ops.pallas.bandmm import slot_conv_apply
    from mm2d3d_tpu.train.batch import build_topology

    rng = np.random.RandomState(0)
    batch = jax.tree_util.tree_map(
        jnp.asarray,
        make_batch(rng, batch_size=BATCH, height=225, width=400,
                   n_points=N_POINTS, num_classes=6, full_scale=4096),
    )

    def drain(x):
        return float(np.asarray(jnp.ravel(x)[0]))

    def marginal(name, step, x0, *args):
        """step: (x, *args) -> x-like; times (chain_N - chain_1)/(N-1)."""
        def chain(x, *a, n=REPS):
            for _ in range(n):
                x = step(x, *a)
            return x

        jn = jax.jit(lambda x, *a: chain(x, *a, n=REPS))
        j1 = jax.jit(lambda x, *a: chain(x, *a, n=1))
        for _ in range(2):
            drain(jn(x0, *args))
            drain(j1(x0, *args))
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = jn(x0, *args)
        drain(out)
        tn = (time.perf_counter() - t0) / ITERS
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = j1(x0, *args)
        drain(out)
        t1 = (time.perf_counter() - t0) / ITERS
        ms = (tn - t1) / (REPS - 1) * 1000
        print(f"{name:44s} {ms:7.3f} ms")
        return ms

    grid, hier = jax.jit(lambda b: build_topology(b, 4096, 7))(batch)
    lev = hier.levels[1]
    v = lev.capacity
    ci = 32
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (v, ci), jnp.bfloat16)
    w = (jax.random.normal(key, (27, ci, ci), jnp.float32) * 0.1)
    wb = w.astype(jnp.bfloat16)

    s1, t1_, idx, s2, t2_ = (lev.slot_src, lev.slot_tap, lev.slot_idx,
                             lev.slot_src2, lev.slot_tap2)
    print(f"L1: V={v} h_lo={s1.shape[0]} h2={s2.shape[0]} vh={s2.shape[1]}")

    def pad(f):
        return jnp.concatenate([f, jnp.zeros((1, ci), f.dtype)], 0)

    # 1. the two gathers alone
    marginal("gather s1 (h_lo,V) rows", lambda x: jnp.take(
        pad(x), s1, axis=0).sum(0).astype(jnp.bfloat16) + x, x0)
    marginal("gather s2 (h2,Vh) rows", lambda x: x.at[:s2.shape[1]].add(
        jnp.take(pad(x), s2, axis=0).sum(0).astype(jnp.bfloat16)[:s2.shape[1]]), x0)

    # 2. phase-1 kernel only (gather + banded matmul, no phase 2)
    def phase1(x):
        xs = jnp.take(pad(x), s1, axis=0)
        o = slot_conv_apply(x, xs, t1_, wb)
        return o.astype(jnp.bfloat16)

    marginal("phase1 slot conv (gather+kernel)", phase1, x0)

    # 3. phase-2 kernel only
    def phase2(x):
        xs = jnp.take(pad(x), s2, axis=0)
        o2 = spconv._scatter_add_rows(
            jnp.zeros((v, ci), jnp.float32), idx,
            slot_conv_apply(None, xs, t2_, wb, tap_lo=s1.shape[0]))
        return x + o2.astype(jnp.bfloat16)

    marginal("phase2 overflow conv (+scatter)", phase2, x0)

    # 4. full split conv (what the net runs)
    marginal("slots2 full conv", lambda x: spconv.subm_conv3(
        x, lev, w).astype(jnp.bfloat16), x0)

    # 5. dense 27-tap for comparison
    lev_dense = lev.replace(slot_src=None, slot_src2=None)
    marginal("dense 27-tap conv", lambda x: spconv.subm_conv3(
        x, lev_dense, w).astype(jnp.bfloat16), x0)

    # 6. L0-style spec at L1: rebuild slots with (6, 18, v//8)
    from mm2d3d_tpu.ops.hierarchy import build_slots_split
    a1, b1, i1, a2, b2, _ = jax.jit(
        lambda n: build_slots_split(n, 6, 18, v // 8))(lev.nbr)
    lev_l0spec = lev.replace(slot_src=a1, slot_tap=b1, slot_idx=i1,
                             slot_src2=a2, slot_tap2=b2)
    marginal("slots2 with (6,18,V/8) spec", lambda x: spconv.subm_conv3(
        x, lev_l0spec, w).astype(jnp.bfloat16), x0)

    # 7. single-phase slots with cap 8
    from mm2d3d_tpu.ops.hierarchy import build_slots
    ss, st, _ = jax.jit(lambda n: build_slots(n, 8))(lev.nbr)
    lev_single = lev.replace(slot_src=ss, slot_tap=st, slot_idx=None,
                             slot_src2=None, slot_tap2=None)
    marginal("single slots cap 8", lambda x: spconv.subm_conv3(
        x, lev_single, w).astype(jnp.bfloat16), x0)


if __name__ == "__main__":
    main()
