"""Component costs of the L0 slot-compacted submanifold conv.

Splits the 1.5 ms/conv (measured marginal) into gather / transpose /
kernel / scatter shares to target the next cut.

python tools/profile_slotconv.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

ITERS = 10
CHAIN = 6


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    sys.path.insert(0, ".")
    from mm2d3d_tpu.data.synthetic import make_batch
    from mm2d3d_tpu.train.batch import build_topology
    from mm2d3d_tpu.ops.spconv import subm_conv3, _pad_zero_row, _masked
    from mm2d3d_tpu.ops.pallas.bandmm import slot_conv_apply

    rng = np.random.RandomState(0)
    b = make_batch(rng, batch_size=8, height=225, width=400,
                   n_points=8192, num_classes=6, full_scale=4096)
    db = jax.tree_util.tree_map(jnp.asarray, b)

    grid, hier = jax.jit(
        lambda bb: build_topology(bb, 4096, 7)
    )(db)
    lev = jax.tree_util.tree_map(jax.block_until_ready, hier.levels[0])
    v = lev.capacity
    ci = 16
    feats = jax.random.normal(jax.random.PRNGKey(0), (v, ci), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (27, ci, ci), jnp.bfloat16) * 0.1

    def drain(x):
        return float(np.asarray(jnp.ravel(x)[0]))

    def marginal(name, fn):
        def chain(n):
            def g(f):
                out = f
                for _ in range(n):
                    out = fn(out)
                return out
            jf = jax.jit(g)
            for _ in range(2):
                drain(jf(feats))
            t0 = time.perf_counter()
            for _ in range(ITERS):
                o = jf(feats)
            drain(o)
            return (time.perf_counter() - t0) / ITERS * 1000
        t1, tn = chain(1), chain(CHAIN)
        dt = (tn - t1) / (CHAIN - 1)
        print(f"{name:52s} {dt:8.3f} ms")
        return dt

    # full conv
    marginal("full slot conv (3-tier) L0", lambda f: subm_conv3(
        f, lev, w, jnp.bfloat16).astype(jnp.bfloat16))

    # gather only (tier 1)
    h1 = lev.slot_src.shape[0]
    def g1(f):
        padded = _pad_zero_row(f)
        x1 = jnp.take(padded, lev.slot_src, axis=0)
        return jnp.sum(x1, axis=0).astype(jnp.bfloat16)  # force materialize
    marginal(f"tier-1 gather only ({h1}x{v} rows) + sum", g1)

    # all 3 tiers' gathers
    def g3(f):
        padded = _pad_zero_row(f)
        x1 = jnp.take(padded, lev.slot_src, axis=0)
        xm = jnp.take(padded, lev.slot_srcm, axis=0)
        xh = jnp.take(padded, lev.slot_src2, axis=0)
        o = jnp.sum(x1, 0)
        o = o.at[: xm.shape[1]].add(jnp.sum(xm, 0))
        o = o.at[: xh.shape[1]].add(jnp.sum(xh, 0))
        return o.astype(jnp.bfloat16)
    marginal("3-tier gathers + sums", g3)

    # gather + transpose (what _apply_pallas does internally)
    def gt(f):
        padded = _pad_zero_row(f)
        x1 = jnp.take(padded, lev.slot_src, axis=0)
        xt = x1.transpose(0, 2, 1)  # (H, Ci, V)
        return jnp.sum(xt, axis=(0, 1)).astype(jnp.bfloat16)[:, None] * jnp.ones(
            (1, ci), jnp.bfloat16
        )
    marginal("tier-1 gather + transpose(0,2,1)", gt)

    # tier-1 kernel only (pre-gathered input, fixed)
    padded0 = _pad_zero_row(feats)
    x1_fixed = jnp.take(padded0, lev.slot_src, axis=0)
    def k1(f):
        out = slot_conv_apply(_masked(f, lev.valid), x1_fixed, lev.slot_tap, w)
        return out.astype(jnp.bfloat16)[:, :ci]
    marginal("tier-1 pallas kernel (fixed gathered input)", k1)

    # center-only matmul
    def ctr(f):
        return (_masked(f, lev.valid) @ w[13]).astype(jnp.bfloat16)
    marginal("center matmul only", ctr)

    # scatter-add of mid-tier shape
    vm = lev.slot_idxm.shape[0]
    gmid = jax.random.normal(jax.random.PRNGKey(2), (vm, ci), jnp.float32)
    def sc(f):
        out = f.astype(jnp.float32)
        padded = jnp.concatenate([out, jnp.zeros((1, ci), out.dtype)], 0)
        return padded.at[jnp.minimum(lev.slot_idxm, v)].add(gmid)[:v].astype(
            jnp.bfloat16
        )
    marginal(f"scatter-add mid tier ({vm} rows)", sc)

    print("tier shapes:", lev.slot_src.shape, lev.slot_srcm.shape,
          lev.slot_src2.shape)


if __name__ == "__main__":
    main()
