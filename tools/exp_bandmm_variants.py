"""Experiment: E-build variants for the banded slot-conv kernel.

Times the tier-1 kernel (h=3, ci=16, co=16, k=27, V=65536) on fixed
gathered inputs, isolating the Pallas kernel from the gathers.
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    V, H, CI, CO, K = 65536, 3, 16, 16, 27
    TILE = 512
    rng = np.random.RandomState(0)
    xm = jnp.asarray(rng.randn(CI, V), jnp.bfloat16)          # center (ci, V)
    x = jnp.asarray(rng.randn(H, CI, V), jnp.bfloat16)        # slots (h, ci, V)
    # realistic taps: ascending per column, in [0, 27) with 27 = miss
    taps = np.sort(rng.randint(0, 27, size=(H, V)), axis=0).astype(np.int32)
    taps[rng.rand(H, V) > 0.8] = 27
    tap = jnp.asarray(taps)
    w = jnp.asarray(rng.randn(CO, K * CI), jnp.bfloat16)

    def run(name, kernel_body, iters=50):
        f = pl.pallas_call(
            kernel_body,
            grid=(V // TILE,),
            in_specs=[
                pl.BlockSpec((CI, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((H, CI, TILE), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((H, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((CO, K * CI), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((CO, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((CO, V), jnp.float32),
        )
        jf = jax.jit(lambda *a: f(*a))

        def drain(o):
            return float(np.asarray(o[0, 0]))

        for _ in range(3):
            drain(jf(xm, x, tap, w))
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = jf(xm, x, tap, w)
        drain(o)
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{name:44s} {dt:7.3f} ms")
        return dt

    CENTER = 13

    # --- A: current formulation (ref reads inside the double loop)
    def kern_a(xm_ref, x_ref, tap_ref, w_ref, o_ref):
        t = x_ref.shape[2]
        zero = jnp.zeros((CI, t), x_ref.dtype)
        bands = []
        for k in range(K):
            if k == CENTER:
                bands.append(xm_ref[:])
                continue
            acc = None
            for hh in range(H):
                if k < hh:
                    continue
                tap_h = tap_ref[pl.ds(hh, 1)][0]
                x_h = x_ref[pl.ds(hh, 1)][0]
                sel = jnp.where(tap_h[None, :] == k, x_h, zero)
                acc = sel if acc is None else acc + sel
            bands.append(zero if acc is None else acc)
        e = jnp.concatenate(bands, axis=0)
        o_ref[:] = jnp.dot(w_ref[:], e, preferred_element_type=jnp.float32)

    # --- B: hoist ref reads out of the band loop
    def kern_b(xm_ref, x_ref, tap_ref, w_ref, o_ref):
        t = x_ref.shape[2]
        zero = jnp.zeros((CI, t), x_ref.dtype)
        xs = [x_ref[pl.ds(hh, 1)][0] for hh in range(H)]
        ts = [tap_ref[pl.ds(hh, 1)][0] for hh in range(H)]
        bands = []
        for k in range(K):
            if k == CENTER:
                bands.append(xm_ref[:])
                continue
            acc = None
            for hh in range(H):
                if k < hh:
                    continue
                sel = jnp.where(ts[hh][None, :] == k, xs[hh], zero)
                acc = sel if acc is None else acc + sel
            bands.append(zero if acc is None else acc)
        e = jnp.concatenate(bands, axis=0)
        o_ref[:] = jnp.dot(w_ref[:], e, preferred_element_type=jnp.float32)

    # --- C: bf16 multiply-mask instead of where
    def kern_c(xm_ref, x_ref, tap_ref, w_ref, o_ref):
        t = x_ref.shape[2]
        zero = jnp.zeros((CI, t), x_ref.dtype)
        xs = [x_ref[pl.ds(hh, 1)][0] for hh in range(H)]
        ts = [tap_ref[pl.ds(hh, 1)][0] for hh in range(H)]
        bands = []
        for k in range(K):
            if k == CENTER:
                bands.append(xm_ref[:])
                continue
            acc = None
            for hh in range(H):
                if k < hh:
                    continue
                m = (ts[hh][None, :] == k).astype(x_ref.dtype)
                sel = xs[hh] * m
                acc = sel if acc is None else acc + sel
            bands.append(zero if acc is None else acc)
        e = jnp.concatenate(bands, axis=0)
        o_ref[:] = jnp.dot(w_ref[:], e, preferred_element_type=jnp.float32)

    # --- D: one-hot (K, t) per slot once, then per band row-select the mask
    def kern_d(xm_ref, x_ref, tap_ref, w_ref, o_ref):
        t = x_ref.shape[2]
        zero = jnp.zeros((CI, t), x_ref.dtype)
        kio = jax.lax.broadcasted_iota(jnp.int32, (K, t), 0)
        ohs = [
            (kio == tap_ref[pl.ds(hh, 1)][0][None, :]).astype(x_ref.dtype)
            for hh in range(H)
        ]
        xs = [x_ref[pl.ds(hh, 1)][0] for hh in range(H)]
        bands = []
        for k in range(K):
            if k == CENTER:
                bands.append(xm_ref[:])
                continue
            acc = None
            for hh in range(H):
                if k < hh:
                    continue
                sel = xs[hh] * ohs[hh][pl.ds(k, 1) if False else k][None, :]
                acc = sel if acc is None else acc + sel
            bands.append(zero if acc is None else acc)
        e = jnp.concatenate(bands, axis=0)
        o_ref[:] = jnp.dot(w_ref[:], e, preferred_element_type=jnp.float32)

    run("A current (loads in loop)", kern_a)
    run("B hoisted loads", kern_b)
    run("C multiply-mask", kern_c)
    run("D per-slot one-hot rows", kern_d)


if __name__ == "__main__":
    main()


def main2():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    V, H, CI, CO, K = 65536, 3, 16, 16, 27
    rng = np.random.RandomState(0)
    xm = jnp.asarray(rng.randn(CI, V), jnp.bfloat16)
    x = jnp.asarray(rng.randn(H, CI, V), jnp.bfloat16)
    taps = np.sort(rng.randint(0, 27, size=(H, V)), axis=0).astype(np.int32)
    taps[rng.rand(H, V) > 0.8] = 27
    tap = jnp.asarray(taps)
    w = jnp.asarray(rng.randn(CO, K * CI), jnp.bfloat16)
    CENTER = 13

    def mk_c(tile):
        def kern(xm_ref, x_ref, tap_ref, w_ref, o_ref):
            t = x_ref.shape[2]
            zero = jnp.zeros((CI, t), x_ref.dtype)
            xs = [x_ref[pl.ds(hh, 1)][0] for hh in range(H)]
            ts = [tap_ref[pl.ds(hh, 1)][0] for hh in range(H)]
            bands = []
            for k in range(K):
                if k == CENTER:
                    bands.append(xm_ref[:])
                    continue
                acc = None
                for hh in range(H):
                    if k < hh:
                        continue
                    m = (ts[hh][None, :] == k).astype(x_ref.dtype)
                    sel = xs[hh] * m
                    acc = sel if acc is None else acc + sel
                bands.append(zero if acc is None else acc)
            e = jnp.concatenate(bands, axis=0)
            o_ref[:] = jnp.dot(w_ref[:], e, preferred_element_type=jnp.float32)
        return kern

    def mk_pair(tile):
        # 2-band pairing: mask on tap>>1, pre-split slots into even/odd taps
        def kern(xm_ref, x_ref, tap_ref, w_ref, o_ref):
            t = x_ref.shape[2]
            zero = jnp.zeros((CI, t), x_ref.dtype)
            xs = [x_ref[pl.ds(hh, 1)][0] for hh in range(H)]
            ts = [tap_ref[pl.ds(hh, 1)][0] for hh in range(H)]
            xe, xo, th = [], [], []
            for hh in range(H):
                pe = (jnp.bitwise_and(ts[hh], 1)[None, :] == 0).astype(x_ref.dtype)
                xe.append(xs[hh] * pe)
                xo.append(xs[hh] - xs[hh] * pe)
                th.append(jnp.right_shift(ts[hh], 1))
            bands = [None] * K
            for j in range((K + 1) // 2):
                acce = accо = None
                for hh in range(H):
                    if 2 * j + 1 < hh:
                        continue
                    m = (th[hh][None, :] == j).astype(x_ref.dtype)
                    se = xe[hh] * m
                    so = xo[hh] * m
                    acce = se if acce is None else acce + se
                    accо = so if accо is None else accо + so
                bands[2 * j] = zero if acce is None else acce
                if 2 * j + 1 < K:
                    bands[2 * j + 1] = zero if accо is None else accо
            bands[CENTER] = xm_ref[:] + bands[CENTER]
            e = jnp.concatenate(bands, axis=0)
            o_ref[:] = jnp.dot(w_ref[:], e, preferred_element_type=jnp.float32)
        return kern

    def run(name, body, tile, iters=50):
        f = pl.pallas_call(
            body,
            grid=(V // tile,),
            in_specs=[
                pl.BlockSpec((CI, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((H, CI, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((H, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((CO, K * CI), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((CO, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((CO, V), jnp.float32),
        )
        jf = jax.jit(lambda *a: f(*a))
        def drain(o):
            return float(np.asarray(o[0, 0]))
        for _ in range(3):
            drain(jf(xm, x, tap, w))
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = jf(xm, x, tap, w)
        drain(o)
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{name:44s} {dt:7.3f} ms")

    run("C tile 512", mk_c(512), 512)
    run("C tile 1024", mk_c(1024), 1024)
    run("C tile 2048", mk_c(2048), 2048)
    run("pair tile 1024", mk_pair(1024), 1024)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "2":
    main2()
