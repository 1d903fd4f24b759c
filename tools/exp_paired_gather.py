"""Experiment: halve gather descriptors by row-pairing.

Row gathers on this chip are DESCRIPTOR-bound (~0.25-0.46 G rows/s, nearly
independent of row width to ~100 B — PERFORMANCE.md).  Pairing rows —
reshape the (V, C) source to (V/2, 2C), gather idx >> 1, parity-select the
half — fetches two candidate rows per descriptor.  If the descriptor model
holds, time should ~halve wherever 2C stays near the free-width window.

Interleaved A/B at the shapes the forward actually issues:
  subm tier-1   L0 (H=3, V=65536, Ci=16 bf16), L1 (H=4, V=40960, Ci=32)
  propagate child tables (8 x Vf rows from (Vc+1, 8) int32)
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

ITERS = 30
CHAIN = 8  # chained gathers per jitted call (amortizes dispatch)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    rng = np.random.RandomState(0)

    def drain(x):
        return float(np.asarray(jnp.ravel(x)[0]))

    def timeit(name, f, *a):
        jf = jax.jit(f)
        for _ in range(3):
            drain(jf(*a))
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = jf(*a)
        drain(out)
        dt = (time.perf_counter() - t0) / ITERS * 1000
        print(f"{name:52s} {dt:8.3f} ms", flush=True)
        return dt

    def case_feats(h, v, ci, dtype):
        x = jnp.asarray(rng.randn(v, ci), dtype)
        idxs = [
            jnp.asarray(
                np.where(rng.rand(h, v) < 0.85,
                         rng.randint(0, v, (h, v)), v).astype(np.int32)
            )
            for _ in range(CHAIN)
        ]

        def plain(x, *idxs):
            pad = jnp.concatenate([x, jnp.zeros((1, ci), x.dtype)], 0)
            acc = 0.0
            for it in idxs:
                acc += jnp.take(pad, it, axis=0).astype(jnp.float32).sum()
            return acc

        def paired(x, *idxs):
            pad = jnp.concatenate([x, jnp.zeros((2, ci), x.dtype)], 0)
            pair = pad.reshape((v + 2) // 2, 2 * ci)
            acc = 0.0
            for it in idxs:
                g2 = jnp.take(pair, it >> 1, axis=0)
                g = jnp.where(
                    (it & 1)[..., None] == 1, g2[..., ci:], g2[..., :ci]
                )
                acc += g.astype(jnp.float32).sum()
            return acc

        def quad(x, *idxs):
            pad = jnp.concatenate([x, jnp.zeros((4 - v % 4 + 4, ci), x.dtype)], 0)
            vq = pad.shape[0] // 4 * 4
            pair = pad[:vq].reshape(vq // 4, 4 * ci)
            acc = 0.0
            for it in idxs:
                g4 = jnp.take(pair, it >> 2, axis=0)
                r = it & 3
                lo = jnp.where(
                    (r & 1)[..., None] == 1, g4[..., ci:2 * ci], g4[..., :ci]
                )
                hi = jnp.where(
                    (r & 1)[..., None] == 1, g4[..., 3 * ci:], g4[..., 2 * ci:3 * ci]
                )
                g = jnp.where((r & 2)[..., None] == 2, hi, lo)
                acc += g.astype(jnp.float32).sum()
            return acc

        tag = f"H={h} V={v} Ci={ci} {np.dtype(dtype).name}"
        a = timeit(f"plain  take  {tag}", plain, x, *idxs)
        b = timeit(f"paired take  {tag}", paired, x, *idxs)
        c = timeit(f"quad   take  {tag}", quad, x, *idxs)
        a2 = timeit(f"plain  take  {tag} (re)", plain, x, *idxs)
        print(f"  -> paired/plain = {b / ((a + a2) / 2):.2f}   "
              f"quad/plain = {c / ((a + a2) / 2):.2f}")

    def case_child(vf, vc):
        child = jnp.asarray(
            np.where(rng.rand(vc + 1, 8) < 0.2,
                     rng.randint(0, vf, (vc + 1, 8)), vf).astype(np.int32)
        )
        idxs = [
            jnp.asarray(rng.randint(0, vc + 1, (8, vf)).astype(np.int32))
            for _ in range(CHAIN)
        ]

        def plain(child, *idxs):
            acc = 0
            for it in idxs:
                acc += jnp.take(child, it, axis=0).sum()
            return acc

        def paired(child, *idxs):
            pad = jnp.concatenate(
                [child, jnp.full((1, 8), vf, jnp.int32)], 0
            )  # (vc + 2, 8)
            pair = pad.reshape((vc + 2) // 2, 16)
            acc = 0
            for it in idxs:
                g2 = jnp.take(pair, it >> 1, axis=0)  # (8, vf, 16)
                g = jnp.where((it & 1)[..., None] == 1, g2[..., 8:], g2[..., :8])
                acc += g.sum()
            return acc

        a = timeit(f"plain  child (8,{vf}) from ({vc + 1},8)", plain, child, *idxs)
        b = timeit(f"paired child (8,{vf}) from ({vc // 2 + 1},16)", paired,
                   child, *idxs)
        a2 = timeit("plain  child (re)", plain, child, *idxs)
        print(f"  -> paired/plain = {b / ((a + a2) / 2):.2f}")

    case_feats(3, 65536, 16, jnp.bfloat16)
    case_feats(4, 40960, 32, jnp.bfloat16)
    case_feats(4, 24576, 48, jnp.bfloat16)
    case_child(65536, 40960)


if __name__ == "__main__":
    main()
