"""Experiment: can Pallas DMA beat XLA's gather engine for slot-conv rows?

The round-2 verdict's named lever for more forward margin was a
"DMA-pipelined Pallas gather+matmul": prefetch the next tile's slot rows
with `pltpu.make_async_copy` while the MXU runs the current banded matmul
(`ops/pallas/bandmm.py`).  This probe measures every mechanism such a
kernel could be built from, at the tier-1 slot shapes the forward actually
issues (PERFORMANCE.md):

  A. XLA row gather (`jnp.take`) — the incumbent, ~0.35 G rows/s chained.
  B. Per-row `make_async_copy`: the literal "prefetch slot rows" design.
     Mosaic CANNOT express it — HBM memref slices must be 8-row aligned
     (2-D) or 1024-element aligned (1-D), so the finest legal gather
     granularity is an 8-row group.  We measure that descriptor rate with
     a start-all/wait-all wave per tile (maximum copy-engine overlap the
     API allows); per-row copies, were they expressible, would issue the
     same descriptors at 8x the count.
  C. Contiguous window DMA: one descriptor copies a W-row window
     HBM->VMEM — the transfer a Morton-window design would ride.
  D. In-VMEM one-hot matmul gather: rows selected from a VMEM-resident
     window by (T, W) iota-compare one-hot @ (W, Ci) matmul — the only
     in-kernel dynamic row-select this backend supports (Pallas vector
     gathers are unsupported at useful shapes; see PERFORMANCE.md).

Measured round 3 (see PERFORMANCE.md "DMA-pipelined gather" entry):
A ~0.29 G rows/s; B ~0.003 G desc/s (the scalar-core issue loop binds at
~180 ns/descriptor — 100x below the gather engine); C ~3 GB/s serial
(~11 us latency per window, un-double-buffered); D 0.80-1.25x of A
depending on window size — and `exp_window_capture.py` shows w=1024
captures 98-99% of real slot sources.  Net: no DMA formulation approaches
the gather engine; the 0.35 G rows/s floor stands and the forward ceiling
argument is closed.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

ITERS = 20
CHAIN = 6  # chained ops per jitted call (amortizes dispatch)
T = 512  # output tile (matches ops/pallas/bandmm.py)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    rng = np.random.RandomState(0)

    def drain(x):
        return float(np.asarray(jnp.ravel(jnp.asarray(x, jnp.float32))[0]))

    def timeit(name, f, *a, iters=ITERS):
        jf = jax.jit(f)
        for _ in range(min(3, iters)):
            drain(jf(*a))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = jf(*a)
        drain(out)
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{name:58s} {dt:8.3f} ms", flush=True)
        return dt

    # --- A: XLA take baseline --------------------------------------------
    def xla_take(x, *idxs):
        acc = 0.0
        for it in idxs:
            acc += jnp.take(x, it, axis=0).astype(jnp.float32).sum()
        return acc

    # --- B: 8-row-group DMA gather (finest legal granularity) ------------
    def make_grp(ntile, h, ci):
        def kern(idx_ref, x_ref, o_ref, sem):
            j = pl.program_id(0)

            def start_body(i, _):
                hh, tt = i // T, i % T
                src = pl.multiple_of(idx_ref[hh, j * T + tt] * 8, 8)
                dst = pl.multiple_of((hh * T + tt) * 8, 8)
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(src, 8), :],
                    o_ref.at[pl.ds(dst, 8), :], sem).start()
                return 0

            jax.lax.fori_loop(0, h * T, start_body, 0)

            def wait_body(i, _):
                # same-shape copies signal equal byte counts on the sem
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(0, 8), :],
                    o_ref.at[pl.ds(0, 8), :], sem).wait()
                return 0

            jax.lax.fori_loop(0, h * T, wait_body, 0)

        def run(x, idx):
            return pl.pallas_call(
                kern,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1, grid=(ntile,),
                    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                    out_specs=pl.BlockSpec((h * T * 8, ci),
                                           lambda i, s: (i, 0)),
                    scratch_shapes=[pltpu.SemaphoreType.DMA(())]),
                out_shape=jax.ShapeDtypeStruct((ntile * h * T * 8, ci),
                                               x.dtype),
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )(idx, x)

        return run

    # --- C: contiguous window DMA ----------------------------------------
    def make_win(n, w, ci):
        def kern(off_ref, x_ref, o_ref, sem):
            j = pl.program_id(0)
            off = pl.multiple_of(off_ref[j], 8)
            d = pltpu.make_async_copy(
                x_ref.at[pl.ds(off, w), :], o_ref.at[0], sem)
            d.start()
            d.wait()

        def run(x, offs):
            return pl.pallas_call(
                kern,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1, grid=(n,),
                    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                    out_specs=pl.BlockSpec((1, w, ci), lambda i, s: (i, 0, 0)),
                    scratch_shapes=[pltpu.SemaphoreType.DMA(())]),
                out_shape=jax.ShapeDtypeStruct((n, w, ci), x.dtype),
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )(offs, x)

        return run

    # --- D: in-VMEM one-hot matmul gather --------------------------------
    def make_onehot(w, h):
        def onehot_kernel(idx_ref, x_ref, o_ref):
            xw = x_ref[:]  # (w, ci) window in VMEM
            for hh in range(h):
                iota = jax.lax.broadcasted_iota(jnp.int32, (T, w), 1)
                oh = (iota == idx_ref[pl.ds(hh, 1)][0][:, None]).astype(xw.dtype)
                o_ref[hh] = jnp.dot(
                    oh, xw, preferred_element_type=jnp.float32
                ).astype(o_ref.dtype)

        def onehot(x, idx):
            hh, v = idx.shape
            ci = x.shape[1]
            grid = v // T
            return pl.pallas_call(
                onehot_kernel,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((hh, T), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((w, ci), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((hh, T, ci), lambda i: (0, i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((hh, v, ci), x.dtype),
            )(idx, x)

        return onehot

    def case(h, v, ci):
        tag = f"H={h} V={v} Ci={ci} bf16"
        x = jnp.asarray(rng.randn(v, ci), jnp.bfloat16)
        idxs = [
            jnp.asarray(rng.randint(0, v, (h, v)).astype(np.int32))
            for _ in range(CHAIN)
        ]
        rows = h * v * CHAIN

        a = timeit(f"A xla take      {tag}", xla_take, x, *idxs)
        print(f"    -> {rows / a / 1e6:.2f} G rows/s")

        # B at 128-lane width (the descriptor rate is width-independent
        # below the bandwidth knee; Ci<128 pads the same descriptors)
        c8 = 128
        x128 = jnp.asarray(rng.randn(max(v // 8, T * 8), c8), jnp.bfloat16)
        ntile = min(8, v // T)
        idxb = jnp.asarray(rng.randint(
            0, x128.shape[0] // 8, (h, T * ntile)).astype(np.int32))
        runb = make_grp(ntile, h, c8)
        try:
            nd = h * T * ntile
            b = timeit(f"B grp8-DMA {nd} desc {tag}",
                       lambda x, i: runb(x, i).astype(jnp.float32).sum(),
                       x128, idxb, iters=5)
            print(f"    -> {nd / b / 1e6:.4f} G desc/s "
                  f"(vs A {rows / a / 1e6:.2f} G rows/s; per-row copies "
                  f"are not expressible — 8-row groups are the legal floor)")
        except Exception as e:  # noqa: BLE001
            print(f"B grp8-DMA FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}")
        # C: window transfer rate
        for w in (1024, 2048):
            n = max(h * v // w, 1)
            offs = jnp.asarray(
                (rng.randint(0, (v - w) // 8, (n,)) * 8).astype(np.int32))
            runc = make_win(n, w, ci)
            try:
                c = timeit(f"C window DMA w={w:5d} {tag}",
                           lambda x, o: runc(x, o).astype(jnp.float32).sum(),
                           x, offs)
                by = n * w * ci * 2
                print(f"    -> {by / c / 1e6:.0f} GB/s, "
                      f"{c / n * 1000:.1f} us/window serial "
                      f"({c / a:.2f}x vs take)")
            except Exception as e:  # noqa: BLE001
                print(f"C window DMA w={w} FAILED: {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]}")
        # D: one-hot gather from a VMEM window (local indices)
        for w in (1024, 2048):
            lidx = [
                jnp.asarray(rng.randint(0, w, (h, v)).astype(np.int32))
                for _ in range(CHAIN)
            ]
            xw = x[:w]

            def oh_chain(xw, *lidx, _w=w):
                f = make_onehot(_w, h)
                acc = 0.0
                for it in lidx:
                    acc += f(xw, it).astype(jnp.float32).sum()
                return acc

            try:
                d = timeit(f"D onehot-mm w={w:5d} {tag}", oh_chain, xw, *lidx)
                print(f"    -> {rows / d / 1e6:.2f} G rows/s  "
                      f"({d / a:.2f}x vs take)")
            except Exception as e:  # noqa: BLE001
                print(f"D onehot-mm w={w} FAILED: {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]}")

    case(3, 65536, 16)
    case(4, 40960, 32)
    case(4, 24576, 48)


if __name__ == "__main__":
    main()
