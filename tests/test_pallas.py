"""Pallas tapsum kernel: numerical parity with the XLA formulation.

Runs in interpreter mode on CPU (the kernel itself targets TPU; bench runs
exercise the compiled path there).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mm2d3d_tpu.ops.pallas import tapsum as T


def test_tapsum_kernel_matches_xla(rng, monkeypatch):
    k, v, cin, cout = 27, 1024, 16, 16
    g = jnp.asarray(rng.randn(k, v, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(k, cin, cout).astype(np.float32) * 0.1)

    ref = T._xla_tapsum(g, w, jax.lax.Precision.HIGHEST)

    import functools
    from jax.experimental import pallas as pl

    out = pl.pallas_call(
        functools.partial(T._kernel, k_taps=k),
        grid=(v // 512,),
        in_specs=[
            pl.BlockSpec((k, 512, cin), lambda i: (0, i, 0)),
            pl.BlockSpec((k, cin, cout), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((512, cout), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((v, cout), jnp.float32),
        interpret=True,
    )(g, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_tapsum_dispatch_fallback(rng):
    # on CPU the public entry point must route to XLA regardless of flags
    g = jnp.asarray(rng.randn(8, 256, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(8, 4, 4).astype(np.float32))
    out = T.tapsum(g, w)
    ref = T._xla_tapsum(g, w, jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_bandmm_apply_kernel_matches_xla(rng):
    """The banded-matmul conv kernel (interpreter mode) vs the XLA form."""
    import functools
    from jax.experimental import pallas as pl

    from mm2d3d_tpu.ops.pallas import bandmm as B

    h, v, ci, co, k = 5, 1024, 16, 16, 27
    xm = jnp.asarray(rng.randn(v, ci).astype(np.float32))
    x_src = jnp.asarray(rng.randn(h, v, ci).astype(np.float32))
    # taps respect the ascending-slot invariant: tap[h] >= h, never 13
    tap = np.full((h, v), B.MISS_TAP, np.int32)
    for hh in range(h):
        t = rng.randint(hh, 27, size=v)
        t[t == 13] = 14
        miss = rng.rand(v) < 0.4
        t[miss] = B.MISS_TAP
        tap[hh] = t
    tap = jnp.asarray(tap)
    w = jnp.asarray(rng.randn(k, ci, co).astype(np.float32) * 0.1)

    ref = B._apply_xla(xm, x_src, tap, w)
    out_t = pl.pallas_call(
        functools.partial(B._apply_kernel_t, k_taps=k, tap_lo=0,
                          has_center=True, has_slots=True),
        grid=(v // 512,),
        in_specs=[
            pl.BlockSpec((ci, 512), lambda i: (0, i)),
            pl.BlockSpec((h, ci, 512), lambda i: (0, 0, i)),
            pl.BlockSpec((h, 512), lambda i: (0, i)),
            pl.BlockSpec((co, k * ci), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((co, 512), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((co, v), jnp.float32),
        interpret=True,
    )(xm.T, x_src.transpose(0, 2, 1), tap, w.reshape(k * ci, co).T)
    np.testing.assert_allclose(np.asarray(out_t.T), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_bandmm_dw_kernel_matches_xla(rng):
    import functools
    from jax.experimental import pallas as pl

    from mm2d3d_tpu.ops.pallas import bandmm as B

    h, v, ci, co, k = 3, 1024, 8, 8, 8
    x_src = jnp.asarray(rng.randn(h, v, ci).astype(np.float32))
    tap = np.full((h, v), k, np.int32)
    for hh in range(h):
        t = rng.randint(hh, k, size=v)
        t[rng.rand(v) < 0.5] = k
        tap[hh] = t
    tap = jnp.asarray(tap)
    g = jnp.asarray(rng.randn(v, co).astype(np.float32))

    ref = B._dw_xla(None, x_src, tap, g, k)
    out = pl.pallas_call(
        functools.partial(B._dw_kernel_t, k_taps=k, tap_lo=0,
                          has_center=False, has_slots=True),
        grid=(v // 512,),
        in_specs=[
            pl.BlockSpec((h, ci, 512), lambda i: (0, 0, i)),
            pl.BlockSpec((h, 512), lambda i: (0, i)),
            pl.BlockSpec((co, 512), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((co, k * ci), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((co, k * ci), jnp.float32),
        interpret=True,
    )(x_src.transpose(0, 2, 1), tap, g.T)
    np.testing.assert_allclose(np.asarray(out.T),
                               np.asarray(ref).reshape(k * ci, co),
                               rtol=1e-4, atol=1e-4)


def _head_inputs(rng, b, hp, wp, cins):
    return [
        jnp.asarray(rng.randn(b, hp, wp, c).astype(np.float32) * 0.5)
        for c in cins
    ]


def test_head_pool_pallas_matches_ref(rng):
    """Fused head kernel (interpreter mode) vs the XLA reference, over the
    boundary shapes the BlockSpecs must mask: h_real not a multiple of 16,
    w_real < wp, and a single-strip hp=16 input (ADVICE r2)."""
    from mm2d3d_tpu.ops.pallas import head2d as H

    for b, hp, wp, h_real, w_real, cins, c2 in [
        (1, 48, 32, 37, 25, (8, 16, 8), 8),   # odd crop in both dims
        (2, 16, 16, 16, 16, (8,), 8),         # single strip, no crop
        (1, 32, 24, 17, 24, (16, 8), 16),     # h_real just past one strip
    ]:
        inputs = _head_inputs(rng, b, hp, wp, cins)
        cin = sum(cins)
        w12 = jnp.asarray(rng.randn(3, 3, cin, c2).astype(np.float32) * 0.2)
        b12 = jnp.asarray(rng.randn(c2).astype(np.float32))
        ref = H._head_pool_ref(inputs, w12, b12, h_real, w_real, jnp.float32)
        w9 = jnp.concatenate(
            [w12[i, j] for i in range(3) for j in range(3)], axis=-1
        )
        out = H._head_pool_pallas(
            inputs, w9, b12, hp, wp, h_real, w_real, c2, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )


def test_head_pool_grad_matches_ref(rng):
    """head_pool's custom VJP == direct autodiff through the reference."""
    from mm2d3d_tpu.ops.pallas import head2d as H

    b, hp, wp, h_real, w_real, cins, c2 = 1, 32, 16, 21, 13, (8, 8), 8
    inputs = _head_inputs(rng, b, hp, wp, cins)
    cin = sum(cins)
    w12 = jnp.asarray(rng.randn(3, 3, cin, c2).astype(np.float32) * 0.2)
    b12 = jnp.asarray(rng.randn(c2).astype(np.float32))
    cot = jnp.asarray(rng.randn(b, h_real, w_real, c2).astype(np.float32))

    def loss_pool(xs, w, bb):
        return jnp.sum(H.head_pool(xs, w, bb, h_real, w_real, jnp.float32) * cot)

    def loss_ref(xs, w, bb):
        return jnp.sum(
            H._head_pool_ref(list(xs), w, bb, h_real, w_real, jnp.float32) * cot
        )

    g_pool = jax.grad(loss_pool, argnums=(0, 1, 2))(tuple(inputs), w12, b12)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(tuple(inputs), w12, b12)
    for a, r in zip(jax.tree_util.tree_leaves(g_pool),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)


def test_head_pool_supports_rejects_oversize_crop():
    from mm2d3d_tpu.ops.pallas import head2d as H

    assert H.supports(32, 16, 32, 16, 8)
    assert not H.supports(32, 16, 33, 16, 8)   # h_real > hp
    assert not H.supports(32, 16, 32, 17, 8)   # w_real > wp
    assert not H.supports(24, 16, 24, 16, 8)   # hp not strip-aligned
    assert not H.supports(32, 16, 0, 16, 8)    # empty crop


# ---------------------------------------------------------------------------
# fused propagate + tier-1 slot kernel (ops/pallas/propagate.py)
# ---------------------------------------------------------------------------

def _small_two_level(rng, n=3000, full_scale=64, batches=2):
    from mm2d3d_tpu.ops import hierarchy as H
    from mm2d3d_tpu.ops.voxelize import voxelize

    coords = rng.randint(0, full_scale, size=(n, 3)).astype(np.int32)
    batch = rng.randint(0, batches, size=(n,)).astype(np.int32)
    valid = rng.rand(n) < 0.9
    grid = voxelize(
        jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid),
        full_scale, capacity=2048,
    )
    grid_c, trans = H._coarsen_grid(grid, capacity=1024)
    nbr_c = H.build_nbr(grid_c)
    return grid, trans, nbr_c


def test_propagate_slots_kernel_matches_xla(rng):
    """Fused Pallas propagate+slots (interpreter mode) vs propagate_nbr +
    _rank_slots — nbr, tier-1 tables, and hit counts must be bit-equal."""
    from mm2d3d_tpu.ops import hierarchy as H

    grid, trans, nbr_c = _small_two_level(rng)
    h1 = 3

    nbr_ref = H.propagate_nbr(grid, trans, nbr_c)
    center = H._offset_index(0, 0, 0)
    off = jnp.asarray(np.delete(np.arange(27), center), np.int32)
    k_ids = [k for k in range(27) if k != center]
    src_ref, tap_ref, cnt_ref = H._rank_slots(
        jnp.take(nbr_ref, off, axis=0), grid.capacity, h1, 0, k_ids=k_ids
    )

    nbr, src1, tap1, cnt = H.propagate_nbr_slots(
        grid, trans, nbr_c, h1, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(nbr), np.asarray(nbr_ref))
    np.testing.assert_array_equal(np.asarray(src1), np.asarray(src_ref))
    np.testing.assert_array_equal(np.asarray(tap1), np.asarray(tap_ref))
    np.testing.assert_array_equal(np.asarray(cnt), np.asarray(cnt_ref))


def test_finish_slots_tiered_matches_full_build(rng):
    """finish_slots_tiered (the XLA overflow tiers fed by the kernel's cnt)
    vs build_slots_tiered end to end."""
    from mm2d3d_tpu.ops import hierarchy as H

    grid, trans, nbr_c = _small_two_level(rng)
    nbr = H.propagate_nbr(grid, trans, nbr_c)
    h1, h2, h_max, vm_cap, vh_cap = 2, 5, 26, 512, 128

    ref = H.build_slots_tiered(nbr, h1, h2, h_max, vm_cap, vh_cap)
    (s1r, t1r, imr, invmr, smr, tmr, ihr, shr, thr, dropr) = ref

    center = H._offset_index(0, 0, 0)
    off = jnp.asarray(np.delete(np.arange(27), center), np.int32)
    k_ids = [k for k in range(27) if k != center]
    s1, t1, cnt = H._rank_slots(
        jnp.take(nbr, off, axis=0), grid.capacity, h1, 0, k_ids=k_ids
    )
    im, invm, sm, tm, ih, sh, th, drop = H.finish_slots_tiered(
        nbr, cnt, h1, h2, h_max, vm_cap, vh_cap
    )
    for a, b in [(s1, s1r), (t1, t1r), (im, imr), (invm, invmr), (sm, smr),
                 (tm, tmr), (ih, ihr), (sh, shr), (th, thr), (drop, dropr)]:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_build_hierarchy_fused_flag_cpu_parity(rng):
    """build_hierarchy(fused_propagate=...) must produce identical slot
    tables either way (interpret-mode kernel vs XLA select trees)."""
    import functools

    from jax.experimental.pallas import tpu as pltpu

    from mm2d3d_tpu.ops import hierarchy as H
    from mm2d3d_tpu.ops.voxelize import voxelize

    n, fs = 2000, 64
    coords = rng.randint(0, fs, size=(n, 3)).astype(np.int32)
    batch = np.zeros(n, np.int32)
    valid = np.ones(n, bool)
    grid = voxelize(
        jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid), fs,
        capacity=2048,
    )
    slot_caps = ((2, 5, 26, 512, 128), (3, 26, 256), 4)

    ref = H.build_hierarchy(grid, 3, slot_caps=slot_caps,
                            fused_propagate=False)
    with pltpu.force_tpu_interpret_mode():
        fused = H.build_hierarchy(grid, 3, slot_caps=slot_caps,
                                  fused_propagate=True)
    for lr, lf in zip(ref.levels, fused.levels):
        for name in ("nbr", "slot_src", "slot_tap", "slot_idx", "slot_src2",
                     "slot_tap2", "slot_idxm", "slot_invm", "slot_srcm",
                     "slot_tapm", "slot_overflow"):
            a, b = getattr(lr, name), getattr(lf, name)
            assert (a is None) == (b is None), name
            if a is not None:
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b), err_msg=name
                )
