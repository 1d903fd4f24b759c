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
