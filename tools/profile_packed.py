"""In-graph comparison: two separate ResNet-34 encoders vs ONE packed
dual encoder (channels doubled, grouped or block-diagonal convs), plus
maxpool lowering variants.

python tools/profile_packed.py
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

ITERS = 10
B, H, W = 8, 240, 400


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    sys.path.insert(0, ".")

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
        print(f"{name:52s} {dt:8.2f} ms")
        return dt

    key = jax.random.PRNGKey(0)
    dn = ("NHWC", "HWIO", "NHWC")

    def conv(x, k, s=1, groups=1):
        return jax.lax.conv_general_dilated(
            x, k, (s, s), "SAME", dimension_numbers=dn,
            feature_group_count=groups,
        )

    # ---- maxpool variants on the stem output (full res) ----
    x64 = jax.random.normal(key, (B, H, W, 64), jnp.bfloat16)
    x128 = jax.random.normal(key, (B, H, W, 128), jnp.bfloat16)

    def mp_rw(x):
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    def mp_s2d(x):
        # 3x3 stride-2 maxpool via space-to-depth: all slices unit-stride.
        b, h, w, c = x.shape
        neg = jnp.finfo(x.dtype).min
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg)
        # phases: xp rows 2i+r for r in 0..2 -> block index i + (r>=2),
        # phase (r)%2 with offset; do it directly: s2d of xp[:, :-2] etc.
        # Simpler: s2d the padded array (h+2 even? h+2=242, w+2=402 -> crop)
        xp = xp[:, : h + 2 - ((h + 2) % 2), : w + 2 - ((w + 2) % 2), :]
        hh, ww = xp.shape[1] // 2, xp.shape[2] // 2
        s = xp.reshape(b, hh, 2, ww, 2, c).transpose(0, 1, 3, 2, 4, 5)
        # s[i,j,p,q] = xp[2i+p, 2j+q]; output o(i,j)=max over xp rows
        # 2i..2i+2 = blocks (i,p0),(i,p1),(i+1,p0); cols same.
        rows = [s[:, :-1, :, 0], s[:, :-1, :, 1], s[:, 1:, :, 0]]
        m = jnp.maximum(jnp.maximum(rows[0], rows[1]), rows[2])
        # m: (b, hh-1, ww, 2, c) max over the 3 rows, per col phase
        cols = [m[:, :, :-1, 0], m[:, :, :-1, 1], m[:, :, 1:, 0]]
        out = jnp.maximum(jnp.maximum(cols[0], cols[1]), cols[2])
        return out[:, : (h + 1) // 2, : (w + 1) // 2, :]

    # check equivalence
    a = np.asarray(jax.jit(mp_rw)(x64), np.float32)
    bb = np.asarray(jax.jit(mp_s2d)(x64), np.float32)
    print("maxpool s2d equal:", np.allclose(a, bb), a.shape, bb.shape)

    timeit("maxpool reduce_window 64ch", mp_rw, x64)
    timeit("maxpool s2d-shift 64ch", mp_s2d, x64)
    timeit("maxpool reduce_window 128ch", mp_rw, x128)
    timeit("maxpool s2d-shift 128ch", mp_s2d, x128)

    # ---- full encoder trunk: separate vs packed ----
    stage_sizes = (3, 4, 6, 3)
    widths = (64, 128, 256, 512)

    def make_kernels(rng, mult=1, cin0=64):
        ks = []
        cin = cin0 * mult
        for i, (blocks, w_) in enumerate(zip(stage_sizes, widths)):
            width = w_ * mult
            for b_ in range(blocks):
                s = 2 if (b_ == 0 and i > 0) else 1
                rng, k1, k2, k3 = jax.random.split(rng, 4)
                kk = {
                    "c1": jax.random.normal(k1, (3, 3, cin, width), jnp.bfloat16) * 0.05,
                    "c2": jax.random.normal(k2, (3, 3, width, width), jnp.bfloat16) * 0.05,
                    "s": s,
                }
                if s != 1 or cin != width:
                    kk["ds"] = jax.random.normal(k3, (1, 1, cin, width), jnp.bfloat16) * 0.05
                ks.append(kk)
                cin = width
        return ks

    def trunk(x, ks, groups=1, pool=mp_rw):
        x = pool(x)
        for kk in ks:
            idn = x
            g1 = groups if kk["c1"].shape[2] * groups == x.shape[-1] else 1
            y = jax.nn.relu(conv(x, kk["c1"], kk["s"], g1))
            g2 = groups if kk["c2"].shape[2] * groups == y.shape[-1] else 1
            y = conv(y, kk["c2"], 1, g2)
            if "ds" in kk:
                gd = groups if kk["ds"].shape[2] * groups == x.shape[-1] else 1
                idn = conv(x, kk["ds"], kk["s"], gd)
            x = jax.nn.relu(y + idn)
        return x

    ks_a = make_kernels(jax.random.PRNGKey(1))
    ks_b = make_kernels(jax.random.PRNGKey(2))
    ks_p = make_kernels(jax.random.PRNGKey(3), mult=2)  # dense 2x (blockdiag)
    ks_g = make_kernels(jax.random.PRNGKey(4))  # grouped: per-group kernels
    # grouped kernels: HWIO with I = cin/groups, O = cout_total
    ks_g2 = []
    for ka, kb in zip(ks_a, ks_b):
        kk = {"s": ka["s"]}
        for name in ("c1", "c2", "ds"):
            if name in ka:
                kk[name] = jnp.concatenate([ka[name], kb[name]], axis=3)
        ks_g2.append(kk)

    def two_encoders(x):
        return trunk(x, ks_a).sum() + trunk(x, ks_b).sum()

    def packed_dense(x2):
        return trunk(x2, ks_p).sum()

    def packed_grouped(x2):
        return trunk(x2, ks_g2, groups=2).sum()

    t2 = timeit("two separate encoders (trunk only)", two_encoders, x64)
    tp = timeit("packed block-diag 2x-dense trunk", packed_dense, x128)
    tg = timeit("packed grouped g=2 trunk", packed_grouped, x128)

    def packed_grouped_s2d(x2):
        return trunk(x2, ks_g2, groups=2, pool=mp_s2d).sum()

    timeit("packed grouped + s2d maxpool", packed_grouped_s2d, x128)

    def two_encoders_s2d(x):
        return trunk(x, ks_a, pool=mp_s2d).sum() + trunk(x, ks_b, pool=mp_s2d).sum()

    timeit("two separate + s2d maxpool", two_encoders_s2d, x64)


if __name__ == "__main__":
    main()
