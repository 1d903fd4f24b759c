"""Device-side image preparation: /255 + ColorJitter on the TPU.

The reference jitters images on the CPU inside the DataLoader workers
(torchvision ColorJitter, consumed by ``lib/dataset/nuscenes_dataloader.py:
285-297``).  TPU-native wire format ships the RAW uint8 pixels (4x less
host->device traffic than float32) plus a per-sample (4,) parameter vector
(`data.augment.draw_jitter_params`), and applies the jitter here — a few
fused elementwise ops XLA folds into the stem convolutions, effectively
free on device.

Exactness: the factors and op ORDER are drawn host-side from the same RNG
stream as the host jitter (`data.augment.color_jitter`), so the two paths
produce the same image up to float reduction order.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp

# canonical op order (brightness, contrast, saturation); the host encodes
# the applied order as an index into these 6 permutations
JITTER_PERMS = tuple(itertools.permutations(range(3)))

_GRAY = (0.299, 0.587, 0.114)


def _brightness(im, f):
    return im * f


def _contrast(im, f):
    gray = _GRAY[0] * im[..., 0] + _GRAY[1] * im[..., 1] + _GRAY[2] * im[..., 2]
    return im * f + gray.mean() * (1.0 - f)


def _saturation(im, f):
    gray = (
        _GRAY[0] * im[..., 0] + _GRAY[1] * im[..., 1] + _GRAY[2] * im[..., 2]
    )[..., None]
    return im * f + gray * (1.0 - f)


_OPS = (_brightness, _contrast, _saturation)


def _jitter_one(im: jax.Array, params: jax.Array) -> jax.Array:
    factors = params[:3]
    order = params[3].astype(jnp.int32)

    def branch(perm):
        def run(im):
            for k in perm:
                im = _OPS[k](im, factors[k])
            return im

        return run

    im = jax.lax.switch(order, [branch(p) for p in JITTER_PERMS], im)
    return jnp.clip(im, 0.0, 1.0)


def apply_color_jitter(img: jax.Array, params: jax.Array) -> jax.Array:
    """img: (B, H, W, 3) float32 in [0,1]; params: (B, 4) float32
    [f_brightness, f_contrast, f_saturation, order_index]."""
    return jax.vmap(_jitter_one)(img, params)
