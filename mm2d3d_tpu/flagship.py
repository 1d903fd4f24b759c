"""The flagship task configuration — single source of truth.

nuScenes USA->Singapore production configuration (configs/config.yaml:
models/losses; reference config/config.yaml:20-27,105-106): 6 classes with
the computed class weights, 7-plane m=16 sparse U-Net over full_scale 4096,
bf16 compute.  `__graft_entry__.py` (driver entry), `bench.py`, and
`tools.autotune` all build their task from here so a flagship change can
never leave one of them probing a stale configuration.
"""

from __future__ import annotations


def flagship_task(compute_dtype=None, **over):
    import jax.numpy as jnp

    from .train.step import MM2D3DTask

    kwargs = dict(
        num_classes=6,
        class_weights=[1.9241476, 1.0, 2.16763851, 2.78254323,
                       1.54875664, 1.85686537],
        lambda_xm_src=1.0,
        lambda_xm_trg=0.1,
        full_scale=4096,
        num_planes=7,
        m=16,
        compute_dtype=compute_dtype or jnp.bfloat16,
    )
    kwargs.update(over)
    return MM2D3DTask(**kwargs)
