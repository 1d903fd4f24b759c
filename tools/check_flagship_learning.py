"""Flagship-scale ON-DEVICE learning-trajectory regression check.

The production graph (7 planes, full_scale 4096, bf16, batch 8 src+trg)
never compiles under the CPU test tier — a flagship-only numerical
regression (bf16 accumulation, tier/capacity interplay, a broken adjoint
tier) would pass every CPU test and still train wrong.  This probe runs a
fixed-seed ~25-step train trajectory at exactly that configuration and
checks the first-step loss and the mean of the last 5 steps against a
recorded known-good band (CHECKS.json).

Usage:
    python tools/check_flagship_learning.py           # check vs the band
    python tools/check_flagship_learning.py --record  # (re)record the band
    python tools/check_flagship_learning.py --mutate  # fault injection:
        drop the compacted mid+heavy tiers from the submanifold adjoint
        (ops.spconv._DEBUG_DROP_COMPACT_TIERS_BWD) — forward exact,
        gradients wrong; the check MUST fail (exit 1 proves sensitivity)

Checks, against the recorded trajectory (CHECKS.json):
- first loss +-2% (pre-update forward; catches config/init regressions);
- last-5 mean +-5% (catches slow divergence);
- max PER-STEP relative deviation +-0.75% — the sensitive one: TPU runs
  are deterministic on a fixed backend (measured: repeat runs reproduce
  every step to 4 decimals), while the injected missing-adjoint-tier
  fault moves mid-trajectory steps by 1.3% yet the endpoint by only 0.45%
  (optimizers re-converge around small gradient errors) — endpoint-only
  bands MISS real backward bugs.  After a jax/XLA upgrade re-record the
  trajectory (MM2D3D_TRAJ_TOL widens the per-step gate while migrating).

Exit 0 = within band; 1 = out of band (or no recorded band).
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, ".")

STEPS = 25
LAST_K = 5
TOL_FIRST = 0.02
TOL_LAST = 0.05
TOL_STEP = float(os.environ.get("MM2D3D_TRAJ_TOL", "0.0075"))
CHECKS = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                  "CHECKS.json")


def run_trajectory(steps: int):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from __graft_entry__ import _flagship_task
    from mm2d3d_tpu.data.synthetic import make_batch

    task = _flagship_task()

    def mk(seed):
        return jax.tree_util.tree_map(
            jnp.asarray,
            make_batch(np.random.RandomState(seed), batch_size=8, height=225,
                       width=400, n_points=8192, num_classes=6,
                       full_scale=4096),
        )

    pairs = [(mk(0), mk(1)), (mk(2), mk(3))]  # two fixed src/trg pairs
    state = task.init_state(jax.random.PRNGKey(0), pairs[0][0])
    step = jax.jit(task.train_step)
    rng = jax.random.PRNGKey(7)

    losses = []
    t0 = time.perf_counter()
    for i in range(steps):
        src, trg = pairs[i % 2]
        state, logs = step(state, src, trg, rng)
        losses.append(logs["train/loss_total"])
    losses = [float(np.asarray(x)) for x in losses]
    dt = time.perf_counter() - t0
    print(f"{steps} steps in {dt:.1f}s; losses: "
          f"{[round(x, 4) for x in losses]}", flush=True)
    assert all(np.isfinite(x) for x in losses), "non-finite loss"
    return losses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--record", action="store_true")
    ap.add_argument("--mutate", action="store_true")
    ap.add_argument("--steps", type=int, default=STEPS)
    args = ap.parse_args()

    if args.mutate:
        from mm2d3d_tpu.ops import spconv

        spconv._DEBUG_DROP_COMPACT_TIERS_BWD = True
        print("MUTATED: compacted adjoint tiers dropped from backward",
              flush=True)

    losses = run_trajectory(args.steps)
    first = losses[0]
    last = float(np.mean(losses[-LAST_K:]))

    checks = {}
    if osp.exists(CHECKS):
        with open(CHECKS) as f:
            checks = json.load(f)

    if args.record:
        import jax

        checks["flagship_learning"] = {
            "first_loss": round(first, 4),
            "last_loss_mean": round(last, 4),
            "losses": [round(x, 4) for x in losses],
            "steps": args.steps,
            "last_k": LAST_K,
            "tol_first": TOL_FIRST,
            "tol_last": TOL_LAST,
            "tol_step": TOL_STEP,
            "env": f"jax {jax.__version__}, "
                   f"{jax.devices()[0].platform} backend",
        }
        with open(CHECKS, "w") as f:
            json.dump(checks, f, indent=1)
        print(f"recorded: first={first:.4f} last{LAST_K}={last:.4f}")
        return 0

    band = checks.get("flagship_learning")
    if band is None:
        print("no recorded band in CHECKS.json — run with --record first")
        return 1
    ok_first = abs(first - band["first_loss"]) <= TOL_FIRST * band["first_loss"]
    ok_last = abs(last - band["last_loss_mean"]) <= TOL_LAST * band["last_loss_mean"]
    ref = band.get("losses")
    ok_steps, max_dev = True, 0.0
    if ref and len(ref) == len(losses):
        devs = [abs(l - r) / max(abs(r), 1e-6) for l, r in zip(losses, ref)]
        max_dev = max(devs)
        ok_steps = max_dev <= TOL_STEP
    print(
        f"first {first:.4f} vs {band['first_loss']} "
        f"({'ok' if ok_first else 'OUT OF BAND'}); "
        f"last{LAST_K} {last:.4f} vs {band['last_loss_mean']} "
        f"({'ok' if ok_last else 'OUT OF BAND'}); "
        f"max per-step dev {max_dev:.2%} vs {TOL_STEP:.2%} "
        f"({'ok' if ok_steps else 'OUT OF BAND'})"
    )
    if not (ok_first and ok_last and ok_steps):
        print("FLAGSHIP LEARNING CHECK FAILED — the production graph's "
              "numerics moved; do not trust flagship training until "
              "explained (a re-record is only valid after diagnosing why)")
        return 1
    print("flagship learning check: OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
