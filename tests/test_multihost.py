"""TRUE multi-process data-parallel test (SURVEY §2.7).

The 8-virtual-device tests elsewhere run in ONE process; this spawns two
real `jax.distributed`-initialized CPU processes (4 devices each, localhost
coordinator) and drives the only seams a single process cannot:
`jax.distributed.initialize`, per-process loader shards
(`Loader(num_shards, shard_id)`), and
`jax.make_array_from_process_local_data` inside `parallel.mesh.shard_batch`
with process_count > 1.  Both processes must report the identical pmean'd
loss, equal to the single-process 8-device run on the same global batches.
"""

import os.path as osp
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

WORKER = osp.join(osp.dirname(__file__), "_multihost_worker.py")
REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _losses(out: str):
    got = re.findall(r"STEP (\d+) LOSS ([0-9.]+)", out)
    assert got, out
    return {int(i): float(v) for i, v in got}


def _run(process_id, port, timeout=600):
    env = dict(
        PATH="/usr/bin:/bin:/usr/local/bin",
        HOME="/root",
        PYTHONPATH=REPO,
        JAX_PLATFORMS="",  # the worker sets the platform via jax.config
    )
    return subprocess.Popen(
        [sys.executable, WORKER, str(process_id), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=REPO, env=env,
    )


def test_two_process_data_parallel_matches_single_process():
    port = _free_port()
    p0 = _run(0, port)
    p1 = _run(1, port)
    out0, err0 = p0.communicate(timeout=900)
    out1, err1 = p1.communicate(timeout=900)
    assert p0.returncode == 0, f"proc0 failed:\n{out0}\n{err0[-3000:]}"
    assert p1.returncode == 0, f"proc1 failed:\n{out1}\n{err1[-3000:]}"
    assert "WORKER OK" in out0 and "WORKER OK" in out1
    l0, l1 = _losses(out0), _losses(out1)

    # the pmean'd loss must agree exactly across processes
    assert l0 == l1, (l0, l1)

    # and match the single-process 8-device run on the same global batches.
    # Cross-process collectives reduce in a different order than the
    # single-process pmean, so step 0 agrees only to float reassociation
    # (~3e-6 observed); AdamW's 1/sqrt(v) amplifies that through step 1
    # (~1.5e-3 observed), so the later-step bound is loose by design.
    pref = _run(-1, port)
    outr, errr = pref.communicate(timeout=900)
    assert pref.returncode == 0, f"ref failed:\n{outr}\n{errr[-3000:]}"
    lr = _losses(outr)
    np.testing.assert_allclose(l0[0], lr[0], rtol=1e-4, err_msg=str((l0, lr)))
    np.testing.assert_allclose(l0[1], lr[1], rtol=5e-2, err_msg=str((l0, lr)))
