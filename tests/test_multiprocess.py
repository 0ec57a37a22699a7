"""Real multi-process distributed tests (the DDP-launch analog).

The reference validates its distributed path only by running real 4-GPU DDP
jobs (SURVEY §4: `torch.distributed.launch`, run.sh:1). Here the same seam —
distributed init, per-process dataset striping, host-local device placement,
cross-process confusion reduction — is driven by TWO actual OS processes
talking to a localhost `jax.distributed` coordinator on the CPU backend,
no hardware needed. Complements tests/test_multichip.py (single-process,
8 virtual devices), which cannot catch host-locality bugs like a mesh built
from another process's devices.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import json, sys
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_compile_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=int(sys.argv[2]),
                           process_id=int(sys.argv[3]))
# establish the Gloo context while both ranks are at the same early point:
# the first collective triggers context init with a ~30 s rendezvous
# timeout, which a compile-skewed rank could miss under load
from jax.experimental import multihost_utils
multihost_utils.sync_global_devices('start')
sys.path.insert(0, {repo!r})
from coarse3d_tpu.tools.evaluate import main
res = main(['--preset', 'tiny', '--synthetic', '8', '--batch_size', '2',
            '--num_workers', '1'])
print('RESULT ' + json.dumps(
    {{k: res[k] for k in ('mIoU_3D', 'mAcc_3D', 'scans')}}))
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _communicate_all(procs, timeout=900):
    """communicate() on every rank, killing ALL ranks if any hangs.

    A bare sequential communicate would leak both children on
    TimeoutExpired (they hold the coordinator port and wedge later runs)
    and can deadlock on a full pipe if the not-yet-drained rank floods
    stderr. Threaded drains + a finally-kill avoid both."""
    import concurrent.futures

    try:
        with concurrent.futures.ThreadPoolExecutor(len(procs)) as pool:
            futs = [pool.submit(p.communicate, timeout=timeout)
                    for p in procs]
            return [f.result(timeout=timeout + 30) for f in futs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()


def _run_world(n: int) -> list[dict]:
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                  if p])
    # one CPU device per process (conftest's 8-device flag would leak in)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD.format(repo=REPO),
             coord, str(n), str(i)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for i in range(n)
    ]
    outs = _communicate_all(procs)
    results = []
    for i, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"process {i} rc={p.returncode}\nstdout tail:\n"
            + "\n".join(out.splitlines()[-5:]) + "\nstderr tail:\n"
            + "\n".join(err.splitlines()[-15:]))
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert line, out
        results.append(json.loads(line[-1][len("RESULT "):]))
    return results


_TRAIN_CHILD = """
import sys
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_compile_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=int(sys.argv[2]),
                           process_id=int(sys.argv[3]))
# establish the Gloo context while both ranks are at the same early point:
# the first collective triggers context init with a ~30 s rendezvous
# timeout, which a compile-skewed rank could miss under load
from jax.experimental import multihost_utils
multihost_utils.sync_global_devices('start')
sys.path.insert(0, {repo!r})
from coarse3d_tpu.tools.train import main
# save_path is SHARED across ranks: orbax checkpointing is a collective
# (all processes join its barriers; the primary writes) and the Recorder
# is rank-0-only — mirroring a real pod with shared storage
main(['--preset', 'tiny', '--synthetic', '8', '--synthetic_points', '1500',
      '--epochs', '1', '--batch_size', '2', '--num_workers', '1',
      '--save_path', sys.argv[4]])
print('TRAIN DONE rank ' + sys.argv[3])
"""


@pytest.mark.slow
def test_two_process_training(tmp_path):
    """The full train CLI under a 2-process jax.distributed world: per-host
    pipeline stripes assemble into the global data-parallel batch
    (jax.make_array_from_process_local_data in parallel.shard_batch) and one
    epoch of the real Trainer completes with finite metrics on both ranks
    (the torch.distributed.launch analog, run.sh:1)."""
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                  if p])
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _TRAIN_CHILD.format(repo=REPO),
             coord, "2", str(i), str(tmp_path)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for i in range(2)
    ]
    outs = _communicate_all(procs)
    for i, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"rank {i} rc={p.returncode}\nstdout tail:\n"
            + "\n".join(out.splitlines()[-5:]) + "\nstderr tail:\n"
            + "\n".join(err.splitlines()[-15:]))
        assert f"TRAIN DONE rank {i}" in out
    # rank 0 recorded an epoch with finite losses and a validation pass
    log = (tmp_path / "log" / "console.log").read_text()
    assert "Train done" in log and "Validation done" in log
    assert "nan" not in log.lower()
    # the collective checkpoint save completed
    assert (tmp_path / "checkpoint").exists()


@pytest.mark.slow
def test_two_process_evaluate_matches_single_process():
    """8 synthetic scans striped over 2 processes must produce EXACTLY the
    single-process confusion-derived metrics on every rank (the reduction
    is an integer confusion-matrix sum — SURVEY §5.1 defect #6 fixed)."""
    two = _run_world(2)
    one = _run_world(1)
    assert two[0] == two[1], two
    assert two[0]["scans"] == 8
    np.testing.assert_allclose(two[0]["mIoU_3D"], one[0]["mIoU_3D"],
                               atol=1e-4)
    np.testing.assert_allclose(two[0]["mAcc_3D"], one[0]["mAcc_3D"],
                               atol=1e-4)
