"""Multi-process distributed smoke test (P3, SURVEY §2.9).

Spawns two real OS processes that `jax.distributed.initialize` against a
local coordinator (2 virtual CPU devices each -> 4 global devices), run the
psum'd DP train step, and must produce losses/params identical to a
single-process run of the same global computation — the partition-invariance
that makes `parallel/distributed.py` more than unexecuted plumbing.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "_mp_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run(nprocs, out_path, timeout=420, _attempts=3):
    # _free_port releases the probe socket before the coordinator binds it
    # (TOCTOU); under parallel CI another process can steal it, so retry the
    # whole spawn on coordinator bind failure.
    for attempt in range(_attempts):
        try:
            return _run_once(nprocs, out_path, timeout)
        except AssertionError as e:
            if attempt + 1 < _attempts and "Address already in use" in str(e):
                continue
            raise


def _run_once(nprocs, out_path, timeout):
    procs = []
    port = _free_port()
    for pid in range(nprocs):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        env.update(
            MP_NPROCS=str(nprocs),
            MP_PROC_ID=str(pid),
            MP_COORD=f"127.0.0.1:{port}",
            MP_OUT=out_path,
            PYTHONPATH=os.path.dirname(HERE),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-2000:]}"
    return np.load(out_path)


def test_two_process_train_step_matches_single_process(tmp_path):
    two = _run(2, str(tmp_path / "two.npz"))
    one = _run(1, str(tmp_path / "one.npz"))
    assert int(two["nprocs"]) == 2 and int(two["ndev"]) == 4
    assert int(one["nprocs"]) == 1 and int(one["ndev"]) == 2
    np.testing.assert_allclose(two["loss"], one["loss"], rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(two["loss2"], one["loss2"], rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(two["tf"], one["tf"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(two["wc"], one["wc"], rtol=1e-5, atol=1e-7)
    # The optimizer actually moved the params (a real step happened).
    assert float(two["loss2"]) != float(two["loss"])
