"""Checkpoint-restart recovery (SURVEY §5 failure-detection row).

A real OS process is killed mid-fit (os._exit right after a checkpoint —
no cleanup, simulating a crash); a second process resumes from the newest
checkpoint. The resumed run's losses must continue the killed run's
trajectory and, concatenated, equal an uninterrupted run bit-for-bit
(CPU determinism) — proving (params, opt_state) round-trip exactly.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "_recovery_worker.py")


def _run(env_extra, timeout=600):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(env_extra)
    return subprocess.run(
        [sys.executable, WORKER], env=env, timeout=timeout,
        capture_output=True, text=True,
    )


def _losses(path):
    steps, vals = [], []
    for line in open(path):
        if line.strip() == "KILLED":
            continue
        s, v = line.split()
        steps.append(int(s))
        vals.append(v)  # compare as strings: bit-identical formatting
    return steps, vals


def test_kill_and_resume_matches_uninterrupted(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    out_a = str(tmp_path / "a.txt")
    out_b = str(tmp_path / "b.txt")
    out_c = str(tmp_path / "c.txt")

    # A: crashes (exit 17) right after step 3's checkpoint
    r = _run({"RECOVERY_CKPT": ckpt, "RECOVERY_OUT": out_a,
              "RECOVERY_KILL_AFTER": "3"})
    assert r.returncode == 17, r.stderr[-2000:]
    steps_a, loss_a = _losses(out_a)
    assert steps_a == [0, 1, 2, 3]

    # B: resumes from the newest checkpoint and finishes
    r = _run({"RECOVERY_CKPT": ckpt, "RECOVERY_OUT": out_b,
              "RECOVERY_RESUME": "1"})
    assert r.returncode == 0, r.stderr[-2000:]
    steps_b, loss_b = _losses(out_b)
    assert steps_b == [4, 5, 6]

    # C: uninterrupted reference run (fresh checkpoint dir)
    r = _run({"RECOVERY_CKPT": str(tmp_path / "ckpt_c"),
              "RECOVERY_OUT": out_c})
    assert r.returncode == 0, r.stderr[-2000:]
    steps_c, loss_c = _losses(out_c)
    assert steps_c == list(range(7))
    assert loss_a + loss_b == loss_c  # bit-identical continuation
