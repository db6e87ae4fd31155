"""TRUE multi-process data-parallel execution test.

Spawns 2 real OS processes forming one jax.distributed CPU job (2 virtual
devices each -> a 4-device global mesh spanning processes), so
parallel.mesh._spans_processes() is actually true — reaching the
make_array_from_process_local_data assembly, uneven-batch pad agreement,
process-0 checkpoint gating and cross-process resume that single-process
tests cannot.  A single-process 4-device arm runs the identical global data
and the loss trajectories must agree (same SPMD program, same global batch).

The reference has no distributed execution at all (SURVEY §2d); this
validates the rebuild's fleet path end-to-end on localhost.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multiprocess_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_arm(n_proc, local_devices, tmpdir, timeout=900):
    """Run one arm (n_proc processes x local_devices devices); return the
    per-process result dicts."""
    port = _free_port()
    env_base = {
        **os.environ,
        "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        "OGC_MP_NPROC": str(n_proc),
        "OGC_MP_COORD": f"localhost:{port}",
        "OGC_MP_LOCAL_DEVICES": str(local_devices),
        "OGC_MP_EXP": os.path.join(tmpdir, f"exp{n_proc}"),
        # The worker pins its own XLA_FLAGS device count.
        "XLA_FLAGS": "",
    }
    procs, outs = [], []
    for pid in range(n_proc):
        out = os.path.join(tmpdir, f"out_{n_proc}_{pid}.json")
        outs.append(out)
        env = {**env_base, "OGC_MP_PID": str(pid), "OGC_MP_OUT": out}
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER], env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    results = []
    for pid, p in enumerate(procs):
        try:
            stdout, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"proc {pid} failed:\n{stdout[-4000:]}"
        with open(outs[pid]) as f:
            results.append(json.load(f))
    return results


def _spawn_arm(n_proc, local_devices, tmpdir, mode, exp, victim=1):
    port = _free_port()
    env_base = {
        **os.environ,
        "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        "OGC_MP_NPROC": str(n_proc),
        "OGC_MP_COORD": f"localhost:{port}",
        "OGC_MP_LOCAL_DEVICES": str(local_devices),
        "OGC_MP_EXP": exp,
        "OGC_MP_MODE": mode,
        "OGC_MP_VICTIM": str(victim),
        "XLA_FLAGS": "",
    }
    procs, outs = [], []
    for pid in range(n_proc):
        out = os.path.join(tmpdir, f"out_{mode}_{n_proc}_{pid}.json")
        outs.append(out)
        env = {**env_base, "OGC_MP_PID": str(pid), "OGC_MP_OUT": out}
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER], env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    return procs, outs


@pytest.mark.slow
def test_four_process_kill_and_resume(tmp_path):
    """Elastic-recovery protocol on a 4-process x 2-device jax.distributed
    job: one worker dies hard (os._exit) mid-training after a full-state
    checkpoint; the launcher tears the wounded job down; a FRESH 4-process
    job resumes from the checkpoint and must reproduce the uninterrupted
    single-process trajectory for the remaining steps."""
    import time

    exp = os.path.join(str(tmp_path), "elastic")

    # Golden arm: uninterrupted single-process 8-device run, steps 0..5.
    gprocs, gouts = _spawn_arm(1, 8, str(tmp_path), "golden",
                               exp + "_golden")
    stdout, _ = gprocs[0].communicate(timeout=900)
    assert gprocs[0].returncode == 0, stdout[-4000:]
    with open(gouts[0]) as f:
        golden = {int(k): v for k, v in json.load(f)["losses"].items()}

    # Interrupted arm: 4 x 2 devices; proc 1 dies after the step-2 ckpt.
    procs, _ = _spawn_arm(4, 2, str(tmp_path), "interrupted", exp, victim=1)
    victim = procs[1]
    deadline = time.time() + 600
    while victim.poll() is None and time.time() < deadline:
        time.sleep(1.0)
    assert victim.returncode == 42, (
        victim.returncode, victim.communicate()[0][-2000:]
        if victim.poll() is not None else "victim never died")
    # Checkpoint marker must exist before the death (write-then-die order).
    assert os.path.exists(os.path.join(exp, "CKPT_DONE"))
    # Survivors cannot progress past the dead peer's collectives: the
    # launcher (this test) detects the loss and tears the job down.
    for p in procs:
        if p.poll() is None:
            p.kill()
    for p in procs:
        p.communicate()

    # Resume arm: FRESH 4-process job restores full train state and
    # replays steps 3..5.
    rprocs, routs = _spawn_arm(4, 2, str(tmp_path), "resume", exp)
    for pid, p in enumerate(rprocs):
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in rprocs:
                q.kill()
            raise
        assert p.returncode == 0, f"resume proc {pid} failed:\n{stdout[-4000:]}"
    with open(routs[0]) as f:
        resumed = {int(k): v for k, v in json.load(f)["losses"].items()}
    with open(routs[3]) as f:
        resumed3 = {int(k): v for k, v in json.load(f)["losses"].items()}

    # Replicated scalars identical across the resumed job's processes.
    assert resumed == resumed3
    assert sorted(resumed) == [3, 4, 5]
    # Post-resume trajectory matches the uninterrupted golden run (same
    # per-step seeded data; cross-process reduction topology + Adam drift
    # bound the tolerance, see test_two_process_matches_single_process).
    for it in (3, 4, 5):
        np.testing.assert_allclose(resumed[it], golden[it],
                                   rtol=1e-3, atol=1e-6)


@pytest.mark.slow
def test_two_process_matches_single_process(tmp_path):
    two = _run_arm(2, 2, str(tmp_path))
    one = _run_arm(1, 4, str(tmp_path))

    # Replicated loss scalars must be identical across the two processes.
    np.testing.assert_allclose(two[0]["losses"], two[1]["losses"], rtol=0)
    assert two[0]["uneven_loss"] == two[1]["uneven_loss"]
    assert two[0]["resumed_loss"] == two[1]["resumed_loss"]

    # Same global data + same 4-device mesh program -> same trajectory as
    # the single-process arm.  Tolerances: cross-process reductions use a
    # different accumulation topology than the single-process psum, and the
    # per-step float drift compounds through Adam — observed ~1e-4 relative
    # by step 5.
    np.testing.assert_allclose(two[0]["losses"], one[0]["losses"],
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(two[0]["resumed_loss"], one[0]["resumed_loss"],
                               rtol=1e-3, atol=1e-6)
    assert np.isfinite(two[0]["uneven_loss"])
    assert np.isfinite(one[0]["uneven_loss"])
