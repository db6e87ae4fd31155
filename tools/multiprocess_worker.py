"""Worker for the TRUE multi-process data-parallel test.

Spawned by tests/test_multiprocess.py (and runnable by hand) as N real
OS processes that form one jax.distributed job on localhost CPU, each
contributing 2 virtual devices to a global 2N-device mesh.  This makes
`parallel.mesh._spans_processes()` actually true, driving the code paths a
single-process 8-device test can never reach:

- jax.make_array_from_process_local_data batch assembly (mesh.py shard_batch)
- the allgathered uneven-final-batch padding (mesh.py shard_padded)
- process-consistent `it * global_batch` scalars (train/seg.py train_it)
- local_values() shard reassembly of globally-sharded jitted outputs
- process-0-only checkpoint writes + cross-process resume

The reference has no distributed layer at all (SURVEY §2d); this validates
the fleet path of the TPU rebuild on localhost.  Run (2 procs):

    OGC_MP_NPROC=2 OGC_MP_PID=0 OGC_MP_COORD=localhost:9876 \
        OGC_MP_OUT=/tmp/p0.json python tools/multiprocess_worker.py &
    OGC_MP_NPROC=2 OGC_MP_PID=1 OGC_MP_COORD=localhost:9876 \
        OGC_MP_OUT=/tmp/p1.json python tools/multiprocess_worker.py
"""

import json
import os
import sys

N_PROC = int(os.environ["OGC_MP_NPROC"])
PID = int(os.environ["OGC_MP_PID"])
LOCAL_DEVICES = int(os.environ.get("OGC_MP_LOCAL_DEVICES", "2"))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

if N_PROC > 1:
    jax.distributed.initialize(
        coordinator_address=os.environ["OGC_MP_COORD"],
        num_processes=N_PROC,
        process_id=PID,
    )

import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

from ogc_tpu.losses.seg_unsup import OGCLossConfig  # noqa: E402
from ogc_tpu.models.segnet import MaskFormer3D  # noqa: E402
from ogc_tpu.parallel import mesh as pmesh  # noqa: E402
from ogc_tpu.train.seg import SegTrainer, make_optimizer  # noqa: E402
from ogc_tpu.utils.checkpoint import wait_pending_saves  # noqa: E402


def barrier(name):
    if N_PROC > 1:
        multihost_utils.sync_global_devices(name)


def local_slice(global_arr):
    """This process's contiguous row block of a globally-batched array."""
    per = global_arr.shape[0] // N_PROC
    return global_arr[PID * per : (PID + 1) * per]


def make_batch(rng, b_global, n_points=128, t=2):
    pcs = rng.randn(b_global, t, n_points, 3).astype(np.float32)
    flows = 0.05 * rng.randn(b_global, t, n_points, 3).astype(np.float32)
    segms = rng.randint(0, 2, size=(b_global, t, n_points)).astype(np.int32)
    valids = np.ones((b_global, t, n_points), dtype=bool)
    return pcs, segms, flows, valids


def make_step_batch(it, b_global, n_points=128, t=2):
    """Per-step deterministic batch (seeded by the step index) so an
    interrupted-and-resumed job regenerates the exact data stream."""
    rng = np.random.RandomState(1000 + it)
    return make_batch(rng, b_global, n_points, t)


def _build_trainer(model, params, mesh, exp_base):
    return SegTrainer(
        model=model, params=params,
        loss_cfg=OGCLossConfig(weights=(10.0, 0.1, 0.0),
                               start_steps=(0, 0, 0)),
        optimizer=make_optimizer(1e-3, 0.7, 1e-5, 200000, 8),
        aug_transform_epoch=9999, ignore_npoint_thresh=0,
        exp_base=exp_base, mesh=mesh,
    )


def run_elastic_mode(mode, model, params, mesh, exp_base, out_path):
    """Kill-and-resume protocol (tests/test_multiprocess.py, 4 proc x 2 dev):

    golden:       uninterrupted steps 0..5 (single process), dump losses.
    interrupted:  steps 0..2, full-state checkpoint (epoch=3), barrier,
                  marker file; then the victim process dies hard
                  (os._exit) mid-job while the others attempt step 3 —
                  they cannot progress past the dead peer's collectives
                  (the launcher tears them down), modelling a worker loss.
    resume:       a FRESH jax.distributed job restores the full train
                  state from the interrupted job's checkpoint and replays
                  steps 3..5; its loss trajectory must match golden's.
    """
    victim = int(os.environ.get("OGC_MP_VICTIM", "1"))
    trainer = _build_trainer(model, params, mesh, exp_base)
    losses = {}

    start = 0
    if mode == "resume":
        epoch = trainer.resume(os.path.join(exp_base, "best"))
        assert epoch == 3, epoch
        start = 3

    for it in range(start, 6):
        batch = tuple(local_slice(a) for a in make_step_batch(it, 8))
        ld, _, _ = trainer.train_it(it, batch)
        losses[it] = ld["sum"]

        if mode == "interrupted" and it == 2:
            trainer.save(True, epoch=3)
            wait_pending_saves()
            barrier("ckpt-written")
            if PID == 0:
                with open(os.path.join(exp_base, "CKPT_DONE"), "w") as f:
                    f.write("ok")
            if PID == victim:
                os._exit(42)  # hard worker loss, no cleanup

    barrier("done")
    with open(out_path, "w") as f:
        json.dump({"losses": losses, "mode": mode}, f)
    print(f"proc {PID}/{N_PROC} {mode} ok: {losses}")


def main():
    out_path = os.environ["OGC_MP_OUT"]
    exp_base = os.environ["OGC_MP_EXP"]
    mode = os.environ.get("OGC_MP_MODE", "full")
    n_devices = len(jax.devices())
    assert n_devices == N_PROC * LOCAL_DEVICES, (n_devices, N_PROC)

    model = MaskFormer3D(
        n_slot=4, n_point=128, arch="sapien",
        n_transformer_layer=1, transformer_embed_dim=64,
    )
    pc0 = jax.numpy.zeros((1, 128, 3))
    params = model.init(jax.random.PRNGKey(0), pc0, pc0)

    mesh = pmesh.make_mesh(jax.devices())
    if mode != "full":
        run_elastic_mode(mode, model, params, mesh, exp_base, out_path)
        return

    trainer = _build_trainer(model, params, mesh, exp_base)

    rng = np.random.RandomState(0)  # identical global data on every process
    losses = []
    # Phase 1: divisible batches — loss trajectory must be identical across
    # arms (single-process 4-device vs 2-process 2x2-device).
    for it in range(3):
        pcs, segms, flows, valids = make_batch(rng, b_global=8)
        batch = tuple(local_slice(a) for a in (pcs, segms, flows, valids))
        ld, segm, mask = trainer.train_it(it, batch)
        assert mask.shape[0] == segm.shape[0] == 8 // N_PROC
        losses.append(ld["sum"])

    # Phase 2: uneven final batch — processes get DIFFERENT local counts
    # (3 rows over 2 processes: p0 gets 2, p1 gets 1); exercises the
    # allgathered pad agreement + local_values true-count slicing.
    pcs, segms, flows, valids = make_batch(rng, b_global=3)
    if N_PROC > 1:
        lo, hi = (0, 2) if PID == 0 else (2, 3)
    else:
        lo, hi = 0, 3
    batch = tuple(a[lo:hi] for a in (pcs, segms, flows, valids))
    ld, segm, mask = trainer.train_it(3, batch)
    assert mask.shape[0] == hi - lo, (mask.shape, hi - lo)
    uneven_loss = ld["sum"]

    # Phase 3: checkpoint (process-0-only write) + cross-process resume.
    trainer.save(True, epoch=7)
    wait_pending_saves()
    barrier("ckpt-written")
    trainer2 = SegTrainer(
        model=model, params=params,
        loss_cfg=OGCLossConfig(weights=(10.0, 0.1, 0.0), start_steps=(0, 0, 0)),
        optimizer=make_optimizer(1e-3, 0.7, 1e-5, 200000, 8),
        aug_transform_epoch=9999, ignore_npoint_thresh=0,
        exp_base=exp_base + "_resume", mesh=mesh,
    )
    epoch = trainer2.resume(os.path.join(exp_base, "best"))
    assert epoch == 7, epoch
    pcs, segms, flows, valids = make_batch(rng, b_global=8)
    batch = tuple(local_slice(a) for a in (pcs, segms, flows, valids))
    ld, _, _ = trainer2.train_it(4, batch)
    resumed_loss = ld["sum"]

    barrier("done")
    with open(out_path, "w") as f:
        json.dump(
            {"losses": losses, "uneven_loss": uneven_loss,
             "resumed_loss": resumed_loss, "n_devices": n_devices},
            f,
        )
    print(f"proc {PID}/{N_PROC} ok: losses={losses}")


if __name__ == "__main__":
    main()
    sys.exit(0)
