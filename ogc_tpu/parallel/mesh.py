"""Device-mesh helpers for data-parallel training.

The reference is single-GPU (SURVEY §2d); here data parallelism over the
batch axis is first-class: a 1-D `jax.sharding.Mesh` over all local devices,
batches sharded on axis 0, parameters replicated.  Gradient reduction is the
mean over the global batch — XLA inserts the psum over ICI automatically when
the jitted loss averages over a sharded axis.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# The canonical batch axis name: every mesh in the framework is 1-D over
# it, and manual-SPMD (shard_map) regions bind it for pmeans.
DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = "data") -> Mesh:
    """1-D data mesh.  The default device list is jax.devices() — under
    multi-host initialization (jax.distributed.initialize) that is already
    the GLOBAL device list, so the same call covers fleet runs: collectives
    ride ICI within a host/pod slice and DCN across hosts."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def _spans_processes(mesh: Mesh) -> bool:
    """True when the mesh contains devices from more than one process."""
    return len({d.process_index for d in mesh.devices.flat}) > 1


def _local_device_count(mesh: Mesh) -> int:
    """Number of THIS process's devices in the mesh (= the mesh size on a
    single host / sub-mesh)."""
    pi = jax.process_index()
    return sum(1 for d in mesh.devices.flat if d.process_index == pi)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard axis 0 of arrays across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis: str = "data") -> Any:
    """Device-put a pytree of host arrays with axis-0 sharding.  Batch dim
    must be divisible by the mesh size (use pad_batch otherwise).

    Multi-host: when the mesh spans several processes, each process passes
    its PROCESS-LOCAL slice of the batch (its own DataLoader shard) and the
    global array is assembled via jax.make_array_from_process_local_data —
    the standard multi-host input pipeline (each host feeds only the shards
    its devices own; no cross-host data movement)."""
    sharding = batch_sharding(mesh, axis)
    if _spans_processes(mesh):
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_padded(mesh: Mesh, arrays: Sequence[Any], axis: str = "data"):
    """Pad axis 0 to the next multiple of the mesh size (repeating the last
    element), then shard.  Returns (sharded_tuple, true_b); callers slice
    per-sample outputs back to ``true_b`` host-side.  This keeps full data
    parallelism on a non-divisible final batch (the reference is single-
    device and never faces one); the padded duplicates give that batch's
    mean a slight duplicate weighting, bounded by (pad/true_b)."""
    # Pad to the PER-PROCESS device count of THIS mesh: under multi-host
    # each process holds only its local slice (see shard_batch), so
    # divisibility is required w.r.t. the devices this process feeds.  For
    # single-host (sub-)meshes this is just the mesh size.
    b = arrays[0].shape[0]
    if _spans_processes(mesh):
        # make_array_from_process_local_data infers the GLOBAL shape from
        # each process's local shape — every process must therefore pad its
        # final (possibly uneven) batch to the SAME local size, agreed on
        # via an allgather of the local true counts.
        from jax.experimental import multihost_utils

        n_dev = _local_device_count(mesh)
        all_b = np.asarray(
            multihost_utils.process_allgather(np.int32(b))
        ).reshape(-1)
        pad_to = -(-int(all_b.max()) // n_dev) * n_dev
    else:
        n_dev = mesh.devices.size
        pad_to = -(-b // n_dev) * n_dev
    if pad_to != b:
        arrays = pad_batch(tuple(arrays), pad_to)
    return tuple(shard_batch(mesh, a, axis) for a in arrays), b


def global_batch_size(mesh: Mesh, b_local: int) -> int:
    """Process-consistent GLOBAL true batch size for a shard_padded batch.

    Single-process meshes: the local count is the global count.  Multi-host:
    allgather the per-process true counts and sum — every process gets the
    identical scalar (jitted steps keyed on such scalars must receive the
    same value everywhere or the SPMD programs diverge)."""
    if not _spans_processes(mesh):
        return int(b_local)
    from jax.experimental import multihost_utils

    all_b = np.asarray(
        multihost_utils.process_allgather(np.int32(b_local))
    ).reshape(-1)
    return int(all_b.sum())


def manual_jit(fn, mesh: Mesh, in_batch, out_batch, axis: str = DATA_AXIS):
    """jit(shard_map(fn)) with positional replicated/batch-sharded specs.

    :param in_batch / out_batch: one bool per argument / output — True
        shards axis 0 over the mesh, False replicates (a False also serves
        as a pytree-prefix spec for whole parameter trees).

    check_vma=False throughout: the models' internal fori_loops seed
    carries from constants (unvarying), which the manual-axes type check
    rejects, and none of the wrapped steps rely on the replication
    checking (their cross-device semantics are explicit pmeans)."""
    spec = lambda b: P(axis) if b else P()  # noqa: E731
    return jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=tuple(spec(b) for b in in_batch),
        out_specs=tuple(spec(b) for b in out_batch),
        check_vma=False,
    ))


def dp_eval_fwd(jitted, params: Any, n_devices: int = 0, axis: str = "data",
                manual: bool = True):
    """Wrap a jitted per-batch eval forward for data-parallel serving.

    :param jitted: jitted fn(params, *batch_arrays) -> pytree of arrays
        with a leading batch axis.
    :param n_devices: devices to spread the batch over; 0 = all local
        devices, 1 = plain single-device wrapper (no mesh).
    :param manual: partition via shard_map (manual SPMD) instead of GSPMD.
        Inside the manual region every array is the per-device local shard,
        so the Mosaic kernels (FPS/flash-KNN/ball/pool) lower on the mesh —
        under plain GSPMD jax refuses to partition them and the dispatch
        gates fall back to XLA paths (ops.core.pallas_available).  Eval
        forwards need no cross-device collectives, making manual mode a
        pure win; identical math either way.
    :return: fn(*host_arrays) -> same pytree as np arrays, sliced back to
        the true (unpadded) batch.

    Eval forwards are per-sample independent (norms read running stats /
    per-sample statistics), so sharding the batch axis is exact: the
    forward partitions over the mesh and the padded duplicate rows are
    sliced off host-side before any metric sees them.  The reference
    evaluates on one GPU (test_seg.py:101-160); multi-device eval is
    TPU-first serving surface on top of the same math.
    """
    devices = jax.local_devices()
    n = len(devices) if n_devices == 0 else n_devices
    if n > len(devices):
        raise ValueError(
            f"n_devices={n_devices} exceeds the {len(devices)} local "
            "devices (multi-host serving shards each process's loader "
            "separately; pass 0 for all local devices)"
        )
    if n <= 1:
        def fwd1(*arrays):
            out = jitted(params, *arrays)
            return jax.tree_util.tree_map(np.asarray, out)

        return fwd1
    mesh = make_mesh(devices[:n], axis)
    rep = replicate(mesh, params)

    if manual:
        # in_specs must match the call arity — build on first call.  The
        # output spec is a single P(axis) pytree prefix (every output leaf
        # has a leading batch axis per the docstring contract), so
        # manual_jit's per-output tuple form does not apply here.
        state = {}

        def fwd(*arrays):
            sh, b = shard_padded(mesh, [np.asarray(a) for a in arrays], axis)
            if "run" not in state:
                state["run"] = jax.jit(jax.shard_map(
                    jitted, mesh=mesh,
                    in_specs=(P(),) + (P(axis),) * len(sh),
                    out_specs=P(axis),
                    check_vma=False,  # see manual_jit
                ))
            out = state["run"](rep, *sh)
            return jax.tree_util.tree_map(lambda y: local_values(y, b), out)

        return fwd

    def fwd(*arrays):
        sh, b = shard_padded(mesh, [np.asarray(a) for a in arrays], axis)
        out = jitted(rep, *sh)
        return jax.tree_util.tree_map(lambda y: local_values(y, b), out)

    return fwd


def local_values(arr: Any, true_b: Optional[int] = None) -> np.ndarray:
    """Host-fetch the process-local axis-0 rows of a (possibly multi-host
    sharded) array, sliced back to this process's true batch count.

    Jitted steps over a process-spanning mesh return GLOBAL arrays whose
    remote shards are not addressable — np.asarray on them raises.  This
    assembles only the addressable shards, ordered by their global axis-0
    offset, which under shard_batch's process-local assembly is exactly the
    rows this process fed in."""
    if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
        shards = sorted(
            arr.addressable_shards,
            key=lambda s: (s.index[0].start or 0) if s.index else 0,
        )
        out = np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    else:
        out = np.asarray(arr)
    if true_b is not None:
        out = out[:true_b]
    return out


def pad_batch(batch: Any, target_b: int) -> Any:
    """Pad axis 0 to `target_b` by repeating the last element (shape
    stability for jit; callers slice host-side results back)."""

    def _pad(x):
        b = x.shape[0]
        if b == target_b:
            return x
        reps = np.repeat(x[-1:], target_b - b, axis=0)
        return np.concatenate([x, reps], axis=0)

    return jax.tree_util.tree_map(_pad, batch)
