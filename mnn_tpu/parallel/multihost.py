"""Multi-host distributed layer: jax.distributed init + two-level meshes.

This is a first-class NEW component — the reference is strictly
single-process (SURVEY.md §5.8: no NCCL/MPI/Gloo anywhere; its only
"transports" are host<->device staging and Hexagon FastRPC). The TPU-native
design scales across hosts with jax.distributed + GSPMD:

* one process per host, `initialize()` wires them into a single JAX runtime
  (coordinator handshake, global device view);
* a TWO-LEVEL mesh places the heavy collectives on the fast fabric:
  tensor-parallel (and sequence/expert if requested) axes span the chips
  WITHIN a host, riding ICI; data-parallel spans hosts over DCN, where the
  only per-step traffic is nothing at all for serving (each host decodes
  its own batch rows) and one gradient psum for training;
* cross-host batch placement for the serving engine: each host's scheduler
  admits requests into the batch rows whose KV-cache shards are local to
  its addressable devices (`local_batch_rows`), so prefill/decode never
  moves KV over DCN.

Single-process simulation: `two_level_mesh` accepts `hosts=` to carve a
flat (CPU-simulated) device list into contiguous per-"host" groups — the
same mesh topology the 2-host launch produces, testable on the virtual
8-device CPU backend (SURVEY.md §4's fake-backend trick).

Launch (2 hosts x 4 chips, serving at dp=2 tp=4):

    # host 0
    MNN_TPU_COORDINATOR=10.0.0.1:8476 MNN_TPU_NUM_PROCESSES=2 \
        MNN_TPU_PROCESS_ID=0 python -m mnn_tpu.cli serve --dp 2 --tp 4 ...
    # host 1
    MNN_TPU_COORDINATOR=10.0.0.1:8476 MNN_TPU_NUM_PROCESSES=2 \
        MNN_TPU_PROCESS_ID=1 python -m mnn_tpu.cli serve --dp 2 --tp 4 ...

(see docs/multihost.md for the full recipe).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Join the multi-host JAX runtime; returns True if distributed.

    Arguments default from env vars (MNN_TPU_COORDINATOR /
    MNN_TPU_NUM_PROCESSES / MNN_TPU_PROCESS_ID), falling through to JAX's
    own auto-detection on managed TPU pods (where jax.distributed.initialize
    needs no arguments). No-op (returns False) when neither is configured —
    single-host runs never pay the handshake.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "MNN_TPU_COORDINATOR")
    if num_processes is None and "MNN_TPU_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["MNN_TPU_NUM_PROCESSES"])
    if process_id is None and "MNN_TPU_PROCESS_ID" in os.environ:
        process_id = int(os.environ["MNN_TPU_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def two_level_mesh(
    dp: int,
    tp: int,
    *,
    hosts: Optional[int] = None,
    devices: Optional[Sequence] = None,
    axis_names: Tuple[str, str] = ("dp", "tp"),
) -> Mesh:
    """Mesh with `dp` as the slow (DCN / cross-host) axis and `tp` as the
    fast (ICI / intra-host) axis.

    Real multi-process runs (jax.process_count() > 1) use
    mesh_utils.create_hybrid_device_mesh, which orders devices so each
    dp row is exactly one host's chips. Single-process runs (including the
    virtual CPU mesh) carve the flat device list into `hosts` contiguous
    groups (default: dp groups) — contiguity is what makes the simulated
    topology faithful: every tp collective stays within one group.
    """
    devices = list(devices) if devices is not None else jax.devices()
    if dp * tp > len(devices):
        raise ValueError(f"need {dp * tp} devices, have {len(devices)}")
    if jax.process_count() > 1:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, tp),
            dcn_mesh_shape=(dp, 1),
        )
        return Mesh(arr, axis_names)
    hosts = hosts or dp
    if dp % hosts and hosts % dp:
        raise ValueError(f"hosts={hosts} incompatible with dp={dp}")
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names)


def process_of_dp_row(mesh: Mesh, dp_axis: str = "dp") -> np.ndarray:
    """[dp] array: the process id owning each dp row (its tp=0 device)."""
    names = list(mesh.axis_names)
    di = names.index(dp_axis)
    dev = np.moveaxis(mesh.devices, di, 0)
    flat = dev.reshape(dev.shape[0], -1)
    return np.asarray([d.process_index for d in flat[:, 0]])


def local_dp_rows(mesh: Mesh, dp_axis: str = "dp") -> np.ndarray:
    """dp-row indices whose shards live on THIS process — the rows this
    host's scheduler should admit requests into (cross-host batch
    placement: prefill and decode touch only host-local KV)."""
    owners = process_of_dp_row(mesh, dp_axis)
    return np.nonzero(owners == jax.process_index())[0]


def local_batch_rows(mesh: Mesh, max_batch: int,
                     dp_axis: str = "dp") -> np.ndarray:
    """Global batch-row indices owned by this process when `max_batch`
    rows are split evenly over the dp axis (the BatchEngine layout)."""
    ndp = mesh.shape[dp_axis]
    if max_batch % ndp:
        raise ValueError(f"max_batch {max_batch} not divisible by dp={ndp}")
    per = max_batch // ndp
    rows = local_dp_rows(mesh, dp_axis)
    return np.concatenate([np.arange(r * per, (r + 1) * per) for r in rows]) \
        if len(rows) else np.zeros((0,), np.int64)
