"""Device mesh + sharding layer.

TPU-native replacement for the reference's NCCL/DDP runtime
(model/train.py:148-155,649-655): a 1-D ``data`` mesh over ICI with GSPMD
shardings. Gradient all-reduce is implicit in pjit (params replicated, batch
sharded); the reference's explicit scalar all-reduces (train.py:1136-1141)
become host-side sums over process-sharded eval streams plus device-level
psums inside the jitted step.

Multi-host: ``initialize_distributed`` wraps jax.distributed.initialize
(DCN rendezvous), and ``sync_global_devices``/``host_allreduce_sum`` replace
dist.barrier / dist.all_reduce for host-side coordination.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.experimental import mesh_utils, multihost_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host rendezvous (replaces init_process_group("nccl"),
    reference train.py:150). No-op for single-process runs."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the first n) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    mesh_devices = mesh_utils.create_device_mesh(
        (len(devices),), devices=np.asarray(devices))
    return Mesh(mesh_devices, ("data",))


def make_mesh_from_cfg(cfg) -> Mesh:
    """Build the device mesh from TPU.mesh_shape / TPU.mesh_axes.

    The framework implements 1-D data parallelism (the reference's only
    strategy, SURVEY §2.2); any other axis layout fails loud rather than
    silently training unsharded. mesh_shape [-1] spans all devices; a
    positive size takes the first N.
    """
    axes = list(getattr(cfg.TPU, "mesh_axes", ["data"]))
    shape = list(getattr(cfg.TPU, "mesh_shape", [-1]))
    if axes != ["data"] or len(shape) != 1:
        raise NotImplementedError(
            f"TPU.mesh_axes={axes} / mesh_shape={shape}: only the 1-D "
            "['data'] mesh is implemented")
    n = int(shape[0])
    return make_mesh(n_devices=None if n <= 0 else n)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """[tgt, bsz] batches: shard the batch axis."""
    return NamedSharding(mesh, P(None, "data"))


def chunked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """[chunk, tgt, bsz_c] micro-batched batches: shard bsz_c."""
    return NamedSharding(mesh, P(None, None, "data"))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Per-row flags [bsz]."""
    return NamedSharding(mesh, P("data"))


def chunked_row_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(None, "data"))


def mems_sharding(mesh: Mesh) -> NamedSharding:
    """Chunk-stacked memory [chunk, L+1, M, bsz_c, d]: shard bsz_c."""
    return NamedSharding(mesh, P(None, None, None, "data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sync_global_devices(name: str):
    """Barrier across hosts (replaces dist.barrier, train.py:65-71)."""
    if jax.process_count() > 1:
        multihost_utils.sync_global_devices(name)


def host_allreduce_sum(values: np.ndarray) -> np.ndarray:
    """Sum scalars across hosts (replaces explicit dist.all_reduce on
    logging/eval scalars, train.py:1136-1141,1194-1195)."""
    if jax.process_count() > 1:
        return np.asarray(multihost_utils.process_allgather(
            np.asarray(values))).sum(axis=0)
    return np.asarray(values)
