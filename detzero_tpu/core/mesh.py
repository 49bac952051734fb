"""Device mesh / distributed initialization.

Replaces the reference's NCCL launchers (common_utils.py:61-101,
detection/tools/train.py:71-73) with the XLA collectives stack:
`jax.distributed.initialize` per host and a `jax.sharding.Mesh` whose axes
carry data (and optionally model) parallelism. Gradient allreduce, BN-stat
sync, and eval gathers become psum/pmean/all_gather over ICI — no
shared-filesystem pickle gathers.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None):
    """Multi-host bootstrap. TPU pods auto-discover; SLURM/GCE shims pass
    explicit coordinator info (reference: init_dist_slurm, common_utils.py:61)."""
    if jax.process_count() > 1:
        return  # already initialized
    if coordinator is not None or "SLURM_PROCID" in os.environ:
        if coordinator is None:
            node_list = os.environ["SLURM_NODELIST"].split(",")[0]
            coordinator = f"{node_list}:{os.environ.get('MASTER_PORT', '12355')}"
            num_processes = int(os.environ["SLURM_NTASKS"])
            process_id = int(os.environ["SLURM_PROCID"])
        jax.distributed.initialize(coordinator, num_processes, process_id)


def make_mesh(data: int | None = None, model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh. Defaults to all devices on the data axis —
    the reference's only parallelism is DDP (SURVEY §2.8)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    return Mesh(devices.reshape(data, model), (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def get_dist_info():
    return jax.process_index(), jax.process_count()
