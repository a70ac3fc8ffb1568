"""Device-mesh helpers.

The reference's distribution is NCCL data-parallel DDP
(main_task_retrieval.py:23,197-198). The TPU-native equivalent is a 1-D
``jax.sharding.Mesh`` over all chips with gradients psum'd over ICI inside
one compiled program — no process groups, no separate comm daemon.

The largest UniVL model is ~180M params (BERT-base + 6L visual + 2L cross +
3L decoder, hidden 768), so parameters are replicated (pure DP). The mesh
abstraction still leaves room for a model axis later.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh

DP_AXIS = "dp"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = DP_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Multi-host bootstrap (no reference equivalent — the reference is
    single-node torch.distributed.launch only, SURVEY §5).

    On TPU pods the arguments are auto-detected from the environment; on
    other platforms pass them explicitly. Returns jax.process_index().
    Data parallelism then spans hosts: the global mesh covers all chips,
    gradient psum rides ICI within a slice and DCN across slices — XLA
    picks the collectives, no user code changes.
    """
    import jax

    if num_processes is None and coordinator_address is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index()
