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
