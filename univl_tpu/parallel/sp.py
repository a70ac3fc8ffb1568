"""Megatron-style sequence parallelism over the tp axis.

With tensor parallelism alone (parallel/tp.py), GSPMD keeps the
activations replicated within each tp group: every device redundantly
computes the LayerNorm / dropout / residual regions on the full
[B, L, H] stream, and each row-parallel matmul ends in an all-reduce.
Sequence parallelism (arXiv:2205.05198 §4.2, re-designed for GSPMD)
shards those regions over the SEQUENCE dim instead: the all-reduce
splits into reduce-scatter (into the sequence-sharded LN region) +
all-gather (back to full sequence before the next column-parallel
matmul) — same bytes on the ICI wire, while the non-matmul compute and
its activation memory divide by the tp size.

TPU-native mechanics: no hand-written collectives. The transformer
blocks drop a ``with_sharding_constraint(x, P(None, 'tp', None))`` on
the residual stream at each block boundary (nn/layers.py, gated by
``seq_shard``) and GSPMD places the reduce-scatter/all-gather pair.
The constraint self-gates on the trace-time abstract mesh, so the same
model code runs unchanged on a single device, under pure dp, or in
eval-side jits where no tp axis exists.

No reference equivalent (the reference is DP-only NCCL,
main_task_retrieval.py:23,197-198). Correctness: dp x tp + sp == dp-only
trajectory, tests/test_tp.py.
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P, get_abstract_mesh

from univl_tpu.parallel.tp import TP_AXIS


def _tp_is_auto_axis() -> bool:
    mesh = get_abstract_mesh()
    if mesh is None or TP_AXIS not in getattr(mesh, "axis_names", ()):
        return False
    try:  # tp must be an Auto (GSPMD) axis, not shard_map-manual
        import jax.sharding as jsh

        kind = dict(zip(mesh.axis_names, mesh.axis_types))[TP_AXIS]
        return kind == jsh.AxisType.Auto
    except Exception:
        # Fail CLOSED: if the axis-type introspection is unavailable we
        # cannot prove tp is an auto axis, and constraining over a
        # shard_map-manual axis is a trace error. Skipping the constraint
        # is always correct (GSPMD just keeps the stream replicated).
        return False


def seq_constrain(x: jax.Array) -> jax.Array:
    """Constrain a [B, L, H] activation to be sequence-sharded over tp.

    No-op when the surrounding trace has no auto 'tp' mesh axis (single
    device, pure dp, eval jits) — the gate is trace-time static, so the
    compiled program carries no branch.
    """
    if not _tp_is_auto_axis():
        return x
    return jax.lax.with_sharding_constraint(x, P(None, TP_AXIS, None))
