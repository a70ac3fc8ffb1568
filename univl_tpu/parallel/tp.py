"""Megatron-style tensor parallelism over a 2-D (dp, tp) mesh.

The reference has no model parallelism at all (NCCL data-parallel DDP only,
main_task_retrieval.py:23,197-198). This module is the TPU-native extension:
a second mesh axis over which the transformer weights are sharded
column/row-parallel, with XLA's SPMD partitioner inserting the collectives.

Design (see docs/PERF.md "Tensor parallelism"):

  - The trainer keeps its ``shard_map`` over the ``dp`` axis — that is what
    preserves the reference's per-DEVICE-negatives similarity-loss semantics
    (until_module.py:202-204) — and leaves ``tp`` as an *auto* axis
    (``shard_map(..., axis_names={"dp"})``). Inside each dp shard the model
    code is untouched; GSPMD propagates the parameter shardings below and
    inserts the tp collectives (all-reduce after row-parallel matmuls,
    all-gather around the vocab-sharded logits).
  - Sharding layout (the standard Megatron split, arXiv:1909.08053):
      attention q/k/v kernels  [H, H]   -> (None, tp)   column-parallel
      attention output dense   [H, H]   -> (tp, None)   row-parallel
      FFN intermediate         [H, 4H]  -> (None, tp)   column-parallel
      FFN output dense         [4H, H]  -> (tp, None)   row-parallel
      word embedding table     [V, H]   -> (tp, None)   vocab-parallel
      tied LM-head / classifier bias [V] -> (tp,)
      biases of column-parallel layers  -> (tp,)
      everything else (LayerNorms, pos/type embeddings, poolers, heads)
                                        -> replicated
  - BertAdam moments inherit the param shardings (optimizer memory and the
    HBM-roofline update are divided by tp as well — ZeRO-for-free on the
    sharded leaves).

A dimension that does not divide by the tp size stays replicated (correct,
just not accelerated); heads-per-device stay whole when
num_attention_heads % tp == 0, which holds for every UniVL config (12 heads)
at tp in {2, 3, 4, 6, 12}.

The opt-in Pallas kernels are custom calls GSPMD cannot split; TP training
uses the XLA path (the default). See tests/test_tp.py for the dp×tp ≡ dp
equivalence proof.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from univl_tpu.parallel.mesh import DP_AXIS

TP_AXIS = "tp"

_ATTN_PROJ = ("query", "key", "value")
_ATTN_OUT = ("attention_output", "self_attn_output", "enc_attn_output")


def make_mesh_2d(dp: int, tp: int) -> Mesh:
    """(dp, tp) mesh. tp is the fast-varying (innermost) axis so tp groups
    sit on adjacent devices — on real hardware that keeps the per-layer
    all-reduces on nearest-neighbour ICI links."""
    devices = jax.devices()
    if dp * tp > len(devices):
        raise ValueError(f"need {dp * tp} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[: dp * tp]).reshape(dp, tp), (DP_AXIS, TP_AXIS))


def _path_keys(path) -> tuple:
    return tuple(str(getattr(k, "key", k)) for k in path)


def tp_pspec(path, leaf, tp: int) -> P:
    """PartitionSpec for one param leaf (path = flax tree path)."""
    keys = _path_keys(path)
    name = keys[-1]
    parent = keys[-2] if len(keys) >= 2 else ""
    gparent = keys[-3] if len(keys) >= 3 else ""

    def col(kernel_spec, bias_spec):
        return kernel_spec if name == "kernel" else bias_spec

    if parent in _ATTN_PROJ:  # q/k/v projections: column-parallel
        spec = col(P(None, TP_AXIS), P(TP_AXIS))
    elif parent == "dense" and gparent in _ATTN_OUT:  # attn out: row-parallel
        spec = col(P(TP_AXIS, None), P())
    elif parent == "intermediate":  # FFN up: column-parallel
        spec = col(P(None, TP_AXIS), P(TP_AXIS))
    elif parent == "dense" and gparent == "output":  # FFN down: row-parallel
        spec = col(P(TP_AXIS, None), P())
    elif keys == ("word_embed", "embedding"):  # vocab-parallel table
        spec = P(TP_AXIS, None)
    elif keys in (("mlm_head", "bias"), ("decoder", "classifier_bias")):
        spec = P(TP_AXIS)  # vocab-sharded logit biases
    else:
        return P()

    # scan_layers stacked layout: tower layer params live under `layers`
    # with a leading [num_layers] axis (nn/layers.py:TransformerStack) —
    # the Megatron split applies to the dims BEHIND it.
    if "layers" in keys:
        spec = P(None, *tuple(spec))

    # A dim that does not divide by tp stays replicated (correctness first).
    for dim, axis in zip(leaf.shape, spec):
        if axis is not None and dim % tp != 0:
            return P()
    return spec


def param_pspecs(params: Any, tp: int) -> Any:
    """Tree of PartitionSpec matching ``params``."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: tp_pspec(path, leaf, tp), params
    )


def state_shardings(tx: optax.GradientTransformation, params: Any,
                    opt_state: Any, mesh: Mesh) -> tuple:
    """(param_shardings, opt_state_shardings) NamedSharding trees.

    BertAdam's m/v mirror the param tree (optimization.py:92-100);
    optax.tree_map_params broadcasts the param specs onto those leaves and
    replicates everything else (step counters, clip state)."""
    tp = dict(zip(mesh.axis_names, mesh.devices.shape)).get(TP_AXIS, 1)
    pspecs = param_pspecs(params, tp)
    p_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs)
    o_specs = optax.tree_map_params(
        tx,
        lambda _, sh: sh,
        opt_state,
        p_sh,
        transform_non_params=lambda _: NamedSharding(mesh, P()),
    )
    return p_sh, o_specs


def mesh_tp_size(mesh: Optional[Mesh]) -> int:
    if mesh is None or TP_AXIS not in mesh.axis_names:
        return 1
    return dict(zip(mesh.axis_names, mesh.devices.shape))[TP_AXIS]
