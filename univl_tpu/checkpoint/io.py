"""Checkpoint save/resume.

Covers the reference's two checkpoint styles:
  - per-epoch model dumps with best-metric selection
    (main_task_retrieval.py:292-299,491-509)
  - full train-state checkpoints {epoch, global_step, model, optimizer}
    restored for pretraining resume (main_pretrain.py:258-308)

Format: flax msgpack serialization + a JSON sidecar with step metadata.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
from flax import serialization


def _gather_full(leaf):
    """Host-fetchable copy of a leaf. Cross-host-sharded arrays (e.g. the
    ZeRO-1 m/v shards, P('dp') over a multi-host mesh) are not addressable
    from any single process — replicate them via a jitted identity (XLA
    all-gather over ICI/DCN) before device_get."""
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
        from jax.sharding import NamedSharding, PartitionSpec

        repl = NamedSharding(leaf.sharding.mesh, PartitionSpec())
        leaf = jax.jit(lambda x: x, out_shardings=repl)(leaf)
    return leaf


def save_checkpoint(path: str, state: Any, metadata: Optional[Dict] = None) -> str:
    """Serialize a pytree (params or full TrainState) to `path`.

    Multi-host: every process participates in the shard gather (a
    collective — all processes MUST call this together), but only process
    0 touches the filesystem; with per-host disks the file lands on host 0
    (the reference's rank-0-only torch.save, main_pretrain.py:258-276)."""
    state = jax.tree.map(_gather_full, state)
    state = jax.device_get(state)
    if jax.process_index() == 0:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(state))
        if metadata is not None:
            with open(path + ".json", "w") as f:
                json.dump(metadata, f)
    if jax.process_count() > 1:
        # order process 0's write before any other process's restore
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("univl_ckpt_save")
    return path


def restore_checkpoint(path: str, template: Any, partial: bool = False):
    """Restore into the structure of `template` (same pytree layout).

    ``partial=True`` overlays only the leaves present in the checkpoint and
    leaves the rest of the template untouched — e.g. initializing a
    stage-II model (cross+decoder+heads) from a stage-I checkpoint
    (encoders only), mirroring the reference's tolerant init_preweight
    missing-key handling (until_module.py:115-141). Returns
    (state, metadata) or (state, metadata, missing_paths) when partial."""
    with open(path, "rb") as f:
        data = f.read()
    meta = None
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    from univl_tpu.checkpoint.layout import adapt_layout

    if partial:
        from univl_tpu.checkpoint.torch_convert import merge_params

        raw = serialization.msgpack_restore(data)
        raw = adapt_layout(raw, serialization.to_state_dict(template))
        merged, missing = merge_params(template, raw)
        return merged, meta, missing
    raw = serialization.msgpack_restore(data)
    # Checkpoints written with the opposite scan_layers setting are adapted
    # transparently (tower layer_i <-> stacked `layers`, incl. Adam mu/nu).
    raw = adapt_layout(raw, serialization.to_state_dict(template))
    state = serialization.from_state_dict(template, raw)
    return state, meta


# ------------------------------------------------------------------ #
# Orbax backend: production checkpointing (per-leaf files, multi-host
# coordination, atomic finalization). Use for large pretraining runs; the
# msgpack path above stays the default for single-blob portability.
# ------------------------------------------------------------------ #
def save_checkpoint_orbax(directory: str, state: Any, metadata: Optional[Dict] = None) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    ckptr = ocp.StandardCheckpointer()
    # multi-host: hand orbax the GLOBAL jax.Arrays — it writes each
    # process's addressable shards and process 0 coordinates
    # finalization; jax.device_get would crash on cross-host shards
    # (e.g. zero1's P('dp') moments). Same guard as manager.py.
    payload = jax.device_get(state) if jax.process_count() == 1 else state
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if metadata is not None and jax.process_index() == 0:
        # process-0-only: N hosts would race-write the same file on a
        # shared filesystem
        with open(os.path.join(path, "univl_meta.json"), "w") as f:
            json.dump(metadata, f)
    return path


def restore_checkpoint_orbax(directory: str, template: Any):
    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    ckptr = ocp.StandardCheckpointer()
    # multi-host: keep the template's sharded jax.Arrays so orbax
    # restores each process's shards in place (no host-side full copy)
    tmpl = jax.device_get(template) if jax.process_count() == 1 else template
    state = ckptr.restore(path, target=tmpl)
    meta = None
    meta_path = os.path.join(path, "univl_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta
