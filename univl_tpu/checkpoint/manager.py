"""Rotating checkpoint manager for long pretraining runs (orbax-backed).

The reference keeps every per-epoch dump plus one rolling train-state file
(reference: main_pretrain.py:258-276, main_task_retrieval.py:292-299). For
multi-week pretrains that policy fills disks; this wraps
``orbax.checkpoint.CheckpointManager`` with:

  - keep-last-N rotation (``max_to_keep``)
  - optionally always keep the best checkpoint by a metric
    (``best_metric``/``best_mode``), mirroring the drivers' best-R@1 /
    best-BLEU4 selection (main_task_retrieval.py:491-509)
  - atomic finalization + resume from the latest step

Use ``--checkpoint_backend orbax`` in the pretrain driver.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

import jax


def _coerce_metric(v):
    """numpy/jax scalars -> python float for JSON + best_fn. Plain
    isinstance(v, (int, float)) misses np.float32/np.int32 (not
    subclasses of the python types; only np.float64 happens to be), and
    ocp.args.JsonSave raises on them."""
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    if getattr(v, "ndim", None) == 0 or isinstance(v, np.generic):
        try:
            return float(v)
        except (TypeError, ValueError):
            return v
    return v


class RotatingCheckpointManager:
    def __init__(
        self,
        directory: str,
        max_to_keep: int = 3,
        best_metric: Optional[str] = None,
        best_mode: str = "max",
        async_save: bool = False,
    ):
        """``async_save=True`` overlaps the disk write with training
        (orbax async checkpointing): ``save`` returns once the state has
        been copied OUT of device memory (donation-safe — the next
        train_step may reuse the buffers), and the serialization thread
        finishes the write in the background. ``restore*``/``close`` wait
        for pending writes first. The reference blocks the train loop for
        every torch.save (main_pretrain.py:258-276)."""
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.async_save = async_save
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        # checkpoints saved WITHOUT the best metric (periodic/preemption
        # saves pass metrics=None) rank as worst-possible instead of
        # raising KeyError out of the rotation pass
        worst = float("-inf") if best_mode == "max" else float("inf")
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=(
                (lambda m: float((m or {}).get(best_metric, worst)))
                if best_metric else None
            ),
            best_mode=best_mode,
            create=True,
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    # ------------------------------------------------------------ #
    def save(self, step: int, state: Any, metrics: Optional[Dict] = None) -> bool:
        """Save `state` at `step`; old steps beyond the policy are deleted.

        `metrics` ride inside the checkpoint (a JSON item) so rotation can
        never orphan them, and feed the best-checkpoint policy.
        """
        ocp = self._ocp
        # floats coerce (incl. numpy/jax scalars -> JSON, _coerce_metric);
        # bools/None/dicts pass through
        metrics = {k: _coerce_metric(v) for k, v in (metrics or {}).items()}
        # Overwrite semantics on step collision (like the msgpack file
        # path): a preemption at the last update-batch of an epoch saves at
        # the same global_step the epoch-end save would use — without the
        # delete, orbax raises StepAlreadyExistsError and every resume
        # repeats the crash. The wait must come BEFORE the all_steps()
        # check: an in-flight async save at the same step is not visible
        # in all_steps() yet, would escape the delete, and the second
        # save would then raise StepAlreadyExistsError anyway.
        if self.async_save:
            self._mgr.wait_until_finished()
        if step in set(self._mgr.all_steps()):
            self._mgr.wait_until_finished()
            self._mgr.delete(step)
        # async: hand orbax the device arrays — it copies them to host
        # before returning and writes on a background thread.
        # multi-host: ALWAYS hand orbax the global jax.Arrays — it writes
        # each process's addressable shards and process 0 coordinates
        # finalization (device_get would crash on cross-host shards).
        sync = not self.async_save and jax.process_count() == 1
        payload = jax.device_get(state) if sync else state
        saved = self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(payload),
                meta=ocp.args.JsonSave(metrics),
            ),
            metrics=metrics,
        )
        if not self.async_save:
            self._mgr.wait_until_finished()
        return saved

    def wait(self):
        """Block until pending async writes are durable."""
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def all_steps(self):
        return sorted(self._mgr.all_steps())

    def restore(self, step: int, template: Any):
        """Restore the pytree saved at `step` into `template`'s structure.

        Multi-host: the template's jax.Arrays keep their shardings, so
        orbax restores each process's shards in place and returns global
        sharded arrays (no host-side full copy ever materializes)."""
        ocp = self._ocp
        self._mgr.wait_until_finished()
        tmpl = jax.device_get(template) if jax.process_count() == 1 else template
        out = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(tmpl),
                meta=ocp.args.JsonRestore(),
            ),
        )
        return out["state"], out["meta"]

    def restore_latest(self, template: Any):
        self._mgr.wait_until_finished()
        step = self.latest_step()
        if step is None:
            return None, None, None
        state, meta = self.restore(step, template)
        return state, meta, step

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
